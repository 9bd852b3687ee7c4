"""Quality-at-speed record: run the reference's 4-stage curriculum on the
deterministic learnable fixture (tools/make_fixture.py) and record
before/after metrics from `cli infer` + the evaluate metric stack.

This is the honest stand-in for DanceVideo quality parity — the real
dataset cannot be hosted in this environment (reference acceptance:
``test/video_evaluation.py:184-246``).  The chain exercises the round-3
`--init-from` warm start exactly as the reference does
(train/2:79-85, train/3:123-129, train/4:120-141):

    stage 1 (scratch) -> stage 2 (accu) -> stage 3 (accu+inpaint)
        -> stage 4 (accu+inpaint+bg+refine)

Usage (from a scratch workdir; TPU by default):
    python tools/quality_run.py --fixture /tmp/jafpro_fixture_r5 \
        --iters1 120 --iters2 480 --iters3 480 --iters4 1000 --batch 2

Round-5 defaults follow the reference's stage ratios (5k:20k:20k:42k ~
1:4:4:8.4, README.md:121-124) at ~3x the round-4 budget, on a 5-identity
30-frame fixture (built automatically when --fixture does not exist).
Two extra ablation rows retrain stage 4 from the same stage-3 warm start:
``after_no_face_gan`` (reference ``face_GAN`` off — the other half of the
adversarial machinery, train/4:357-374) and ``after_f32`` (float32
compute vs the production bf16 — the TPU-native parity question).

Writes QUALITY.json + per-phase frame dirs under the cwd.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate_dirs(pred_root: str, gt_root: str, hooks: dict) -> dict:
    import cv2

    from jafpro_tpu.evaluate import evaluate_video

    def read_frames(d):
        names = sorted(n for n in os.listdir(d)
                       if n.endswith((".jpg", ".png"))
                       and not n.startswith(("mask_", "coarse_", "tsf_")))
        return np.stack([cv2.imread(os.path.join(d, n)) for n in names])

    results = []
    for vid in sorted(os.listdir(pred_root)):
        pd, gd = os.path.join(pred_root, vid), os.path.join(gt_root, vid)
        if not (os.path.isdir(pd) and os.path.isdir(gd)):
            continue
        m = evaluate_video(read_frames(pd), read_frames(gd), **hooks)
        results.append(m)
        print(vid, {k: round(v, 4) for k, v in m.items()}, flush=True)
    return {k: float(np.mean([r[k] for r in results])) for k in results[0]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", required=True)
    ap.add_argument("--iters1", type=int, default=120)
    ap.add_argument("--iters2", type=int, default=480)
    ap.add_argument("--iters3", type=int, default=480)
    ap.add_argument("--iters4", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--num-refs", type=int, default=4)
    ap.add_argument("--samples-per-video", type=int, default=24)
    ap.add_argument("--vids", type=int, default=6,
                    help="fixture identities when building it (train gets "
                    "--vids clips, each with its own procedural atlas; "
                    "test gets --vids - 1)")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--skip-ablations", action="store_true",
                    help="skip the face-GAN-off and f32 stage-4 retrains")
    ap.add_argument("--out", default="QUALITY.json")
    a = ap.parse_args()

    if not os.path.isdir(os.path.join(a.fixture, "data", "train")):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from make_fixture import write_fixture

        write_fixture(a.fixture, vids_per_mode=a.vids, frames=a.frames,
                      seed=0)

    os.environ["JAFPRO_DATA_ROOT"] = os.path.join(a.fixture, "data")
    os.environ["JAFPRO_SMPL_ROOT"] = os.path.join(a.fixture, "smpl")
    os.environ["JAFPRO_MASK_ROOT"] = os.path.join(a.fixture, "mask")

    from jafpro_tpu import cli

    # 1. pack shards once (native reader keeps per-iter host cost ~0)
    shards = {"textonly": "shards_textonly", "interval": "shards_interval"}
    for kind, d in shards.items():
        if not os.path.isdir(d):
            cli.main(["pack", "--out", d, "--mode", "train", "--kind", kind,
                      "--samples_per_video", str(a.samples_per_video),
                      "--num_refs", str(a.num_refs)])

    # 2. clean gt copy (fixture dirs also hold IUV/text/mask pngs)
    gt_root = "gt_frames"
    if not os.path.isdir(gt_root):
        data_test = os.path.join(a.fixture, "data", "test")
        for vid in sorted(os.listdir(data_test)):
            os.makedirs(os.path.join(gt_root, vid), exist_ok=True)
            for n in sorted(os.listdir(os.path.join(data_test, vid))):
                if n.endswith(".jpg") and "_" not in n[6:]:
                    shutil.copy(os.path.join(data_test, vid, n),
                                os.path.join(gt_root, vid, n))

    record = {"config": vars(a)}

    # the reference's full 6-metric acceptance stack
    # (test/video_evaluation.py:184-246): ssim/ms-ssim/psnr/l1 + VGG
    # perceptual + FlowNetSD temporal flow-consistency L1
    hooks = cli._metric_hooks()

    # 3. BEFORE: random-init params through the same infer path
    print("=== infer (random init) ===", flush=True)
    cli.main(["infer", "-e", "q_none", "-n", str(a.num_refs)])
    shutil.move("test_results/q_none", "pred_before")
    record["before"] = evaluate_dirs("pred_before", gt_root, hooks)
    print("before:", record["before"], flush=True)

    # 4. the 4-stage curriculum with cross-stage warm starts
    stages = [
        (1, a.iters1, []),
        (2, a.iters2, ["--init-from", "q_s1"]),
        (3, a.iters3, ["--init-from", "q_s2"]),
        (4, a.iters4, ["--init-from", "q_s3"]),
    ]
    for stage, iters, extra in stages:
        shard_dir = shards["textonly" if stage <= 2 else "interval"]
        print(f"=== train stage {stage} ({iters} iters) ===", flush=True)
        cli.main(["train", "--stage", str(stage), "-n", f"q_s{stage}",
                  "--iters", str(iters), "--batch-size", str(a.batch),
                  "--shards", shard_dir, *extra])

    # 5. AFTER: the trained stage-4 experiment
    print("=== infer (trained) ===", flush=True)
    cli.main(["infer", "-e", "q_s4", "-n", str(a.num_refs)])
    shutil.move("test_results/q_s4", "pred_after")
    record["after"] = evaluate_dirs("pred_after", gt_root, hooks)
    print("after:", record["after"], flush=True)

    # 6. propagation ablation: same trained weights, final == the
    # refine+bg fusion (no SMPL-flow blend) — the flow-consistency delta
    # vs 'after' is the metric the propagation stage exists to improve
    # (src/flow_net.py:61-99)
    print("=== infer (trained, ablate=pro) ===", flush=True)
    cli.main(["infer", "-e", "q_s4", "-n", str(a.num_refs),
              "--ablate", "pro"])
    shutil.move("test_results/q_s4", "pred_after_nopro")
    record["after_no_propagation"] = evaluate_dirs(
        "pred_after_nopro", gt_root, hooks)
    print("after_no_propagation:", record["after_no_propagation"],
          flush=True)

    # 6b. two stage-4 ablation retrains from the same stage-3 warm start
    if not a.skip_ablations:
        for exp, extra, row in (
                ("q_s4_nofgan", ["--no-face-gan"], "after_no_face_gan"),
                ("q_s4_f32", ["--dtype", "float32"], "after_f32")):
            print(f"=== train stage 4 ablation {exp} ===", flush=True)
            cli.main(["train", "--stage", "4", "-n", exp,
                      "--iters", str(a.iters4), "--batch-size", str(a.batch),
                      "--shards", shards["interval"],
                      "--init-from", "q_s3", *extra])
            print(f"=== infer ({exp}) ===", flush=True)
            cli.main(["infer", "-e", exp, "-n", str(a.num_refs)])
            shutil.move(f"test_results/{exp}", f"pred_{exp}")
            record[row] = evaluate_dirs(f"pred_{exp}", gt_root, hooks)
            print(f"{row}:", record[row], flush=True)

    # 7. merge the per-stage training loss series into one auditable file
    with open("quality_losses.jsonl", "w") as lf:
        for stage in (1, 2, 3, 4):
            p = os.path.join("checkpoints", f"q_s{stage}", "losses.jsonl")
            if os.path.exists(p):
                lf.write(open(p).read())
    print("wrote quality_losses.jsonl")

    for k in record["after"]:
        b, t = record["before"][k], record["after"][k]
        np_ = record["after_no_propagation"][k]
        print(f"{k}: {b:.4f} -> {t:.4f} (no-pro {np_:.4f})")
    for row in ("after_no_face_gan", "after_f32"):
        if row in record:
            print(row, {k: round(v, 4) for k, v in record[row].items()})
    with open(a.out, "w") as f:
        json.dump(record, f, indent=1)
    print("wrote", a.out)


if __name__ == "__main__":
    main()
