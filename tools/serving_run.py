"""Measured end-to-end serving throughput (VERDICT r3 weak #5).

Runs the production `cli infer` overlapped serving loop (decode -> device
generate -> encode, `utils/overlap.py`) over >=8 learnable-fixture clips
on the current accelerator and records SERVING.json:

    {clips, frames, seconds, frames_per_sec_end_to_end,
     bench_device_fps, pct_of_device_rate}

`pct_of_device_rate` compares against the device-only rate measured IN THE
SAME PROCESS by bench.time_pipeline on the same synthetic headline clip
bench.py times — the round-2 acceptance criterion is >=80%.  The
reference's own serving loop is strictly serial and prep-dominated
(``test/conv_pro_test.py:143-163``).

Round 5: the measured pass serves from the packed uint8 clip shard
(`cli pack --kind clips` + `infer --packed-clips`), removing the
0.75 s/clip PNG decode the round-4 phase breakdown attributed to the
host (VERDICT r4 next #2).  A `decode_path` control pass keeps the
per-clip PNG-decode number for comparison (`--no-packed` skips packing).

Usage:  python tools/serving_run.py [--clips 8] [--frames 30] [--out SERVING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--fixture", default="",
                    help="existing fixture root (default: build a fresh one "
                         "in ./serving_fixture)")
    ap.add_argument("--out", default="SERVING.json")
    ap.add_argument("--skip-warm", action="store_true",
                    help="measure the first pass (includes compiles)")
    ap.add_argument("--no-packed", action="store_true",
                    help="measure only the per-clip PNG-decode path")
    a = ap.parse_args()

    root = a.fixture or os.path.abspath("serving_fixture")
    if not os.path.isdir(os.path.join(root, "data", "test")):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from make_fixture import write_fixture

        # test split gets vids_per_mode - 1 clips
        write_fixture(root, vids_per_mode=a.clips + 1, frames=a.frames,
                      seed=0)

    os.environ["JAFPRO_DATA_ROOT"] = os.path.join(root, "data")
    os.environ["JAFPRO_SMPL_ROOT"] = os.path.join(root, "smpl")
    os.environ["JAFPRO_MASK_ROOT"] = os.path.join(root, "mask")

    from jafpro_tpu import cli

    # 1. device-only rate for the SAME session/hardware: the bench
    # harness's chained timing on the synthetic headline clip
    import bench

    device_fps, device_samples, device_spread = bench.time_pipeline(
        *bench.setup())
    print(f"device rate: {device_fps:.2f} f/s "
          f"(spread {100 * device_spread:.1f}%)", flush=True)

    n_clips = len(os.listdir(os.path.join(root, "data", "test")))
    frames = n_clips * a.frames

    pack_dir = os.path.abspath("serving_clip_pack")
    if not a.no_packed and not os.path.isdir(pack_dir):
        t0 = time.perf_counter()
        cli.main(["pack", "--out", pack_dir, "--mode", "test",
                  "--kind", "clips", "--num_refs", "4"])
        print(f"clip pack: {time.perf_counter() - t0:.1f}s (one-time)",
              flush=True)

    def run_infer(exp, packed=False):
        t0 = time.perf_counter()
        args = ["infer", "-e", exp, "-n", "4"]
        if packed:
            args += ["--packed-clips", pack_dir]
        cli.main(args)
        return time.perf_counter() - t0

    # 2. warm pass: compiles (through the persistent XLA cache) + jit
    # caches; serving latency for a clip mix is a steady-state property
    packed = not a.no_packed
    if not a.skip_warm:
        warm_s = run_infer("serving_warm", packed=packed)
        print(f"warm pass: {warm_s:.1f}s", flush=True)
        shutil.rmtree("test_results/serving_warm", ignore_errors=True)

    # 3. measured pass.  Remove any stale per-run stats first so a
    # leftover serving_stats.json from a previous run (different clip
    # count / frames) can never be folded into SERVING.json (ADVICE r4).
    stats_path = os.path.join("test_results", "serving",
                              "serving_stats.json")
    if os.path.exists(stats_path):
        os.remove(stats_path)
    seconds = run_infer("serving", packed=packed)
    fps = frames / seconds
    pct = 100.0 * fps / device_fps if device_fps else 0.0

    record = {
        "clips": n_clips,
        "frames": frames,
        "input": "packed uint8 clip shard" if packed
                 else "per-clip PNG decode",
        "seconds": round(seconds, 2),
        "frames_per_sec_end_to_end": round(fps, 2),
        "bench_device_fps": round(device_fps, 2),
        "bench_device_spread_pct": round(100 * device_spread, 1),
        "pct_of_device_rate": round(pct, 1),
        "loop": "overlapped (prefetch=%s decode threads, %s writer threads)"
                % (os.environ.get("JAFPRO_SERVE_PREFETCH", "2"),
                   os.environ.get("JAFPRO_SERVE_WRITERS", "2")),
    }
    # sustained (loop-only) rate: cmd_infer records the overlapped-loop
    # wall time, excluding the per-invocation pipeline-build/param-init
    # setup a long-running server pays once (stats_path was deleted
    # before the measured pass, so an existing file is always fresh)
    if os.path.exists(stats_path):
        stats = json.load(open(stats_path))
        loop_fps = a.frames * stats["clips"] / stats["loop_seconds"]
        record["loop_seconds"] = stats["loop_seconds"]
        record["frames_per_sec_sustained"] = round(loop_fps, 2)
        record["pct_of_device_rate_sustained"] = round(
            100.0 * loop_fps / device_fps, 1) if device_fps else 0.0

    # 4. decode-path control pass (the round-4 configuration), so the
    # packed-vs-decode delta is measured in the same session
    if packed:
        if os.path.exists(stats_path):
            os.remove(stats_path)
        dec_s = run_infer("serving_dec", packed=False)
        record["decode_path"] = {"seconds": round(dec_s, 2),
                                 "frames_per_sec_end_to_end": round(
                                     frames / dec_s, 2)}
        if os.path.exists(stats_path):
            stats = json.load(open(stats_path))
            record["decode_path"]["frames_per_sec_sustained"] = round(
                a.frames * stats["clips"] / stats["loop_seconds"], 2)
        shutil.rmtree("test_results/serving_dec", ignore_errors=True)
    with open(a.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
