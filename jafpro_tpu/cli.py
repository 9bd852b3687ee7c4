"""Command-line entry points (reference CLI parity).

``python -m jafpro_tpu.cli train --stage N -n <exp_name> [--debug]
[--synthetic]`` mirrors ``train/N.*.py -n <exp_name>``;
``... infer -e <exp> -n <num_refs>`` mirrors ``test/conv_pro_test.py``;
``... evaluate --pred <dir> --gt <dir>`` mirrors
``test/video_evaluation.py``.

Device selection: the reference used ``--gpu`` + CUDA_VISIBLE_DEVICES; on
TPU the device set is the jax runtime's, optionally restricted with
``--num-devices`` (data-parallel mesh).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np


def _build_pipeline(cfg, synthetic: bool):
    import jax

    from jafpro_tpu.geometry.flow import SMPLFlowEngine
    from jafpro_tpu.pipeline import JAFProPipeline
    from jafpro_tpu.train.common import synthetic_quad_mesh

    if synthetic:
        verts, faces = synthetic_quad_mesh(6)
        engine = SMPLFlowEngine.create(
            faces=faces, image_size=cfg.image_size, chunk=64)
        return JAFProPipeline(cfg, flow_engine=engine), verts
    return JAFProPipeline(cfg), None


def cmd_train(args) -> None:
    import jax
    import jax.numpy as jnp

    from jafpro_tpu.checkpoints import save_checkpoint
    from jafpro_tpu.config import get_general_options
    from jafpro_tpu.train import TrainState
    from jafpro_tpu.train.common import (
        sample_reference_curriculum, synthetic_batch)
    from jafpro_tpu.utils import Logger, step_timer

    cfg = get_general_options()
    if args.synthetic:
        cfg.image_size = 64
        cfg.part_size = 16
        cfg.face_crop_size = 16
        cfg.compute_dtype = "float32"
        cfg.maximum_ref_frames = 2
    if args.debug:
        cfg.model_save_interval = 3
        cfg.vis_interval = 3

    pipe, verts = _build_pipeline(cfg, args.synthetic)
    params = pipe.init_params(jax.random.PRNGKey(args.seed))

    if args.stage == 1:
        from jafpro_tpu.train.stage1 import make_stage1_step, stage1_lrs
        step_fn, lrs = make_stage1_step(pipe), stage1_lrs()
    elif args.stage == 2:
        from jafpro_tpu.train.stage2 import make_stage2_step, stage2_lrs
        step_fn, lrs = make_stage2_step(pipe), stage2_lrs()
    elif args.stage == 3:
        from jafpro_tpu.train.stage34 import make_stage3_step, stage3_lrs
        step_fn, lrs = make_stage3_step(pipe), stage3_lrs()
    else:
        from jafpro_tpu.train.stage34 import make_stage4_step, stage4_lrs
        step_fn, lrs = make_stage4_step(pipe), stage4_lrs()

    state = TrainState.create(params, lrs)
    step = jax.jit(step_fn)

    ckpt_dir = os.path.join(cfg.model_save_dir, args.exp_name)
    logger = Logger(ckpt_dir)
    rng = np.random.RandomState(args.seed)

    for it in range(args.iters):
        if args.synthetic:
            b = synthetic_batch(
                rng, batch=cfg.batch_size, num_refs=cfg.maximum_ref_frames,
                part_size=cfg.part_size, image_size=cfg.image_size,
                num_verts=verts.shape[0])
            b["prev_verts"] = np.tile(verts[None], (cfg.batch_size, 1, 1))
            b["tgt_verts"] = b["prev_verts"] + np.float32([0.02, 0, 0])
        else:
            from jafpro_tpu.data.dataset import (
                list_videos, load_interval_sample, load_textonly_sample)

            vids = list_videos(cfg.data_root, "train")
            if not vids:
                raise FileNotFoundError(
                    f"no training videos under {cfg.data_root}/train "
                    "(set JAFPRO_DATA_ROOT or use --synthetic)")
            from jafpro_tpu.train.common import sample_reference_curriculum

            samples = []
            for _ in range(cfg.batch_size):
                vid = vids[rng.randint(len(vids))]
                if args.stage <= 2:
                    s = load_textonly_sample(
                        os.path.join(cfg.data_root, "train"), vid, rng,
                        cfg.maximum_ref_frames, cfg.num_target)
                else:
                    s = load_interval_sample(
                        os.path.join(cfg.data_root, "train"),
                        os.path.join(cfg.smpl_root, "train"),
                        os.path.join(cfg.mask_root, "train"),
                        vid, rng, cfg.maximum_ref_frames, 1)
                    # curriculum: subset of references + propagation source
                    mask, prosrc = sample_reference_curriculum(
                        rng, cfg.maximum_ref_frames)
                    s["ref_mask"] = mask[None]
                    s["prev_img"] = s["src_imgs"][prosrc][None]
                    s["prev_cam"] = s["src_cams"][prosrc][None]
                    s["prev_verts"] = s["src_verts"][prosrc][None]
                    for k in ("src_imgs", "src_cams", "src_verts",
                              "src_frame_indices"):
                        s.pop(k)
                samples.append(s)
            b = {k: np.concatenate([s[k] for s in samples])
                 for k in samples[0]}
        if args.synthetic:
            masks, prosrcs = zip(*[
                sample_reference_curriculum(rng, cfg.maximum_ref_frames)
                for _ in range(cfg.batch_size)])
            b["ref_mask"] = np.stack(masks)
        batch = {k: jnp.asarray(v) for k, v in b.items()}

        with step_timer() as t:
            state, metrics = step(state, batch)
            jax.block_until_ready(metrics["loss"])
        loss = float(metrics["loss"])
        logger.scalar_summary("total loss", loss, it)
        print(f"[stage{args.stage}] iter {it} loss {loss:.4f} "
              f"({t['seconds']:.3f}s)")

        if it > 0 and it % cfg.model_save_interval == 0:
            save_checkpoint(ckpt_dir, it, {
                "params": state.params, "opt_states": state.opt_states})
    print("Training Done.")


def cmd_infer(args) -> None:
    import jax

    from jafpro_tpu.checkpoints import latest_step, restore_checkpoint
    from jafpro_tpu.config import get_general_options
    from jafpro_tpu.data.dataset import list_videos, load_clip
    from jafpro_tpu.infer import VideoGenerator, frames_to_uint8

    cfg = get_general_options()
    pipe, _ = _build_pipeline(cfg, synthetic=False)
    params = pipe.init_params(jax.random.PRNGKey(0))
    ckpt_dir = os.path.join(cfg.model_save_dir, args.exp_name)
    step = latest_step(ckpt_dir)
    if step is not None:
        restored = restore_checkpoint(ckpt_dir, step, {"params": params})
        params = restored["params"]

    gen = VideoGenerator(pipe)
    import cv2
    import jax.numpy as jnp

    for vid in list_videos(cfg.data_root, "test"):
        clip_np = load_clip(
            os.path.join(cfg.data_root, "test"),
            os.path.join(cfg.smpl_root, "test"),
            os.path.join(cfg.mask_root, "test"),
            vid, num_refs=args.num_refs)
        clip = {k: jnp.asarray(v) for k, v in clip_np.items()
                if k not in ("gt_frames", "vid_name")}
        out = gen(params, clip)
        save_dir = os.path.join(cfg.test_save_dir, args.exp_name, vid)
        os.makedirs(save_dir, exist_ok=True)
        finals = frames_to_uint8(out["final"])
        coarse = frames_to_uint8(out["coarse"])
        tsf = frames_to_uint8(out["tsf"])
        masks = np.clip(np.asarray(out["mask"]) * 255, 0, 255).astype(np.uint8)
        for i in range(finals.shape[0]):
            cv2.imwrite(os.path.join(save_dir, f"frame_{i:03d}.jpg"), finals[i])
            cv2.imwrite(os.path.join(save_dir, f"coarse_frame_{i:03d}.jpg"),
                        coarse[i])
            cv2.imwrite(os.path.join(save_dir, f"mask_frame_{i:03d}.jpg"),
                        masks[i])
            cv2.imwrite(os.path.join(save_dir, f"tsf_frame_{i:03d}.jpg"),
                        tsf[i])
        print("wrote", save_dir)
    print("Testing Done.")


def cmd_evaluate(args) -> None:
    import cv2

    from jafpro_tpu.evaluate import evaluate_video

    def read_frames(d):
        names = sorted(n for n in os.listdir(d)
                       if n.endswith((".jpg", ".png"))
                       and not n.startswith(("mask_", "coarse_", "tsf_")))
        return np.stack([cv2.imread(os.path.join(d, n)) for n in names])

    for name, d in (("--pred", args.pred), ("--gt", args.gt)):
        if not os.path.isdir(d):
            raise SystemExit(
                f"evaluate: {name} directory not found: {d} "
                "(expected per-video subdirectories of frames)")
    results = []
    vids = sorted(os.listdir(args.pred))
    for vid in vids:
        pd, gd = os.path.join(args.pred, vid), os.path.join(args.gt, vid)
        if not (os.path.isdir(pd) and os.path.isdir(gd)):
            continue
        m = evaluate_video(read_frames(pd), read_frames(gd))
        results.append(m)
        print(vid, {k: round(v, 4) for k, v in m.items()})
    if results:
        mean = {k: float(np.mean([r[k] for r in results]))
                for k in results[0]}
        print("dataset mean:", {k: round(v, 4) for k, v in mean.items()})
        os.makedirs("log_results_video", exist_ok=True)
        with open(os.path.join(
                "log_results_video",
                os.path.basename(args.pred) + ".errors.txt"), "a") as f:
            f.write(repr(mean) + "\n")


def cmd_pack(args) -> None:
    from jafpro_tpu.config import get_general_options
    from jafpro_tpu.data.shardio import pack_dancevideo

    cfg = get_general_options()
    n = pack_dancevideo(
        cfg.data_root, cfg.smpl_root, cfg.mask_root,
        args.out, mode=args.mode,
        samples_per_video=args.samples_per_video,
        num_refs=args.num_refs, seed=args.seed)
    print(f"packed {n} samples into {args.out}")


def main(argv: Optional[list] = None) -> None:
    p = argparse.ArgumentParser(prog="jafpro_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--stage", type=int, required=True, choices=[1, 2, 3, 4])
    t.add_argument("--exp_name", "-n", default="exp")
    t.add_argument("--debug", action="store_true")
    t.add_argument("--synthetic", action="store_true")
    t.add_argument("--iters", type=int, default=10)
    t.add_argument("--seed", type=int, default=0)
    t.set_defaults(fn=cmd_train)

    i = sub.add_parser("infer")
    i.add_argument("--exp_name", "-e", default="exp")
    i.add_argument("--num_refs", "-n", type=int, default=4)
    i.set_defaults(fn=cmd_infer)

    e = sub.add_parser("evaluate")
    e.add_argument("--pred", required=True)
    e.add_argument("--gt", required=True)
    e.set_defaults(fn=cmd_evaluate)

    k = sub.add_parser(
        "pack", help="pre-pack DanceVideo interval samples into native "
        "shards (the TPU input pipeline reads these instead of re-decoding "
        "images per sample)")
    k.add_argument("--out", required=True)
    k.add_argument("--mode", default="train", choices=["train", "test"])
    k.add_argument("--samples_per_video", type=int, default=4)
    k.add_argument("--num_refs", type=int, default=4)
    k.add_argument("--seed", type=int, default=0)
    k.set_defaults(fn=cmd_pack)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
