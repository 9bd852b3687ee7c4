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
import json
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


# Cross-stage warm start: which module subtrees each stage boots from the
# previous stage's checkpoint (fresh optimizer state, like the reference's
# load_state_dict-then-new-Adam startups):
#   stage 2 loads accu          (train/2.text_inpaint_convLSTM.py:79-85)
#   stage 3 loads accu+inpaint  (train/3.inpaint_global_convLSTM_FGAN.py:123-129)
#   stage 4 loads accu+inpaint+bg+refine (train/4...py:120-141)
STAGE_WARM_MODULES = {
    2: ("accu",),
    3: ("accu", "inpaint"),
    4: ("accu", "inpaint", "bg", "refine"),
}


def _warm_start(params, cfg, stage: int, init_from: str):
    """Seed the stage's consumed module subtrees from a donor experiment's
    checkpoint (``--init-from <exp>[:<step>]``), leaving everything else —
    including optimizer state — fresh."""
    import jax
    import jax.numpy as jnp

    from jafpro_tpu.checkpoints import latest_step, restore_checkpoint

    if stage not in STAGE_WARM_MODULES:
        raise SystemExit(
            "--init-from applies to stages 2-4 (stage 1 trains from scratch "
            "in the reference)")
    donor, _, step_s = init_from.partition(":")
    donor_dir = os.path.join(cfg.model_save_dir, donor)
    donor_step = int(step_s) if step_s else latest_step(donor_dir)
    if donor_step is None:
        raise SystemExit(f"--init-from: no checkpoints under {donor_dir}")
    donor_params = restore_checkpoint(donor_dir, donor_step)["params"]
    mods = STAGE_WARM_MODULES[stage]
    for m in mods:
        if m not in donor_params:
            raise SystemExit(
                f"--init-from: donor checkpoint lacks module {m!r} "
                f"(has {sorted(donor_params)})")
        params[m] = jax.tree_util.tree_map(jnp.asarray, donor_params[m])
    print(f"warm start: {{{','.join(mods)}}} <- {donor_dir}/iter_{donor_step}")
    return params


def _make_step(pipe, stage: int):
    if stage == 1:
        from jafpro_tpu.train.stage1 import make_stage1_step, stage1_lrs
        return make_stage1_step(pipe), stage1_lrs()
    if stage == 2:
        from jafpro_tpu.train.stage2 import make_stage2_step, stage2_lrs
        return make_stage2_step(pipe), stage2_lrs()
    if stage == 3:
        from jafpro_tpu.train.stage34 import make_stage3_step, stage3_lrs
        return make_stage3_step(pipe), stage3_lrs()
    from jafpro_tpu.train.stage34 import make_stage4_step, stage4_lrs
    return make_stage4_step(pipe), stage4_lrs()


def _shard_paths(shards: str) -> list:
    import glob

    if os.path.isdir(shards):
        paths = sorted(glob.glob(os.path.join(shards, "*.shard")))
    else:
        paths = sorted(glob.glob(shards))
    if not paths:
        raise FileNotFoundError(f"no .shard files match {shards}")
    return paths


def _raw_batch_source(args, cfg, rng, verts):
    """Returns a callable yielding stacked *raw* batches (pre-curriculum).

    Three sources, in priority order: --shards (the native prefetching
    reader — the intended production path), --synthetic (random tensors),
    or per-sample cv2 loads (the reference DataLoader equivalent, for small
    runs without packing)."""
    from jafpro_tpu.train.common import synthetic_batch

    if args.shards:
        from jafpro_tpu.data.shardio import (
            ShardReader, collapse_target_dims, stage_spec)

        spec = stage_spec(
            args.stage, num_refs=cfg.maximum_ref_frames,
            num_target=cfg.num_target, image_size=cfg.image_size,
            part_size=cfg.part_size, num_parts=cfg.num_parts,
            num_verts=verts.shape[0] if verts is not None else cfg.num_verts)
        reader = ShardReader(
            spec, _shard_paths(args.shards), batch=cfg.batch_size,
            prefetch=4, threads=2, seed=args.seed, shuffle=True, loop=True)
        print(f"shard reader: {reader.num_records} records")
        return lambda: collapse_target_dims(spec, next(reader))

    if args.synthetic:
        def synth():
            b = synthetic_batch(
                rng, batch=cfg.batch_size, num_refs=cfg.maximum_ref_frames,
                part_size=cfg.part_size, image_size=cfg.image_size,
                num_verts=verts.shape[0])
            b["prev_verts"] = np.tile(verts[None], (cfg.batch_size, 1, 1))
            b["tgt_verts"] = b["prev_verts"] + np.float32([0.02, 0, 0])
            return b
        return synth

    from jafpro_tpu.data.dataset import (
        list_videos, load_interval_sample, load_textonly_sample)

    vids = list_videos(cfg.data_root, "train")
    if not vids:
        raise FileNotFoundError(
            f"no training videos under {cfg.data_root}/train "
            "(set JAFPRO_DATA_ROOT, pass --shards, or use --synthetic)")

    def load():
        samples = []
        for _ in range(cfg.batch_size):
            vid = vids[rng.randint(len(vids))]
            if args.stage <= 2:
                s = load_textonly_sample(
                    os.path.join(cfg.data_root, "train"), vid, rng,
                    cfg.maximum_ref_frames, cfg.num_target,
                    fix_frame=cfg.fix_frame, self_recon=cfg.self_recon)
            else:
                s = load_interval_sample(
                    os.path.join(cfg.data_root, "train"),
                    os.path.join(cfg.smpl_root, "train"),
                    os.path.join(cfg.mask_root, "train"),
                    vid, rng, cfg.maximum_ref_frames, 1)
                for k in ("src_imgs", "src_cams", "src_verts",
                          "src_frame_indices"):
                    s[k] = s[k][None]  # align to the (B, R, ...) layout
            samples.append(s)
        return {k: np.concatenate([s[k] for s in samples])
                for k in samples[0]}
    return load


def _adapt_train_engine(pipe, cfg, stage: int, synthetic: bool,
                        frame_stride: int = 10):
    """Stage-3/4 training rasterizes real SMPL poses: pick the measured-exact
    band capacity once for the whole run from a stride-subsampled scan of
    the train split's pose_shape.pkl files (host NumPy, startup-only)."""
    if stage <= 2 or synthetic or not os.path.isdir(
            os.path.join(cfg.smpl_root, "train")):
        return pipe
    import pickle

    from jafpro_tpu.data.dataset import list_videos
    from jafpro_tpu.pipeline import JAFProPipeline

    cams, verts = [], []
    for vid in list_videos(cfg.smpl_root, "train"):
        path = os.path.join(cfg.smpl_root, "train", vid, "pose_shape.pkl")
        if not os.path.exists(path):
            continue
        with open(path, "rb") as f:
            smpl = pickle.load(f)
        v = np.asarray(smpl["vertices"], np.float32)[::frame_stride]
        c = np.asarray(smpl["cams"], np.float32)[::frame_stride]
        verts.append(v)
        cams.append(c[: len(v)])
    if not verts:
        return pipe
    # include_crop=False: the training step is conv/backward-dominated, the
    # column crop measured no it/s change, and the cropped kernel's compile
    # is ~15x slower (TUNING.md round 3) — pay it only where it wins (infer)
    engine = pipe.flow_engine.adapt_to_clip(
        np.concatenate(cams), np.concatenate(verts), include_crop=False)
    if engine is pipe.flow_engine:
        return pipe
    print(f"raster buckets (train split, measured): rows={engine.band_rows} "
          f"cap={engine.band_capacity} crop_cols={engine.crop_cols}")
    return JAFProPipeline(cfg, flow_engine=engine)


def cmd_train(args) -> None:
    import jax
    import jax.numpy as jnp

    from jafpro_tpu.checkpoints import (
        latest_step, restore_checkpoint, save_checkpoint)
    from jafpro_tpu.config import get_general_options
    from jafpro_tpu.train import TrainState
    from jafpro_tpu.train.common import apply_curriculum
    from jafpro_tpu.utils import Logger, step_timer

    cfg = get_general_options()
    if args.synthetic:
        cfg.image_size = 64
        cfg.part_size = 16
        cfg.face_crop_size = 16
        cfg.compute_dtype = "float32"
        cfg.maximum_ref_frames = 2
    if args.no_face_gan:
        cfg.face_GAN = False  # reference flag (options.py; train/4:357-374)
    if args.dtype:
        cfg.compute_dtype = args.dtype
    if args.batch_size:
        cfg.batch_size = args.batch_size
    elif args.stage == 2:
        # the reference's stage-2 schedule trains batch 2 (train/2:64);
        # stages 1/3/4 keep the options.py batch 4
        cfg.batch_size = 2
    # per-ref unrolled AccumulateLSTM + per-step remat: same numerics and
    # per-sample speed, ~1.4G lower peak HBM — lets the reference's batch-4
    # stage-4 config train on ONE chip (TUNING.md; models/accumulate.py)
    cfg.accu_ref_major = True
    # Stage 4 at the reference batch 4: remat OFF.  The round-5
    # single-forward step + hoisted raster shrank the un-remat'd peak to
    # 14.76 GiB (bench_train_mem.py), inside the 15.75 GiB v5e budget,
    # and the step measured 1.397 vs 1.166 it/s remat'd
    # (BENCH_TRAIN_BREAKDOWN.json).  Stage 3 KEEPS remat: its un-remat'd
    # batch-4 compile is 16.66 GiB (trainable bg + backprop'd face term;
    # measured compile refusal, TUNING.md round 5).  JAFPRO_REMAT=1
    # restores remat for memory-tighter stage-4 configs.
    if args.stage == 4 and cfg.batch_size <= 4:
        cfg.remat_training = os.environ.get("JAFPRO_REMAT", "0") == "1"
    if args.debug:
        cfg.model_save_interval = 3
        cfg.vis_interval = 3

    pipe, verts = _build_pipeline(cfg, args.synthetic)
    pipe = _adapt_train_engine(pipe, cfg, args.stage, args.synthetic)
    params = pipe.init_params(jax.random.PRNGKey(args.seed))
    if args.init_from:
        params = _warm_start(params, cfg, args.stage, args.init_from)

    step_fn, lrs = _make_step(pipe, args.stage)
    state = TrainState.create(params, lrs)

    ckpt_dir = os.path.join(cfg.model_save_dir, args.exp_name)
    start_it = 0
    if args.resume:
        prev = latest_step(ckpt_dir)
        if prev is not None:
            target = {"params": state.params,
                      "opt_states": state.opt_states,
                      "step": state.step}
            restored = restore_checkpoint(ckpt_dir, prev, target)
            state = TrainState(
                params=restored["params"], opt_states=restored["opt_states"],
                txs=state.txs, step=jnp.asarray(restored["step"]))
            start_it = prev + 1
            print(f"resumed from {ckpt_dir}/iter_{prev}")

    if args.num_devices and args.num_devices > 1:
        from jafpro_tpu.parallel import create_mesh, data_parallel_jit

        if cfg.batch_size % args.num_devices:
            raise SystemExit(
                f"batch_size {cfg.batch_size} not divisible by "
                f"--num-devices {args.num_devices}")
        mesh = create_mesh(args.num_devices, ("data",))
        step = data_parallel_jit(step_fn, mesh)
        print(f"data-parallel over {args.num_devices} devices")
    else:
        step = jax.jit(step_fn)

    logger = Logger(ckpt_dir)
    rng = np.random.RandomState(args.seed + start_it)
    next_raw = _raw_batch_source(args, cfg, rng, verts)

    # full per-iteration metric series (G/D/FD/recon/...), one JSON line
    # per step — the auditable record of GAN stability that the
    # reference's console log only shows transiently
    loss_log = open(os.path.join(ckpt_dir, "losses.jsonl"),
                    "a" if start_it else "w")

    # double-buffered host->device pipeline: a worker thread reads,
    # curriculum-samples, and device_puts batch i+1 while the device runs
    # step i, so per-iter wall time is max(step, read+transfer) instead of
    # their sum (the reference gets the read half of this from DataLoader
    # workers, train/4:199-200; the H2D half matters far more on the
    # remote-TPU transport).  One worker keeps the rng consumption order
    # identical to the serial loop.
    import queue
    import threading

    batch_q: "queue.Queue" = queue.Queue(maxsize=2)

    def _feed():
        try:
            for _ in range(args.iters):
                b = apply_curriculum(dict(next_raw()), args.stage, rng,
                                     cfg.maximum_ref_frames)
                batch_q.put({k: jnp.asarray(v) for k, v in b.items()})
            batch_q.put(None)
        except BaseException as e:  # surface reader errors in the main loop
            batch_q.put(e)

    threading.Thread(target=_feed, daemon=True).start()

    for it in range(start_it, start_it + args.iters):
        batch = batch_q.get()
        if isinstance(batch, BaseException):
            raise batch

        with step_timer() as t:
            state, metrics = step(state, batch)
            jax.block_until_ready(metrics["loss"])
        loss = float(metrics["loss"])
        logger.scalar_summary("total loss", loss, it)
        row = {"stage": args.stage, "iter": it,
               "seconds": round(t["seconds"], 4)}
        row.update({k: float(v) for k, v in metrics.items()})
        loss_log.write(json.dumps(row) + "\n")
        print(f"[stage{args.stage}] iter {it} loss {loss:.4f} "
              f"({t['seconds']:.3f}s)")

        if it > 0 and it % cfg.model_save_interval == 0:
            save_checkpoint(ckpt_dir, it, {
                "params": state.params, "opt_states": state.opt_states,
                "step": state.step})
    loss_log.close()
    last = start_it + args.iters - 1
    save_checkpoint(ckpt_dir, max(last, 0), {
        "params": state.params, "opt_states": state.opt_states,
        "step": state.step})
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
        # raw restore: the checkpoint holds {params, opt_states, step} as
        # written by cmd_train; inference takes the params subtree without
        # reconstructing the trainer's optimizer target tree
        params = restore_checkpoint(ckpt_dir, step)["params"]
        print(f"restored {ckpt_dir}/iter_{step}")

    # Per-clip measured-exact band capacity: one VideoGenerator per
    # (band_rows, capacity) bucket so jit caches stay warm across clips that
    # share a bucket (capacity is a static arg of the rasterizer).
    # adapt_to_clip (host NumPy) runs in the prefetch thread; generator
    # construction stays on the compute thread (no cross-thread jit races).
    from jafpro_tpu.pipeline import JAFProPipeline

    base_engine = pipe.flow_engine
    _gens = {}
    # component ablations (e.g. --ablate pro = skip the propagation blend,
    # final == the refine+bg fusion) — the quality harness uses this to
    # attribute the flow-consistency metric to the propagation stage
    ablate = frozenset(s for s in (args.ablate or "").split(",") if s)

    def adapt_engine(clip_np):
        eng = base_engine.adapt_to_clip(clip_np["cams"], clip_np["verts"])
        # texture-warp column window: host-validated bucket over the clip's
        # IUV body extent (part id 0 outside the body -> the cropped warp
        # is bitwise-equal; see VideoGenerator.warp_crop_cols)
        from jafpro_tpu.geometry.rasterizer import select_mask_crop_cols

        warp_cols = select_mask_crop_cols(clip_np["tgt_iuv255"][..., 0] > 0)
        return eng, warp_cols

    def gen_for_engine(eng, warp_cols=0):
        # every adapt-selected field must key the cache: clips in the same
        # capacity bucket can differ in crop window / bin form / warp window
        key = (eng.band_rows, eng.band_capacity, eng.bin_impl,
               eng.bin_span, eng.crop_cols, warp_cols)
        if key not in _gens:
            p = pipe if eng is base_engine else \
                JAFProPipeline(cfg, flow_engine=eng)
            _gens[key] = VideoGenerator(p, warp_crop_cols=warp_cols,
                                        ablate=ablate, output_uint8=True)
        return _gens[key]

    import cv2
    import jax.numpy as jnp

    # which output streams to fetch + write (reference writes all four,
    # conv_pro_test.py:294-304; '--streams final' skips the D2H fetch and
    # jpg encode of the other three entirely)
    streams = frozenset(s for s in args.streams.split(",") if s)
    bad = streams - {"final", "coarse", "mask", "tsf"}
    if bad or "final" not in streams:
        raise SystemExit(f"--streams must include 'final' and only "
                         f"final/coarse/mask/tsf (got {args.streams!r})")
    _prefix = {"final": "frame", "coarse": "coarse_frame",
               "mask": "mask_frame", "tsf": "tsf_frame"}

    def write_frames(vid, out, clip_idx=None):
        pick = (lambda x: x[clip_idx]) if clip_idx is not None else \
            (lambda x: x)
        save_dir = os.path.join(cfg.test_save_dir, args.exp_name, vid)
        os.makedirs(save_dir, exist_ok=True)
        for s in ("final", "coarse", "mask", "tsf"):
            if s not in streams:
                continue
            if s == "mask":
                arr = np.asarray(pick(out["mask"]))
                if arr.dtype != np.uint8:  # output_uint8 pre-encodes
                    arr = np.clip(arr * 255, 0, 255).astype(np.uint8)
            else:
                arr = frames_to_uint8(pick(out[s]))
            for i in range(arr.shape[0]):
                cv2.imwrite(
                    os.path.join(save_dir, f"{_prefix[s]}_{i:03d}.jpg"),
                    arr[i])
        print("wrote", save_dir)

    # the reference appends one line per video naming the chosen reference
    # frames (``src/data.py:530-535`` -> log_result/chosen_frame.txt); kept
    # as an audit trail of the angle-based selection
    audit_dir = os.path.join(cfg.project_dir, "log_result")
    os.makedirs(audit_dir, exist_ok=True)
    audit_path = os.path.join(audit_dir, "chosen_frame.txt")

    # --packed-clips: serve from the pre-packed clip shard (pack --kind
    # clips) instead of per-clip PNG decodes — the round-4 phase breakdown
    # put decode at 0.75 s/clip on a 1-core host (TUNING.md), all of which
    # moves to pack time.  Matches the training path's uint8 wire format.
    pack_reader = None
    if getattr(args, "packed_clips", ""):
        from jafpro_tpu.data.shardio import ClipPackReader

        pack_reader = ClipPackReader(args.packed_clips)
        _vid_idx = {v: i for i, v in enumerate(pack_reader.vids)}

    def load_one(vid):
        if pack_reader is not None:
            clip = pack_reader.load(_vid_idx[vid])
        else:
            clip = load_clip(
                os.path.join(cfg.data_root, "test"),
                os.path.join(cfg.smpl_root, "test"),
                os.path.join(cfg.mask_root, "test"),
                vid, num_refs=args.num_refs)
        msg = "the chosen frame index of video %s is" % vid
        msg += "".join(",%s" % n for n in clip["chosen_names"])
        with open(audit_path, "a") as f:
            f.write("%s.\n\n" % msg)
        return clip

    def to_device(clip_np):
        return {k: jnp.asarray(v) for k, v in clip_np.items()
                if k not in ("gt_frames", "vid_name", "chosen_names")}

    # Overlapped serving loop: prefetch thread decodes + adapts clip i+1,
    # the device generates clip i, the writer pool encodes clip i-1 — the
    # reference's loop is strictly serial (conv_pro_test.py:143-163) and its
    # own timing shows host prep dominating.
    from jafpro_tpu.utils.overlap import run_overlapped

    vids = (list(pack_reader.vids) if pack_reader is not None
            else list_videos(cfg.data_root, "test"))
    nd = max(args.num_devices, 1)
    # One timing window + clip counter across BOTH loops (the nd-clip
    # group path and the remainder single-clip path), so
    # serving_stats.json represents every served clip (ADVICE r4).
    t0 = time.perf_counter()
    n_done = 0
    if nd > 1:
        # whole-clip data parallelism: nd clips per device program
        from jafpro_tpu.parallel import create_mesh

        mesh = create_mesh(nd, ("data",))
        groups = [tuple(vids[s:s + nd])
                  for s in range(0, len(vids) - len(vids) % nd, nd)]

        def load_group(group):
            clips_np = [load_one(v) for v in group]
            adapted = [adapt_engine(c) for c in clips_np]
            return [to_device(c) for c in clips_np], adapted

        def compute_group(group, loaded):
            clips_dev, adapted = loaded
            engines = [e for e, _ in adapted]
            # the warp window merges by the crop_cols rule: any clip that
            # fit no bucket (0) forces full width, else the widest wins
            warp_list = [w for _, w in adapted]
            warp_cols = 0 if 0 in warp_list else max(warp_list)
            # one program per group: merge the clips' adapted engines
            # field-by-field into one exact for every clip (clip A can
            # bind the capacity while clip B binds the crop window)
            from jafpro_tpu.geometry.flow import SMPLFlowEngine
            gen = gen_for_engine(SMPLFlowEngine.merge_conservative(engines),
                                 warp_cols)
            clips = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *clips_dev)
            return gen.generate_batch(params, clips, mesh=mesh)

        def write_group(group, out):
            for ci, vid in enumerate(group):
                write_frames(vid, out, clip_idx=ci)

        for _ in run_overlapped(groups, load_group, compute_group,
                                write_group):
            n_done += nd
        vids = vids[len(vids) - len(vids) % nd:]  # remainder: single path

    def load_single(vid):
        clip_np = load_one(vid)
        eng, warp_cols = adapt_engine(clip_np)
        # H2D in the prefetch thread: the clip transfer (uint8 wire form,
        # see load_clip) rides the load phase, not the device phase
        return to_device(clip_np), (eng, warp_cols)

    def compute_single(vid, loaded):
        clip_dev, (eng, warp_cols) = loaded
        return gen_for_engine(eng, warp_cols)(params, clip_dev)

    # Overlap degree: on few-core hosts MORE prefetch threads can lose
    # (concurrent decodes time-slice one core and their device_puts
    # interleave on the single multiplexed transport) — tunable so the
    # serving harness can pick the measured-best for the machine.
    prefetch = int(os.environ.get("JAFPRO_SERVE_PREFETCH", "2"))
    writers = int(os.environ.get("JAFPRO_SERVE_WRITERS", "2"))

    for _ in run_overlapped(list(vids), load_single, compute_single,
                            write_frames, prefetch=prefetch,
                            writers=writers):
        n_done += 1
    loop_s = time.perf_counter() - t0
    # loop-only serving stats (excludes the per-invocation pipeline
    # build/param-init/restore setup), for tools/serving_run.py
    if n_done:
        stats = {"clips": n_done, "loop_seconds": round(loop_s, 3)}
        with open(os.path.join(cfg.test_save_dir, args.exp_name,
                               "serving_stats.json"), "w") as f:
            json.dump(stats, f)
    print("Testing Done.")


def _metric_hooks(image_size: int = 256):
    """Build the VGG-perceptual and FlowNetSD flow-consistency hooks for
    ``evaluate_video`` (the reference logs all six metrics,
    ``test/video_evaluation.py:184-246``).

    Pretrained weights are converted from torch checkpoints when the env
    vars ``JAFPRO_VGG19_WEIGHTS`` / ``JAFPRO_FLOWNETSD_WEIGHTS`` point at
    them; otherwise fixed-seed random filters are used (still a valid
    relative metric — random-feature perceptual distances rank the same
    orderings — and documented so numbers are reproducible)."""
    import jax
    import jax.numpy as jnp

    from jafpro_tpu.models.flownet import FlowNetSD, load_torch_flownet_sd
    from jafpro_tpu.models.vgg import VGG19Features, load_torch_vgg19

    vgg = VGG19Features()
    vp = os.environ.get("JAFPRO_VGG19_WEIGHTS", "")
    if vp and os.path.exists(vp):
        vgg_vars = load_torch_vgg19(vp)
    else:
        vgg_vars = vgg.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))

    flow = FlowNetSD()
    fp = os.environ.get("JAFPRO_FLOWNETSD_WEIGHTS", "")
    if fp and os.path.exists(fp):
        flow_vars = load_torch_flownet_sd(fp)
    else:
        flow_vars = flow.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 64, 64, 6), jnp.float32))

    def flow_apply(variables, pairs):
        return flow.apply(variables, pairs)

    return {
        "vgg_apply": vgg.apply, "vgg_params": vgg_vars,
        "flow_apply": flow_apply, "flow_params": flow_vars,
    }


def _eval_select_frames(files, data_type: str, role: str):
    """Frame-name selection + ordering for one video dir, matching the
    reference evaluator's three prediction conventions
    (``test/video_evaluation.py:104-134``):

    * gt (any type): drop text/mask/IUV/bbox files, sort by the frame
      index parsed as ``int(name[6:-4])`` (``frame_<i>.jpg``);
    * densepose pred: additionally drop coarse/tsf, same sort;
    * openpose pred: keep ``*src*``-free pngs, sort ``int(name[11:-4])``
      (``synthesized_<i>.png`` etc. — an 11-char prefix);
    * every pred: keep ``*synthesized*`` files, sort ``int(name[4:8])``
      (a 4-digit index at chars 4..8).

    Falls back to a lexicographic sort when a name does not carry the
    convention's integer (zero-padded layouts sort identically; the
    reference would crash instead)."""
    if role == "gt" or data_type == "densepose":
        drop = ("text", "mask", "IUV", "bbox")
        if role != "gt":
            drop += ("coarse", "tsf")
        keep = [f for f in files
                if f.endswith((".jpg", ".png"))
                and all(s not in f for s in drop)]
        key = lambda x: int(x[6:-4])  # noqa: E731
    elif data_type == "openpose":
        keep = [f for f in files if f.find("png") > 0 and "src" not in f]
        key = lambda x: int(x[11:-4])  # noqa: E731
    else:  # every
        keep = [f for f in files if "synthesized" in f]
        key = lambda x: int(x[4:8])  # noqa: E731
    try:
        return sorted(keep, key=key)
    except ValueError:
        return sorted(keep)


def cmd_evaluate(args) -> None:
    import cv2

    from jafpro_tpu.evaluate import evaluate_video

    hooks = {} if args.no_deep_metrics else _metric_hooks()
    data_type = getattr(args, "type", "densepose")

    def read_frames(d, role):
        names = _eval_select_frames(sorted(os.listdir(d)), data_type, role)
        if not names:
            raise SystemExit(
                f"evaluate: no frames matching the '{data_type}' "
                f"convention in {d}")
        frames = []
        for n in names:
            img = cv2.imread(os.path.join(d, n))
            if img is None:
                raise SystemExit(f"evaluate: unreadable frame {d}/{n}")
            if role == "pred" and data_type == "every":
                # the reference nearest-resizes 'every' predictions to 256
                img = cv2.resize(img, (256, 256),
                                 interpolation=cv2.INTER_NEAREST)
            frames.append(img)
        return np.stack(frames)

    for name, d in (("--pred", args.pred), ("--gt", args.gt)):
        if not os.path.isdir(d):
            raise SystemExit(
                f"evaluate: {name} directory not found: {d} "
                "(expected per-video subdirectories of frames)")
    # openpose prediction roots hold auxiliary dirs whose names end in
    # 'o' (the reference skips them, video_evaluation.py:75-82)
    results = []
    vids = sorted(os.listdir(args.pred))
    if data_type == "openpose":
        vids = [v for v in vids if not v.endswith("o")]
    for vid in vids:
        pd, gd = os.path.join(args.pred, vid), os.path.join(args.gt, vid)
        if not (os.path.isdir(pd) and os.path.isdir(gd)):
            continue
        m = evaluate_video(read_frames(pd, "pred"), read_frames(gd, "gt"),
                           **hooks)
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


def cmd_gif(args) -> None:
    """Stack each video's generated frames into a GIF
    (``test/convert_gif.py:36-51``: skips the mask_/coarse_/tsf_ variants,
    sorts by frame number, BGR->RGB, one GIF per video under
    ``gif_result/<project>/``)."""
    import re

    import cv2

    from jafpro_tpu.data.texture import write_gif

    if not os.path.isdir(args.pred_dir):
        raise SystemExit(f"gif: --pred_dir not found: {args.pred_dir}")
    project = os.path.basename(os.path.normpath(args.pred_dir))
    frame_re = re.compile(r"^frame_(\d+)\.(jpg|png)$")
    for vid in sorted(os.listdir(args.pred_dir)):
        vdir = os.path.join(args.pred_dir, vid)
        if not os.path.isdir(vdir):
            continue
        matches = sorted(
            (int(m.group(1)), n)
            for n in os.listdir(vdir)
            if (m := frame_re.match(n)) is not None)
        if not matches:
            continue
        frames = []
        for _, n in matches:
            img = cv2.imread(os.path.join(vdir, n))
            if img is None:
                raise SystemExit(f"gif: unreadable frame {vdir}/{n}")
            frames.append(img[:, :, ::-1])
        frames = np.stack(frames)
        out_dir = os.path.join(args.out_dir, project, vid + "_video")
        os.makedirs(out_dir, exist_ok=True)
        path = write_gif(os.path.join(out_dir, "video.gif"),
                         frames, fps=args.fps)
        print("wrote", path)


def cmd_pack(args) -> None:
    from jafpro_tpu.config import get_general_options
    from jafpro_tpu.data.shardio import pack_dancevideo, pack_test_clips

    cfg = get_general_options()
    if args.kind == "clips":
        n = pack_test_clips(
            cfg.data_root, cfg.smpl_root, cfg.mask_root, args.out,
            mode=args.mode, num_refs=args.num_refs)
        print(f"packed {n} clips into {args.out}")
        return
    n = pack_dancevideo(
        cfg.data_root, cfg.smpl_root, cfg.mask_root,
        args.out, mode=args.mode, kind=args.kind,
        samples_per_video=args.samples_per_video,
        num_refs=args.num_refs, seed=args.seed)
    print(f"packed {n} samples into {args.out}")


def main(argv: Optional[list] = None) -> None:
    from jafpro_tpu.utils.xla_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser(prog="jafpro_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--stage", type=int, required=True, choices=[1, 2, 3, 4])
    t.add_argument("--exp_name", "-n", default="exp")
    t.add_argument("--debug", action="store_true")
    t.add_argument("--synthetic", action="store_true")
    t.add_argument("--iters", type=int, default=10)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--batch-size", type=int, default=0,
                   help="override cfg.batch_size (0 = reference default)")
    t.add_argument("--num-devices", type=int, default=0,
                   help="data-parallel mesh size (0/1 = single device)")
    t.add_argument("--shards", default="",
                   help="packed-shard dir or glob (see the pack subcommand); "
                   "training then streams through the native reader")
    t.add_argument("--init-from", default="",
                   help="cross-stage warm start: seed this stage's consumed "
                   "module subtrees (stage 2: accu; 3: accu+inpaint; "
                   "4: accu+inpaint+bg+refine) from another experiment's "
                   "checkpoint, '<exp>[:<step>]' (latest step if omitted); "
                   "optimizer state starts fresh")
    t.add_argument("--resume", action="store_true",
                   help="resume params+optimizer+step from the latest "
                   "checkpoint in the experiment dir")
    t.add_argument("--no-face-gan", action="store_true",
                   help="disable the face GAN (reference face_GAN option: "
                   "no face-D updates, no F_errG term)")
    t.add_argument("--dtype", default="",
                   help="override compute_dtype (e.g. float32 for the "
                   "bf16-vs-f32 training-parity ablation)")
    t.set_defaults(fn=cmd_train)

    i = sub.add_parser("infer")
    i.add_argument("--exp_name", "-e", default="exp")
    i.add_argument("--num_refs", "-n", type=int, default=4)
    i.add_argument("--streams", default="final,coarse,mask,tsf",
                   help="comma-set of output streams to fetch+write "
                        "(reference writes all four, conv_pro_test.py:"
                        "294-304; serving that only needs the video passes "
                        "'final' — the D2H fetch and jpg encode shrink "
                        "accordingly)")
    i.add_argument("--ablate", default="",
                   help="comma-separated components to stub out (e.g. "
                        "'pro' skips the propagation blend; see "
                        "infer.VideoGenerator.ablate)")
    i.add_argument("--num-devices", type=int, default=0,
                   help="shard whole clips across a data-parallel mesh "
                   "(serving scale-out; 0/1 = single device)")
    i.add_argument("--packed-clips", default="",
                   help="serve from a packed clip shard (pack --kind "
                   "clips --mode test) instead of per-clip PNG decodes")
    i.set_defaults(fn=cmd_infer)

    e = sub.add_parser("evaluate")
    e.add_argument("--pred", required=True)
    e.add_argument("--gt", required=True)
    e.add_argument("--type", default="densepose",
                   choices=["densepose", "openpose", "every"],
                   help="prediction-dir naming convention "
                        "(test/video_evaluation.py:75-134)")
    e.add_argument("--no-deep-metrics", action="store_true",
                   help="skip the VGG/FlowNetSD hooks (4 fast metrics only)")
    e.set_defaults(fn=cmd_evaluate)

    g = sub.add_parser(
        "gif", help="stack generated frames into per-video GIFs "
        "(test/convert_gif.py equivalent)")
    g.add_argument("--pred_dir", required=True,
                   help="inference output dir (per-video subdirs of frames)")
    g.add_argument("--out_dir", default="gif_result")
    # fps=10 matches the reference's src/utils.gif default used by
    # test/convert_gif.py
    g.add_argument("--fps", type=int, default=10)
    g.set_defaults(fn=cmd_gif)

    k = sub.add_parser(
        "pack", help="pre-pack DanceVideo interval samples into native "
        "shards (the TPU input pipeline reads these instead of re-decoding "
        "images per sample)")
    k.add_argument("--out", required=True)
    k.add_argument("--mode", default="train", choices=["train", "test"])
    k.add_argument("--kind", default="interval",
                   choices=["interval", "textonly", "clips"],
                   help="interval = stage-3/4 records, textonly = stage-1/2,"
                   " clips = whole serving clips for `infer --packed-clips`")
    k.add_argument("--samples_per_video", type=int, default=4)
    k.add_argument("--num_refs", type=int, default=4)
    k.add_argument("--seed", type=int, default=0)
    k.set_defaults(fn=cmd_pack)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
