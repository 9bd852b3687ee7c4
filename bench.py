"""Benchmark: 4-reference, 30-frame, 256x256 video generation throughput.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is frames/sec/chip of the full flagship inference pipeline
(texture accumulate + inpaint once per clip, then 30 scanned frames of
warp -> refine -> fuse -> SMPL-flow -> propagate) on real SMPL topology
(13776 faces).  ``vs_baseline`` compares against a recorded reference
throughput in BENCH_BASELINE.json if present (the upstream repo publishes
no numbers — BASELINE.md), else 1.0.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def setup(T=30, R=4, S=256, p=200):
    """Build the bench pipeline/params/clip (shared with bench_breakdown.py).

    Returns (pipe, params, clip, T, warp_cols) — warp_cols is the
    production-selected texture-warp column window for this clip
    (VideoGenerator.warp_crop_cols).
    """
    import jax
    import jax.numpy as jnp

    from jafpro_tpu.utils.xla_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from jafpro_tpu.config import Config, default_smpl_faces_path
    from jafpro_tpu.geometry.flow import SMPLFlowEngine
    from jafpro_tpu.pipeline import JAFProPipeline
    from jafpro_tpu.train.common import synthetic_quad_mesh

    cfg = Config(image_size=S, part_size=p, maximum_ref_frames=R,
                 compute_dtype="bfloat16",
                 part_conv_impl=os.environ.get("BENCH_PART_CONV", "blocks8"))
    path = default_smpl_faces_path()
    if path is not None:
        faces = np.load(path).astype(np.int32)
    else:
        _, faces = synthetic_quad_mesh(64)

    rng = np.random.RandomState(0)
    iuv = np.zeros((T, S, S, 3), np.float32)
    iuv[..., 0] = rng.randint(0, 25, (T, S, S))
    iuv[..., 1:] = rng.randint(0, 256, (T, S, S, 2))
    # Topology-consistent body-proportioned mesh (independent random verts
    # make every triangle span the frame, which is neither a realistic
    # workload nor admissible for the banded rasterizer's capacity check).
    from jafpro_tpu.utils.meshproxy import smoothed_topology_vertices

    base = smoothed_topology_vertices(faces)
    verts = (base[None]
             + rng.normal(scale=0.01, size=(T, 1, 3))).astype(np.float32)
    verts[..., 2] += 2.0

    # Confine the IUV body to the mesh's projected column extents: a real
    # DensePose part-id map is 0 off the body (the body occupies the same
    # columns the rasterizer's window covers), while the round-2 full-frame
    # random part ids described a body 256 columns wide.  This does NOT
    # change the uncropped timing — the warp gathers once per pixel
    # regardless of part id — it makes the workload one where the
    # production warp_crop_cols bucket exists, as it does on real clips.
    from jafpro_tpu.geometry.projection import project_to_view_np

    view = project_to_view_np(verts, np.tile(
        np.asarray([[1.0, 0.0, 0.0]], np.float32), (T, 1)), 30.0)
    px = 0.5 * (view[..., 0] * S + S - 1)
    lo = max(int(np.floor(px.min())) - 1, 0)
    hi = min(int(np.ceil(px.max())) + 1, S - 1)
    body_cols = np.zeros((S,), bool)
    body_cols[lo:hi + 1] = True
    iuv[..., 0] *= body_cols[None, None, :]

    engine = SMPLFlowEngine.create(
        faces=faces, image_size=S, chunk=cfg.rasterizer_face_chunk,
        band_rows=int(os.environ.get("BENCH_BAND_ROWS", "16")),
        depth_mode=os.environ.get("BENCH_DEPTH_MODE", "fused"))
    cap_env = os.environ.get("BENCH_BAND_CAPACITY", "auto")
    cams_np = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (T, 1))
    if cap_env == "auto":
        # the production path: measured-exact per-clip capacity bucket (+
        # copysort span + depth-range check, see adapt_to_clip)
        engine = engine.adapt_to_clip(cams_np, verts)
    else:
        import dataclasses
        engine = dataclasses.replace(engine, band_capacity=int(cap_env))
    import dataclasses
    if "BENCH_BIN_IMPL" in os.environ:  # A/B override: sort | copysort
        engine = dataclasses.replace(
            engine, bin_impl=os.environ["BENCH_BIN_IMPL"])
    if "BENCH_RANGE_CHECKED" in os.environ:  # A/B override: 0 | 1
        engine = dataclasses.replace(
            engine,
            depth_range_checked=bool(int(os.environ["BENCH_RANGE_CHECKED"])))
    if "BENCH_CROP_COLS" in os.environ:  # A/B override: 0 = full width
        engine = dataclasses.replace(
            engine, crop_cols=int(os.environ["BENCH_CROP_COLS"]))
    # production warp window: the host-validated bucket over the clip's
    # IUV body extent (cli.py's adapt step does the same per clip)
    from jafpro_tpu.geometry.rasterizer import select_mask_crop_cols

    warp_cols = select_mask_crop_cols(iuv[..., 0] > 0)
    if "BENCH_WARP_CROP" in os.environ:  # A/B override: 0 = full width
        warp_cols = int(os.environ["BENCH_WARP_CROP"])
    import sys
    print(f"bench config: band_rows={engine.band_rows} "
          f"band_capacity={engine.band_capacity} "
          f"bin={engine.bin_impl}/{engine.bin_span} "
          f"rangechk={int(engine.depth_range_checked)} "
          f"crop_cols={engine.crop_cols} warp_crop={warp_cols}",
          file=sys.stderr)
    pipe = JAFProPipeline(cfg, flow_engine=engine)
    params = pipe.init_params(jax.random.PRNGKey(0))
    clip = {
        "src_parts": jnp.asarray(
            rng.uniform(-1, 1, (1, R, 24, p, p, 3)), jnp.float32),
        "src_mask_parts": jnp.asarray(
            (rng.rand(1, R, 24, p, p) > 0.5), jnp.float32),
        "ref_mask": jnp.ones((1, R), jnp.float32),
        "bg_incomplete": jnp.asarray(
            rng.uniform(-1, 1, (1, S, S, 3)), jnp.float32),
        "src_imgs": jnp.asarray(
            rng.uniform(-1, 1, (R, S, S, 3)), jnp.float32),
        "chosen_frames": jnp.asarray([0, 9, 19, 29], jnp.int32),
        "tgt_iuv255": jnp.asarray(iuv),
        "tgt_iuv": jnp.asarray((iuv / 255.0 - 0.5) * 2.0, jnp.float32),
        "smpl_mask": jnp.ones((T, S, S, 1), jnp.float32),
        "cams": jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (T, 1)),
        "verts": jnp.asarray(verts),
    }
    return pipe, params, clip, T, warp_cols


def setup_fixture_clip(R=4):
    """Held-out secondary workload (VERDICT r3 weak #6): a make_fixture
    clip loaded from DISK through the production ``load_clip`` path, so the
    timed program runs on DensePose-like IUV statistics that the bench
    author did not tune.  ``BENCH_CLIP=<fixture root>`` points at an
    existing fixture; otherwise a deterministic 30-frame one is written to
    a temp dir (tools/make_fixture.py, seed 0).

    Returns (pipe, params, clip, T, warp_cols) like ``setup()``."""
    import jax
    import jax.numpy as jnp

    from jafpro_tpu.config import Config
    from jafpro_tpu.data.dataset import list_videos, load_clip
    from jafpro_tpu.geometry.rasterizer import select_mask_crop_cols
    from jafpro_tpu.pipeline import JAFProPipeline

    root = os.environ.get("BENCH_CLIP", "")
    if not root:
        import tempfile

        root = os.path.join(tempfile.gettempdir(), "jafpro_bench_fixture")
        if not os.path.isdir(os.path.join(root, "data", "test")):
            import sys
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools"))
            from make_fixture import write_fixture

            write_fixture(root, vids_per_mode=2, frames=30, seed=0)

    vids = list_videos(os.path.join(root, "data"), "test")
    vid = os.environ.get("BENCH_CLIP_VID", vids[0])
    clip_np = load_clip(
        os.path.join(root, "data", "test"),
        os.path.join(root, "smpl", "test"),
        os.path.join(root, "mask", "test"), vid, num_refs=R)

    T, S = clip_np["tgt_iuv255"].shape[:2]
    cfg = Config(image_size=S, part_size=200, maximum_ref_frames=R,
                 compute_dtype="bfloat16",
                 part_conv_impl=os.environ.get("BENCH_PART_CONV", "blocks8"))
    base = JAFProPipeline(cfg)  # auto-discovers the SMPL faces asset
    # the production serving path: per-clip measured band capacity + crop
    # window (cli.py's adapt step)
    engine = base.flow_engine.adapt_to_clip(clip_np["cams"], clip_np["verts"])
    warp_cols = select_mask_crop_cols(clip_np["tgt_iuv255"][..., 0] > 0)
    pipe = JAFProPipeline(cfg, flow_engine=engine)
    params = pipe.init_params(jax.random.PRNGKey(0))
    clip = {k: jnp.asarray(v) for k, v in clip_np.items()
            if k not in ("gt_frames", "vid_name", "chosen_names")}
    import sys
    print(f"fixture clip {vid}: T={T} S={S} "
          f"band_capacity={engine.band_capacity} "
          f"crop_cols={engine.crop_cols} warp_crop={warp_cols}",
          file=sys.stderr)
    return pipe, params, clip, T, warp_cols


def time_pipeline(pipe, params, clip, T, warp_cols):
    """Median-of-repeats frames/s of the full generator on one clip.

    Chains iterations through a data dependency and times to a full host
    fetch: on remote-tunnel runtimes block_until_ready can return early,
    so only the (t_chained - t_single) delta measures device time."""
    import jax
    import jax.numpy as jnp

    from jafpro_tpu.infer import VideoGenerator

    gen = VideoGenerator(
        pipe, frame_batch=int(os.environ.get("BENCH_FRAME_BATCH", "1")),
        raster_mode=os.environ.get("BENCH_RASTER_MODE", "scan"),
        flow_mode=os.environ.get("BENCH_FLOW_MODE", "scan"),
        warp_mode=os.environ.get("BENCH_WARP_MODE", "lut"),
        warp_crop_cols=warp_cols,
        crop_flow=bool(int(os.environ.get("BENCH_FLOW_CROP", "1"))))

    # BENCH_CLIPS > 1: serving throughput — generate a batch of independent
    # clips in one program (vmap over clips; per-frame scan batches across
    # clips at each step).  Metric stays frames/sec/chip (aggregate).
    n_clips = int(os.environ.get("BENCH_CLIPS", "1"))
    if n_clips > 1:
        clip = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * n_clips), clip)
        single_gen = gen
        gen = lambda p_, c_: single_gen.generate_batch(p_, c_)

    chain = jax.jit(lambda c, final: dict(
        c, bg_incomplete=c["bg_incomplete"] + 1e-12 * jnp.mean(final)))

    out = gen(params, clip)            # compile + warm
    clip2 = chain(clip, out["final"])  # compile chain helper
    out = gen(params, clip2)
    np.asarray(out["final"])

    def run(n):
        t0 = time.perf_counter()
        c = clip
        o = gen(params, c)
        for _ in range(n - 1):
            c = chain(c, o["final"])
            o = gen(params, c)
        np.asarray(o["final"])
        return time.perf_counter() - t0

    # N in-process repeats: cross-session tunnel variance is ~25%
    # (TUNING.md), so a single sample produces README/driver disagreements.
    # The canonical value is the MEDIAN of the repeats; spread_pct
    # (max-min)/median documents the in-session noise floor.
    n_iters = int(os.environ.get("BENCH_ITERS", "8"))
    n_repeats = max(int(os.environ.get("BENCH_REPEATS", "3")), 1)
    samples = []
    for _ in range(n_repeats):
        t1 = run(1)
        tn = run(1 + n_iters)
        dt = max((tn - t1) / n_iters, 1e-9)
        samples.append(T * n_clips / dt)
    samples.sort()
    fps = samples[len(samples) // 2] if n_repeats % 2 else \
        0.5 * (samples[len(samples) // 2 - 1] + samples[len(samples) // 2])
    spread = (samples[-1] - samples[0]) / fps if fps > 0 else 0.0
    return fps, samples, spread


def main():
    pipe, params, clip, T, warp_cols = setup()
    fps, samples, spread = time_pipeline(pipe, params, clip, T, warp_cols)

    baseline = None
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            baseline = json.load(open("BENCH_BASELINE.json")).get("value")
        except Exception:
            baseline = None
    vs = (fps / baseline) if baseline else 1.0
    record = {
        "metric": "video_gen_frames_per_sec_per_chip_256px_4ref_30f",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3),
        "repeats": [round(s, 2) for s in samples],
        "spread_pct": round(100 * spread, 1),
    }

    # held-out disk-clip workload (BENCH_FIXTURE=0 skips it)
    if os.environ.get("BENCH_FIXTURE", "1") != "0":
        try:
            f_fps, f_samples, f_spread = time_pipeline(*setup_fixture_clip())
            record["fixture"] = {
                "value": round(f_fps, 3),
                "repeats": [round(s, 2) for s in f_samples],
                "spread_pct": round(100 * f_spread, 1),
                "vs_baseline": round(
                    (f_fps / baseline) if baseline else 1.0, 3),
            }
        except Exception as e:  # the headline metric must still print
            record["fixture"] = {"error": repr(e)}
    print(json.dumps(record))


if __name__ == "__main__":
    main()
