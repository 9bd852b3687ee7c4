"""Training throughput: one full stage-4 step (batch 4, 256x256, 24x200x200
texture parts, real SMPL topology) on the available device.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} with
iterations/sec (the reference's stage-4 configuration trains batch 4 on one
GPU; BASELINE.md pins no published number).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from jafpro_tpu.config import Config, default_smpl_faces_path
    from jafpro_tpu.geometry.flow import SMPLFlowEngine
    from jafpro_tpu.pipeline import JAFProPipeline
    from jafpro_tpu.train import TrainState, make_stage4_step
    from jafpro_tpu.train.common import synthetic_batch, synthetic_quad_mesh
    from jafpro_tpu.train.stage34 import stage4_lrs

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "4"))
    cfg = Config(compute_dtype="bfloat16", maximum_ref_frames=4,
                 part_conv_impl=os.environ.get("BENCH_PART_CONV", "blocks8"),
                 # production cli-train config for stage 3/4 at batch<=4:
                 # remat OFF (fits un-remat'd since the round-5 vjp step;
                 # 14.76 GiB peak, bench_train_mem.py; cli.cmd_train)
                 remat_training=os.environ.get("JAFPRO_REMAT", "0") == "1",
                 accu_ref_major=os.environ.get(
                     "JAFPRO_REF_MAJOR", "1") == "1")
    path = default_smpl_faces_path()
    if path is not None:
        faces = np.load(path).astype(np.int32)
        num_verts = int(faces.max()) + 1
    else:
        verts, faces = synthetic_quad_mesh(64)
        num_verts = verts.shape[0]
    engine = SMPLFlowEngine.create(
        faces=faces, image_size=cfg.image_size,
        chunk=cfg.rasterizer_face_chunk)

    rng = np.random.RandomState(0)
    b = synthetic_batch(rng, batch=B, num_refs=4, part_size=cfg.part_size,
                        image_size=cfg.image_size, num_verts=num_verts)
    if path is not None:
        # body-proportioned topology vertices (same construction as
        # bench.py): independent random vertices are not a representative
        # raster workload, and the production CLI trainer adapts the
        # engine to the train split's measured occupancy/crop the same
        # way (cli._adapt_train_engine)
        from jafpro_tpu.utils.meshproxy import smoothed_topology_vertices

        base = smoothed_topology_vertices(faces)
        for k in ("prev_verts", "tgt_verts"):
            b[k] = (base[None] + rng.normal(scale=0.01, size=(B, 1, 3))
                    ).astype(np.float32)
            b[k][..., 2] += 2.0
        if os.environ.get("BENCH_TRAIN_ADAPT", "1") == "1":
            # include_crop matches cli._adapt_train_engine (off for training:
            # no measured it/s change, ~15x slower compile; TUNING.md round 3)
            engine = engine.adapt_to_clip(
                np.concatenate([b["prev_cam"], b["tgt_cam"]]),
                np.concatenate([b["prev_verts"], b["tgt_verts"]]),
                include_crop=os.environ.get("BENCH_TRAIN_CROP", "0") == "1")
            print(f"bench_train engine: rows={engine.band_rows} "
                  f"cap={engine.band_capacity} bin={engine.bin_impl} "
                  f"crop_cols={engine.crop_cols}")
    pipe = JAFProPipeline(cfg, flow_engine=engine)
    params = pipe.init_params(jax.random.PRNGKey(0))
    state = TrainState.create(params, stage4_lrs())

    batch = {k: jnp.asarray(v) for k, v in b.items()}

    step = jax.jit(make_stage4_step(pipe), donate_argnums=(0,))

    state, metrics = step(state, batch)
    _ = np.asarray(metrics["loss"])  # compile + warm (full host fetch)

    n = int(os.environ.get("BENCH_ITERS", "6"))
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch)
    _ = np.asarray(metrics["loss"])  # step chain is sequential by state
    dt = (time.perf_counter() - t0) / n

    baseline = None
    if B == 4 and os.path.exists("BENCH_TRAIN_BASELINE.json"):
        try:
            baseline = json.load(
                open("BENCH_TRAIN_BASELINE.json")).get("value")
        except Exception:
            baseline = None
    ips = 1.0 / dt
    # vs_baseline is null when no baseline was loaded (absent file or B != 4)
    # so consumers can tell "no baseline" from a measured 1.0x
    print(json.dumps({
        "metric": f"stage4_train_iters_per_sec_batch{B}_256px",
        "value": round(ips, 4),
        "unit": "iters/s",
        "vs_baseline": round(ips / baseline, 3) if baseline else None,
    }))


if __name__ == "__main__":
    main()
