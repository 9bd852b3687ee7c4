"""Compile-only HBM analysis of the stage-4 training step (no execution).

Lowers + compiles the full stage-4 step for the attached device at the
requested batch size and prints XLA's memory analysis — peak temp /
argument / output bytes — as one JSON line.  Used to close the batch-4
single-chip gap (TUNING.md: 16.09G vs the 15.75G v5e budget at batch 4
with the round-1 remat settings) without paying a full training run per
config.

Env knobs: BENCH_TRAIN_BATCH (default 4), BENCH_TRAIN_STAGE (default 4),
JAFPRO_REMAT (default "1"),
JAFPRO_REF_MAJOR (default "1": the per-ref unrolled AccumulateLSTM —
see models/accumulate.py).
"""

from __future__ import annotations

import json
import os

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
                 remat_training=os.environ.get("JAFPRO_REMAT", "1") == "1",
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
    pipe = JAFProPipeline(cfg, flow_engine=engine)
    params = pipe.init_params(jax.random.PRNGKey(0))
    state = TrainState.create(params, stage4_lrs())

    rng = np.random.RandomState(0)
    b = synthetic_batch(rng, batch=B, num_refs=4, part_size=cfg.part_size,
                        image_size=cfg.image_size, num_verts=num_verts)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    stage = int(os.environ.get("BENCH_TRAIN_STAGE", "4"))
    if stage == 3:
        from jafpro_tpu.train.stage34 import make_stage3_step, stage3_lrs

        state = TrainState.create(params, stage3_lrs())
        step = jax.jit(make_stage3_step(pipe), donate_argnums=(0,))
    else:
        step = jax.jit(make_stage4_step(pipe), donate_argnums=(0,))
    compiled = step.lower(state, batch).compile()
    m = compiled.memory_analysis()
    out = {"stage": stage, "batch": B, "remat": cfg.remat_training,
           "ref_major": cfg.accu_ref_major}
    if m is not None:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(m, k, None)
            if v is not None:
                out[k] = int(v)
        tot = (out.get("temp_size_in_bytes", 0)
               + out.get("argument_size_in_bytes", 0)
               + out.get("output_size_in_bytes", 0)
               - out.get("alias_size_in_bytes", 0))
        out["peak_gib"] = round(tot / 2**30, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
