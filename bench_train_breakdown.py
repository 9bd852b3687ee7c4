"""Per-component attribution of the stage-4 training step (VERDICT r4
Next #1a): where does the step's wall time actually go?

Methodology — ablation differences on the CHAINED full step, mirroring
bench_breakdown.py's inference-side attribution: each variant times the
complete ``make_stage4_step`` program with ONE component stubbed out
(``ablate`` hook in ``train/stage34.py``); the component's cost is
t(full) - t(variant).  Isolated per-component jits are NOT used: through
the remote-TPU tunnel their ~50-70 ms dispatch floor swamps ms-scale
components (verify skill / TUNING.md), while the training step chains
naturally (state -> state), overlapping dispatch like production.

Variants (reference stage-4 loop ``train/4...py:202-413``):
  full       production step ("vjp" single-forward form)
  grad_form  the transliterated two-forward wiring (A/B of the round-5
             restructure; numerics-identical, see test_train.py)
  no_accu    skip accumulate+inpaint nets       -> their fwd+bwd share
  no_raster  tsf := prev_img                    -> SMPL-flow raster share
  no_vgg     recon := plain L1                  -> VGG19 fwd+bwd share
  no_img_d   0 image-D updates (was 3)          -> image-D share
  no_face_d  0 face-D updates (was 1)           -> face-D share
  no_gstep   D/FD updates + G forward only      -> G bwd+optimizer share
  remat_off  no jax.checkpoint (needs the batch to fit un-remat'd)

Usage: python bench_train_breakdown.py [variant ...]   (default: all)
Writes/updates BENCH_TRAIN_BREAKDOWN.json incrementally so variants can
be measured across runs (each new program costs a slow remote compile;
the persistent XLA cache amortizes re-runs).
Env: BENCH_TRAIN_BATCH (4), BENCH_ITERS (6), JAFPRO_REMAT (1).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

VARIANTS = {
    "full": {},
    "grad_form": {"form": "grad"},
    "no_accu": {"ablate": frozenset({"accu"})},
    "no_raster": {"ablate": frozenset({"raster"})},
    "no_vgg": {"ablate": frozenset({"vgg"})},
    "no_img_d": {"ablate": frozenset({"img_d"})},
    "no_face_d": {"ablate": frozenset({"face_d"})},
    "no_gstep": {"ablate": frozenset({"gstep"})},
    "remat_off": {"remat": False},
}


def build(remat: bool = True):
    import jax
    import jax.numpy as jnp

    from jafpro_tpu.config import Config, default_smpl_faces_path
    from jafpro_tpu.geometry.flow import SMPLFlowEngine
    from jafpro_tpu.pipeline import JAFProPipeline
    from jafpro_tpu.train.common import synthetic_batch, synthetic_quad_mesh

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "4"))
    cfg = Config(compute_dtype="bfloat16", maximum_ref_frames=4,
                 part_conv_impl=os.environ.get("BENCH_PART_CONV", "blocks8"),
                 remat_training=remat and os.environ.get(
                     "JAFPRO_REMAT", "1") == "1",
                 accu_ref_major=os.environ.get("JAFPRO_REF_MAJOR", "1") == "1")
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
        from jafpro_tpu.utils.meshproxy import smoothed_topology_vertices

        base = smoothed_topology_vertices(faces)
        for k in ("prev_verts", "tgt_verts"):
            b[k] = (base[None] + rng.normal(scale=0.01, size=(B, 1, 3))
                    ).astype(np.float32)
            b[k][..., 2] += 2.0
        engine = engine.adapt_to_clip(
            np.concatenate([b["prev_cam"], b["tgt_cam"]]),
            np.concatenate([b["prev_verts"], b["tgt_verts"]]),
            include_crop=os.environ.get("BENCH_TRAIN_CROP", "0") == "1")
    pipe = JAFProPipeline(cfg, flow_engine=engine)
    params = pipe.init_params(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    return pipe, params, batch, B


def time_variant(name: str, n: int) -> float:
    """One full-step program, chained by the state dependency; returns
    seconds/step.  (t(1+n) - t(1)) / n cancels the dispatch lead-in."""
    import jax

    from jafpro_tpu.train import TrainState
    from jafpro_tpu.train.stage34 import _make_gan_step, stage4_lrs

    spec = VARIANTS[name]
    pipe, params, batch, B = build(remat=spec.get("remat", True))
    step = jax.jit(_make_gan_step(
        pipe, with_propagation=True,
        gen_modules=("accu", "inpaint", "refine", "pro"),
        face_d_steps=1, img_d_steps=3, detach_face_g=True,
        form=spec.get("form", "vjp"),
        ablate=spec.get("ablate", frozenset())), donate_argnums=(0,))

    t_c0 = time.perf_counter()
    state = TrainState.create(params, stage4_lrs())
    state, m = step(state, batch)
    # full host fetch: block_until_ready does NOT reliably block through
    # the remote-TPU transport (verify skill; bench_train.py fetches too)
    np.asarray(m["loss"])
    compile_s = time.perf_counter() - t_c0

    def run(k, st):
        t0 = time.perf_counter()
        for _ in range(k):
            st, mm = step(st, batch)
        np.asarray(mm["loss"])
        return time.perf_counter() - t0, st

    t1, state = run(1, state)
    tn, state = run(1 + n, state)
    dt = max((tn - t1) / n, 1e-9)
    return dt, compile_s, B


def main():
    from jafpro_tpu.utils.xla_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    names = sys.argv[1:] or list(VARIANTS)
    n = int(os.environ.get("BENCH_ITERS", "6"))
    out_path = "BENCH_TRAIN_BREAKDOWN.json"
    rec = {}
    if os.path.exists(out_path):
        rec = json.load(open(out_path))
    for name in names:
        try:
            dt, compile_s, B = time_variant(name, n)
        except Exception as e:  # e.g. remat_off OOM — record and move on
            rec[name] = {"error": str(e)[:300]}
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)
            with open(out_path, "w") as f:
                json.dump(rec, f, indent=1)
            continue
        rec[name] = {"s_per_step": round(dt, 4),
                     "it_per_s": round(1.0 / dt, 4),
                     "compile_s": round(compile_s, 1), "batch": B}
        print(json.dumps({"variant": name, **rec[name]}), flush=True)
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)

    if "full" in rec:
        full = rec["full"]["s_per_step"]
        attr = {}
        for name, r in rec.items():
            if name in ("full", "grad_form", "remat_off"):
                continue
            attr[name.replace("no_", "")] = round(
                (full - r["s_per_step"]) * 1e3, 1)
        summary = {"metric": "stage4_step_attribution_ms",
                   "full_ms": round(full * 1e3, 1), "components": attr}
        if "grad_form" in rec:
            summary["vjp_vs_grad_speedup"] = round(
                rec["grad_form"]["s_per_step"] / full, 3)
        if "remat_off" in rec:
            summary["remat_recompute_ms"] = round(
                (full - rec["remat_off"]["s_per_step"]) * 1e3, 1)
        print(json.dumps(summary), flush=True)
        rec["_summary"] = summary
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
