"""A/B time the Pallas VMEM-resident rasterizer vs the banded-XLA
production kernel on the real TPU (VERDICT round-2 item 4).

Workload matches bench.py's production geometry: the real 13776-face SMPL
topology, body-proportioned smoothed embedding, 256px, a 30-frame clip
batch.  Reports per-frame kernel time (median of repeats after warmup) and
first-compile wall time for each arm.

Usage:  python tools/time_raster_ab.py [--frames 30] [--repeats 5]
Writes RASTER_AB.json in the cwd.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--out", default="RASTER_AB.json")
    ap.add_argument("--arms", default="all",
                    help="comma-separated arm-name substrings to run "
                         "(e.g. 'xla' to skip the pallas arms, whose Mosaic "
                         "remote compile has hung >45 min on this runtime)")
    a = ap.parse_args()

    import jax

    from jafpro_tpu.config import default_smpl_faces_path
    from jafpro_tpu.geometry.flow import SMPLFlowEngine
    from jafpro_tpu.train.common import synthetic_quad_mesh
    from jafpro_tpu.utils.meshproxy import smoothed_topology_vertices

    path = default_smpl_faces_path()
    if path is not None:
        faces = np.load(path).astype(np.int32)
    else:
        _, faces = synthetic_quad_mesh(64)
    rng = np.random.RandomState(0)
    base = smoothed_topology_vertices(faces)
    T = a.frames
    verts = (base[None]
             + rng.normal(scale=0.01, size=(T, 1, 3))).astype(np.float32)
    verts[..., 2] += 2.0
    cams = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (T, 1))

    S = a.image_size
    base_eng = SMPLFlowEngine.create(
        faces=faces, image_size=S, band_rows=16, depth_mode="fused")

    arms = {}
    # production: banded XLA with per-clip measured-exact capacity (+ the
    # round-3 column-crop window, which adapt_to_clip now selects)
    arms["xla_banded_prod"] = base_eng.adapt_to_clip(cams, verts)
    # same without the column crop (the round-2 production config)
    arms["xla_banded_nocrop"] = dataclasses.replace(
        arms["xla_banded_prod"], crop_cols=0)
    # dense XLA (band_rows=0)
    arms["xla_dense"] = dataclasses.replace(base_eng, band_rows=0)
    # pallas configs (block is min(chunk, 256) on the engine path; vary via
    # chunk so the engine's own call site is what gets timed)
    for blk in (256, 512, 1024):
        arms[f"pallas_b{blk}"] = dataclasses.replace(
            base_eng, backend="pallas", chunk=blk)

    if a.arms != "all":
        keys = [k.strip() for k in a.arms.split(",") if k.strip()]
        arms = {n: e for n, e in arms.items()
                if any(k in n for k in keys)}

    record = {"frames": T, "image_size": S, "n_faces": int(faces.shape[0]),
              "device": str(jax.devices()[0]), "arms": {}}

    cams_j, verts_j = jax.numpy.asarray(cams), jax.numpy.asarray(verts)

    for name, eng in arms.items():
        def run(e=eng):
            _, fim, wim = e.render_fim_wim(cams_j, verts_j)
            return fim, wim

        fn = jax.jit(run)
        t0 = time.perf_counter()
        try:
            out = jax.block_until_ready(fn())
        except Exception as exc:  # noqa: BLE001 — record the failure arm
            record["arms"][name] = {"error": f"{type(exc).__name__}: {exc}"[:500]}
            print(f"{name}: FAILED {type(exc).__name__}", flush=True)
            continue
        compile_s = time.perf_counter() - t0
        fg_px = int((np.asarray(out[0]) >= 0).sum()) // T

        samples = []
        for _ in range(a.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            samples.append(time.perf_counter() - t0)
        samples.sort()
        med = samples[len(samples) // 2]
        record["arms"][name] = {
            "ms_per_frame": round(1000 * med / T, 3),
            "compile_s": round(compile_s, 1),
            "fg_px_per_frame": fg_px,
            "config": {"band_rows": eng.band_rows,
                       "band_capacity": eng.band_capacity,
                       "bin_impl": eng.bin_impl, "crop_cols": eng.crop_cols,
                       "backend": eng.backend, "chunk": eng.chunk},
            "samples_ms_per_frame": [round(1000 * s / T, 3) for s in samples],
        }
        print(f"{name}: {record['arms'][name]['ms_per_frame']} ms/frame "
              f"(compile {compile_s:.0f}s, fg_px {fg_px})", flush=True)
        # incremental dump: a hung/killed later arm (Mosaic remote compile
        # has exceeded 45 min before) must not lose the finished arms
        with open(a.out, "w") as f:
            json.dump(record, f, indent=1)

    # cross-arm correctness: every arm must produce the same fim
    ref = None
    for name, eng in arms.items():
        if "error" in record["arms"].get(name, {}):
            continue
        _, fim, _ = jax.jit(lambda e=eng: e.render_fim_wim(
            cams_j[:2], verts_j[:2]))()
        fim = np.asarray(fim)
        if ref is None:
            ref = fim
        else:
            agree = float((fim == ref).mean())
            record["arms"][name]["fim_agree_vs_first"] = round(agree, 6)

    with open(a.out, "w") as f:
        json.dump(record, f, indent=1)
    print("wrote", a.out)


if __name__ == "__main__":
    main()
