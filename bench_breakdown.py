"""Per-component frame-time attribution for the flagship inference pipeline.

Whole-program A/B through ``VideoGenerator(ablate=...)``: each variant
replaces ONE component with a cheap shape-preserving stand-in (see
``infer.py``); (t_full - t_ablated) attributes that component's share of
frame time.  Only whole-clip chained timings are valid through the remote
tunnel (TUNING.md), so every variant is timed exactly like bench.py.

Usage: python bench_breakdown.py [component ...]   (default: all)
Prints one JSON line per variant plus a final attribution summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

COMPONENTS = ("none", "prep", "warp", "refine", "raster", "flow", "pro",
              "accu", "bg", "lutbuild", "srcraster")


def time_variant(pipe, params, clip, T, ablate, warp_cols=0):
    import jax
    import jax.numpy as jnp

    from jafpro_tpu.infer import VideoGenerator

    # honor the same mode env knobs as bench.main so attributions are
    # always measured at the configuration under study
    if "BENCH_WARP_CROP" in os.environ:
        warp_cols = int(os.environ["BENCH_WARP_CROP"])
    gen = VideoGenerator(
        pipe, ablate=frozenset(ablate),
        frame_batch=int(os.environ.get("BENCH_FRAME_BATCH", "1")),
        raster_mode=os.environ.get("BENCH_RASTER_MODE", "scan"),
        flow_mode=os.environ.get("BENCH_FLOW_MODE", "scan"),
        warp_mode=os.environ.get("BENCH_WARP_MODE", "lut"),
        warp_crop_cols=warp_cols,
        crop_flow=bool(int(os.environ.get("BENCH_FLOW_CROP", "1"))))
    chain = jax.jit(lambda c, final: dict(
        c, bg_incomplete=c["bg_incomplete"] + 1e-12 * jnp.mean(final)))

    out = gen(params, clip)
    clip2 = chain(clip, out["final"])
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

    n_iters = int(os.environ.get("BENCH_ITERS", "8"))
    t1 = run(1)
    tn = run(1 + n_iters)
    return max((tn - t1) / n_iters, 1e-9)


def main(argv):
    import bench

    names = argv or list(COMPONENTS)
    pipe, params, clip, T, warp_cols = bench.setup()
    results = {}
    for name in names:
        ablate = () if name == "none" else (name,)
        t0 = time.perf_counter()
        dt = time_variant(pipe, params, clip, T, ablate, warp_cols)
        results[name] = dt
        print(json.dumps({
            "variant": name, "clip_seconds": round(dt, 4),
            "frames_per_sec": round(T / dt, 2),
            "wall_incl_compile_s": round(time.perf_counter() - t0, 1),
        }), flush=True)

    if "none" in results:
        full = results["none"]
        summary = {"full_ms_per_frame": round(full / T * 1e3, 3)}
        for name, dt in results.items():
            if name == "none":
                continue
            summary[f"{name}_ms_per_frame"] = round((full - dt) / T * 1e3, 3)
            summary[f"{name}_share"] = round(1.0 - dt / full, 3)
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
