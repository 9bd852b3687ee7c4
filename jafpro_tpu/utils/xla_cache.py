"""Persistent XLA compilation cache.

The production rasterizer's column-cropped z-buffer (TUNING.md round 3)
compiles ~15x slower than the uncropped form (minutes through the remote
tunnel) — a cost worth paying per *machine*, not per process.  JAX ships a
persistent on-disk compilation cache; this helper turns it on with a
stable default location so every CLI/bench process after the first reuses
the compiled executables (per width-bucket, per config).

The reference has no equivalent subsystem (PyTorch eager + cudnn.benchmark
autotuning, ``train/4.convLSTM_flowpro_interval.py:109``); on XLA the
compile-once cost model makes this the idiomatic replacement.

Opt out with ``JAFPRO_XLA_CACHE=0``; override the directory with
``JAFPRO_XLA_CACHE=<dir>``.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache() -> str | None:
    """Point JAX's compilation cache at a per-user on-disk directory.

    Returns the cache dir, or None when disabled/unavailable.  Safe to call
    before or after backend initialization and more than once.
    """
    spec = os.environ.get("JAFPRO_XLA_CACHE", "")
    if spec == "0":
        return None
    cache_dir = spec or os.path.join(
        os.path.expanduser("~"), ".cache", "jafpro_tpu", "xla")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min compile time is 1s; keep tiny programs out of the
        # cache but catch every multi-second rasterizer/step compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover — old jax or read-only home
        return None
    return cache_dir
