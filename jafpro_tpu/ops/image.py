"""Pooling and per-pixel image ops.

``channel_norm`` is the TPU-native equivalent of the reference's
``channelnorm_cuda`` (``src/flownet2_pytorch/networks/channelnorm_package/``);
the pools match torch ``F.avg_pool2d/max_pool2d(kernel=3, stride=2, pad=1)``
as used by the CRN encoders (reference ``src/crn_model.py:134-139``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool_3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) avg pool k=3 s=2 p=1, count_include_pad=True (torch default)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return s / 9.0


def max_pool_3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) max pool k=3 s=2 p=1 (torch semantics)."""
    neg_inf = jnp.array(-jnp.inf, dtype=x.dtype)
    return jax.lax.reduce_window(
        x, neg_inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def channel_norm(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """Per-pixel L2 norm across the channel axis of (B,H,W,C)."""
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=keepdims))
