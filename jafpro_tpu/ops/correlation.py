"""Cost-volume correlation (FlowNetC style).

TPU-native equivalent of the reference's ``correlation_cuda``
(``src/flownet2_pytorch/networks/correlation_package/correlation_cuda_kernel.cu``):
for each pixel and each displacement in a (2*max_disp/stride2+1)^2 window, the
channel-mean dot product between feature map 1 and the shifted feature map 2.

Implemented as a ``lax.scan`` over displacements of fused
multiply-reduce ops on zero-padded inputs — XLA keeps each step as one fused
elementwise+reduction kernel; no gather/scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def correlation(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 20,
    stride2: int = 2,
) -> jnp.ndarray:
    """Args: f1, f2: (B, H, W, C).  Returns (B, H, W, D) with
    D = (2*(max_displacement//stride2)+1)**2, displacement-major ordering
    (dy outer, dx inner) matching the CUDA kernel's output layout.
    """
    B, H, W, C = f1.shape
    md, s2 = max_displacement, stride2
    n = 2 * (md // s2) + 1
    offsets = np.arange(-md, md + 1, s2, dtype=np.int32)
    dyx = np.stack(
        [np.repeat(offsets, n), np.tile(offsets, n)], axis=1
    )  # (D, 2) in (dy, dx), dy-major

    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))

    def step(carry, d):
        dy, dx = d[0], d[1]
        win = jax.lax.dynamic_slice(
            f2p, (0, md + dy, md + dx, 0), (B, H, W, C)
        )
        out = jnp.mean(f1 * win, axis=-1)
        return carry, out

    _, maps = jax.lax.scan(step, None, jnp.asarray(dyx))
    # (D, B, H, W) -> (B, H, W, D)
    return jnp.transpose(maps, (1, 2, 3, 0))
