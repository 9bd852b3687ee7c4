"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(``train/4.convLSTM_flowpro_interval.py:123-162``).  The TPU-native
equivalent is a 1-D ``jax.sharding.Mesh`` over the batch axis: parameters
replicated, batches sharded on ICI, gradients averaged by XLA's collectives
inserted automatically under jit — nothing bespoke to build (SURVEY.md §2.7).

A 2-D (data, model) mesh is exposed for scaling beyond parity: the 24-part
axis of the texture networks shards naturally over 'model'.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Shard every array leaf along its leading (batch) dimension."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (parameters, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_jit(fn, mesh: Mesh, donate_state: bool = True):
    """jit ``fn(state, batch) -> (state, aux)`` with state replicated and
    batch sharded over the mesh's 'data' axis."""
    repl = NamedSharding(mesh, P())

    def batch_sharding(x):
        return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))

    def wrapper(state, batch):
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, batch_sharding(x)), batch
        )
        state = replicate(mesh, state)
        return jitted(state, batch)

    jitted = jax.jit(fn, donate_argnums=(0,) if donate_state else ())
    return wrapper


def initialize_distributed(**kwargs) -> None:
    """Multi-host setup: ``jax.distributed.initialize`` (ICI within a slice,
    DCN across slices — the runtime provides the collectives; SURVEY §2.7).
    No-op if already initialized or single-process."""
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process environment
