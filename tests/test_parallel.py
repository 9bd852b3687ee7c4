"""Mesh/sharding helpers on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from jafpro_tpu.parallel import (
    create_mesh, data_parallel_jit, replicate, shard_batch)


def test_create_mesh_and_shard_batch():
    mesh = create_mesh(8, ("data",))
    assert mesh.devices.shape == (8,)
    batch = {"x": np.arange(16 * 4, dtype=np.float32).reshape(16, 4),
             "y": np.ones((16,), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sharded["x"]), batch["x"])


def test_data_parallel_jit_grad_sync():
    """Per-device shards must produce the same (pmean'd by XLA) update."""
    mesh = create_mesh(8, ("data",))

    def step(state, batch):
        def loss(w):
            return jnp.mean((batch["x"] @ w - batch["y"]) ** 2)

        g = jax.grad(loss)(state["w"])
        return {"w": state["w"] - 0.1 * g}, jnp.mean(batch["x"])

    rng = np.random.RandomState(0)
    batch = {"x": rng.randn(16, 4).astype(np.float32),
             "y": rng.randn(16, 1).astype(np.float32)}
    state = {"w": jnp.zeros((4, 1))}

    fn = data_parallel_jit(step, mesh, donate_state=False)
    new_state, aux = fn(state, batch)

    # single-device result must match exactly (global loss gradient)
    expect = step({"w": jnp.zeros((4, 1))},
                  {k: jnp.asarray(v) for k, v in batch.items()})[0]
    np.testing.assert_allclose(np.asarray(new_state["w"]),
                               np.asarray(expect["w"]), atol=1e-6)


def test_replicate():
    mesh = create_mesh(4, ("data",))
    tree = {"a": jnp.arange(6.0).reshape(2, 3)}
    rep = replicate(mesh, tree)
    assert rep["a"].sharding.is_fully_replicated
