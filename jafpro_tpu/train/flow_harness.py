"""Standalone FlowNet training harness (reference
``src/flownet2_pytorch/main.py``): train/validate a FlowNet variant with the
multi-scale EPE loss.  Real dataset loaders (Sintel / FlyingChairs /
ChairsSDHom layouts, ``main.py --training_dataset``) live in
``jafpro_tpu.data.flow_datasets``; synthetic warps are provided for smoke
testing without datasets.  ``compute_dtype="bfloat16"`` is the TPU
equivalent of the reference's ``--fp16`` flag, and
``save_flow_state`` / ``restore_flow_state`` cover ``--resume``
(``main.py:25-60, 121-131``).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jafpro_tpu.models.flownet import (
    FlowNetC, FlowNetSD, epe, multiscale_flow_loss)
from jafpro_tpu.ops.sampling import resample2d


def synthetic_flow_batch(
    rng: np.random.RandomState, batch: int = 2, size: int = 64
) -> Tuple[np.ndarray, np.ndarray]:
    """Random smooth flow applied to random images: (pairs (B,H,W,6),
    flow (B,H,W,2))."""
    img = rng.rand(batch, size, size, 3).astype(np.float32)
    # smooth flow: low-res noise upsampled
    low = rng.randn(batch, 4, 4, 2).astype(np.float32) * 2.0
    import jax.image

    flow = np.asarray(jax.image.resize(jnp.asarray(low),
                                       (batch, size, size, 2), "linear"))
    warped = np.asarray(resample2d(jnp.asarray(img), jnp.asarray(flow)))
    pairs = np.concatenate([warped, img], axis=-1)
    return pairs, flow


def make_flow_train_step(model_name: str = "sd", lr: float = 1e-4,
                         compute_dtype: str = "float32"):
    """Returns (init_fn, step_fn) for the multi-scale flow trainer.

    ``compute_dtype="bfloat16"`` runs the conv stack in bf16 (parameters and
    the loss stay float32) — the TPU-native counterpart of the reference's
    ``--fp16`` mixed-precision flag."""
    dtype = jnp.dtype(compute_dtype) if compute_dtype != "float32" else None
    model = (FlowNetSD(dtype=dtype) if model_name == "sd"
             else FlowNetC(dtype=dtype))
    tx = optax.adam(lr)

    def init_fn(rng, sample_pairs):
        if model_name == "sd":
            variables = model.init(rng, sample_pairs, train=True,
                                   train_mode=True)
        else:
            x1, x2 = sample_pairs[..., :3], sample_pairs[..., 3:]
            variables = model.init(rng, x1, x2, train=True, train_mode=True)
        params = variables["params"]
        state = {"params": params,
                 "batch_stats": variables.get("batch_stats", {}),
                 "opt": tx.init(params)}
        return state

    def loss_fn(params, batch_stats, pairs, target):
        variables = {"params": params, "batch_stats": batch_stats}
        if model_name == "sd":
            out, updates = model.apply(
                variables, pairs, train=True, train_mode=True,
                mutable=["batch_stats"])
        else:
            out, updates = model.apply(
                variables, pairs[..., :3], pairs[..., 3:], train=True,
                train_mode=True, mutable=["batch_stats"])
        loss, epev = multiscale_flow_loss(out, target)
        return loss, (epev, updates["batch_stats"])

    @jax.jit
    def step_fn(state, pairs, target):
        (loss, (epev, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state["params"], state["batch_stats"], pairs, target)
        updates, new_opt = tx.update(grads, state["opt"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return ({"params": new_params, "batch_stats": new_stats,
                 "opt": new_opt},
                {"loss": loss, "epe": epev})

    return init_fn, step_fn


def save_flow_state(ckpt_dir: str, step: int, state) -> str:
    """Persist the harness state (params + batch_stats + Adam moments) —
    the reference's periodic ``save_checkpoint`` (``main.py:121-131``)."""
    from jafpro_tpu.checkpoints import save_checkpoint

    return save_checkpoint(ckpt_dir, step, state)


def restore_flow_state(ckpt_dir: str, state):
    """Resume from the latest step if one exists (``main.py --resume``):
    returns (state, start_step)."""
    from jafpro_tpu.checkpoints import latest_step, restore_checkpoint

    step = latest_step(ckpt_dir)
    if step is None:
        return state, 0
    return restore_checkpoint(ckpt_dir, step, target=state), step
