"""Stage 1: texture accumulation alone, masked L1.

Reference ``train/1.text_accu_LSTM.py``: Adam 1e-4 with MultiStepLR
[100k, 150k] x0.3, loss = sum over num_target targets of L1 over
(union of reference masks) AND (target mask) (``src/networks.py:1614-1639``),
with the 1..4-reference curriculum applied by zeroing masks.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from jafpro_tpu.losses import l1
from jafpro_tpu.pipeline import JAFProPipeline
from jafpro_tpu.train.common import TrainState, multistep_lr, normalize_batch


def stage1_lrs():
    return {"accu": multistep_lr(1e-4)}


def make_stage1_step(pipe: JAFProPipeline):
    def loss_fn(accu_params, batch):
        params = {"accu": accu_params}
        out_parts = pipe.accu.apply(
            params["accu"], batch["src_parts"], batch["ref_mask"])
        # union of (curriculum-masked) reference visibility, per part
        masked = batch["src_mask_parts"] * \
            batch["ref_mask"][:, :, None, None, None]
        union = jnp.max(masked, axis=1)  # (B, P, p, p)
        total = 0.0
        T = batch["tgt_mask_parts"].shape[1]
        for t in range(T):
            area = (union * batch["tgt_mask_parts"][:, t])[..., None]
            total = total + l1(area * out_parts,
                               area * batch["tgt_parts"][:, t])
        return total

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        batch = normalize_batch(batch)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params["accu"], batch)
        state = state.apply_gradients({"accu": grads})
        return state, {"loss": loss}

    return step
