"""Stage 2: accumulation + inpainting, target-visible L1.

Reference ``train/2.text_inpaint_convLSTM.py``: loads stage-1 accumulation
weights, adds the global-bottleneck inpainter; loss = sum over targets and
parts of per-part L1 between (inpainted * target mask) and
(target * target mask); two Adams at 1e-4.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from jafpro_tpu.losses import l1
from jafpro_tpu.pipeline import JAFProPipeline
from jafpro_tpu.train.common import TrainState, normalize_batch


def stage2_lrs():
    return {"accu": 1e-4, "inpaint": 1e-4}


def make_stage2_step(pipe: JAFProPipeline, num_target: int = 2):
    """Stage-2 step.  ``num_target``: targets consumed per sample —  the
    reference trains stage 2 on 2 targets (``train/2.text_inpaint_convLSTM
    .py:62``) while the textonly records store the stage-1 schedule's 3
    (``options.py:23``); the step slices, so one packed shard format
    serves both stages."""
    def loss_fn(train_params, batch):
        inpainted, _ = pipe.prepare_textures(
            train_params, batch["src_parts"], batch["ref_mask"],
            batch["src_mask_parts"])
        total = 0.0
        T = min(num_target, batch["tgt_mask_parts"].shape[1])
        for t in range(T):
            m = batch["tgt_mask_parts"][:, t][..., None]
            # reference sums 24 per-part L1 means; parts are equal-sized so
            # that equals num_parts * atlas mean
            P = inpainted.shape[1]
            total = total + P * l1(inpainted * m, batch["tgt_parts"][:, t] * m)
        return total

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        batch = normalize_batch(batch)
        train_params = {k: state.params[k] for k in ("accu", "inpaint")}
        loss, grads = jax.value_and_grad(loss_fn)(train_params, batch)
        state = state.apply_gradients(grads)
        return state, {"loss": loss}

    return step
