"""FlowNet standalone trainer: loss decreases on a fixed synthetic batch."""

import numpy as np
import jax

from jafpro_tpu.train.flow_harness import (
    make_flow_train_step, synthetic_flow_batch)


def test_flow_harness_sd_loss_decreases():
    rng = np.random.RandomState(0)
    pairs, flow = synthetic_flow_batch(rng, batch=1, size=64)
    init_fn, step_fn = make_flow_train_step("sd", lr=3e-4)
    state = init_fn(jax.random.PRNGKey(0), pairs)
    losses = []
    for _ in range(8):
        state, m = step_fn(state, pairs, flow)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    # Adam warmup + train-mode BN make the first steps noisy; require net
    # improvement by the end
    assert losses[-1] < max(losses[:2])
