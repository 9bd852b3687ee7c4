"""HMR regressor: shapes, iterative refinement, SMPL detail split."""

import numpy as np
import jax
import jax.numpy as jnp

from jafpro_tpu.geometry.smpl import SMPLModel
from jafpro_tpu.models.hmr import HumanModelRecovery, ThetaRegressor, get_details


def test_theta_regressor_iterates():
    m = ThetaRegressor(theta_dim=85, iterations=3)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 2048))
    params = m.init(jax.random.PRNGKey(1), feats)
    theta = m.apply(params, feats)
    assert theta.shape == (2, 85)
    # different features give different thetas (it actually regresses)
    theta2 = m.apply(params, feats * 2.0)
    assert not np.allclose(np.asarray(theta), np.asarray(theta2))


def test_hmr_full_and_details():
    m = HumanModelRecovery()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    variables = m.init(jax.random.PRNGKey(1), x)
    theta = m.apply(variables, x)
    assert theta.shape == (1, 85)

    smpl = SMPLModel.synthetic(num_verts=32)
    d = get_details(smpl, theta)
    assert d["verts"].shape == (1, 32, 3)
    assert d["j2d"].shape == (1, 19, 2)
    assert d["cam"].shape == (1, 3) and d["pose"].shape == (1, 72)
