"""Pallas rasterizer (interpreter mode on CPU) vs the XLA rasterizer."""

import numpy as np
import jax.numpy as jnp

from jafpro_tpu.geometry.rasterizer import rasterize_fim_wim
from jafpro_tpu.geometry.rasterizer_pallas import rasterize_fim_wim_pallas


def random_faces(n_faces, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-0.8, 0.8, size=(n_faces, 1, 3))
    offsets = rng.uniform(-0.35, 0.35, size=(n_faces, 3, 3))
    fv = (centers + offsets).astype(np.float32)
    fv[:, :, 2] = rng.uniform(1.0, 5.0, size=(n_faces, 3))
    return fv


def test_pallas_matches_xla():
    S = 32
    fv = jnp.asarray(random_faces(100, seed=2))[None]
    fim_x, wim_x = rasterize_fim_wim(fv, image_size=S, chunk=32)
    fim_p, wim_p = rasterize_fim_wim_pallas(
        fv, image_size=S, block=32, rows=8, interpret=True)
    cover = np.asarray(fim_x) >= 0
    assert cover.sum() > 100
    np.testing.assert_array_equal(np.asarray(fim_p), np.asarray(fim_x))
    np.testing.assert_allclose(np.asarray(wim_p), np.asarray(wim_x),
                               atol=1e-4)


def test_pallas_culling_consistency():
    """A scene concentrated in a narrow y-band must still rasterize
    correctly with block culling active."""
    S = 32
    fv = random_faces(64, seed=5)
    fv[:, :, 1] = fv[:, :, 1] * 0.1 + 0.5  # squeeze into one band
    fv = jnp.asarray(fv)[None]
    fim_x, wim_x = rasterize_fim_wim(fv, image_size=S, chunk=16)
    fim_p, wim_p = rasterize_fim_wim_pallas(
        fv, image_size=S, block=16, rows=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(fim_p), np.asarray(fim_x))
    np.testing.assert_allclose(np.asarray(wim_p), np.asarray(wim_x), atol=1e-4)
