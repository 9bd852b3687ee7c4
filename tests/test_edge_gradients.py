"""Occlusion-boundary (coverage) gradients of the renderer — the TPU-native
equivalent of the reference's anti-aliased rasterizer backward
(``rasterize_cuda_kernel.cu:246+`` backward_pixel_map; silhouette-gradient
tests in ``third_party/neural_renderer/tests/test_rasterize_silhouettes.py``).

Validation strategy: central finite differences of the HARD (non-surrogate)
render under a one-pixel vertex translation are the ground truth the
first-order edge model discretizes, so autodiff-with-surrogate must match FD
to ~20% on clean edges, while plain autodiff (no surrogate) sees zero
coverage gradient.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jafpro_tpu.geometry.renderer import SMPLRenderer

S = 32


@pytest.fixture(scope="module")
def tri_renderer():
    faces = np.asarray([[0, 1, 2]], np.int32)
    return SMPLRenderer(faces=faces, image_size=S, tex_size=3)


# a triangle comfortably inside the frame, wound so it stays front-facing
# after project_to_view's y flip
VERTS = np.asarray(
    [[[-0.4, -0.5, 2.0], [-0.3, 0.6, 2.0], [0.5, -0.1, 2.0]]], np.float32)
CAM = np.asarray([[1.0, 0.0, 0.0]], np.float32)


_EX = jnp.asarray([1.0, 0.0, 0.0])


def _weighted_sil_loss(r, t, weight, edge_gradients):
    verts = jnp.asarray(VERTS) + t * _EX
    sil = r.render_silhouettes(jnp.asarray(CAM), verts,
                               edge_gradients=edge_gradients)
    return jnp.sum(sil * weight)


def test_silhouette_forward_unchanged(tri_renderer):
    r = tri_renderer
    hard = r.render_silhouettes(jnp.asarray(CAM), jnp.asarray(VERTS))
    soft = r.render_silhouettes(jnp.asarray(CAM), jnp.asarray(VERTS),
                                edge_gradients=True)
    np.testing.assert_array_equal(np.asarray(hard), np.asarray(soft))


def test_silhouette_translation_gradient_matches_fd(tri_renderer):
    r = tri_renderer
    rng = np.random.RandomState(0)
    # smooth positive weight image -> generic cotangent
    wy = np.linspace(0.0, 1.0, S, dtype=np.float32)
    weight = jnp.asarray(np.outer(wy, wy[::-1]) + 0.5
                         + 0.1 * rng.rand(S, S).astype(np.float32))

    grad = jax.grad(
        lambda t: _weighted_sil_loss(r, t, weight, True))(0.0)
    grad = float(grad)

    h = 2.0 / S  # one pixel in clip units
    lp = float(_weighted_sil_loss(r, +h, weight, False))
    lm = float(_weighted_sil_loss(r, -h, weight, False))
    fd = (lp - lm) / (2 * h)

    assert fd != 0.0
    assert np.sign(grad) == np.sign(fd)
    assert abs(grad - fd) < 0.25 * abs(fd)


def test_silhouette_gradient_zero_without_surrogate(tri_renderer):
    r = tri_renderer
    weight = jnp.ones((S, S), jnp.float32)
    grad = jax.grad(
        lambda t: _weighted_sil_loss(r, t, weight, False))(0.0)
    assert float(grad) == 0.0  # hard coverage: no vertex gradient at all


def test_render_rgb_edge_gradient_matches_fd(tri_renderer):
    r = tri_renderer
    tex = jnp.full((1, 1, 3, 3, 3, 3), 0.8, jnp.float32)
    # weight only the right half of the frame: translating the triangle +x
    # pushes covered pixels into the weighted region -> positive gradient
    weight = jnp.asarray(
        (np.arange(S)[None, :] >= S // 2).astype(np.float32))[None, ..., None]

    def loss(t, edge_gradients):
        verts = jnp.asarray(VERTS) + t * _EX
        img = r.render(jnp.asarray(CAM), verts, tex,
                       edge_gradients=edge_gradients)
        return jnp.sum(img * weight)

    grad = float(jax.grad(lambda t: loss(t, True))(0.0))
    h = 2.0 / S
    fd = (float(loss(+h, False)) - float(loss(-h, False))) / (2 * h)
    assert fd > 0.0
    assert np.sign(grad) == np.sign(fd)
    assert abs(grad - fd) < 0.3 * abs(fd)


def test_smpl_mesh_silhouette_descent():
    """End-to-end: gradient descent on vertices shrinks the silhouette-IoU
    loss against a shifted target — the reference's
    ``test_rasterize_silhouettes`` optimization scenario, on the real SMPL
    topology."""
    import os
    path = "/root/reference/smpl_faces.npy"
    if not os.path.exists(path):
        pytest.skip("SMPL topology asset not available")
    from jafpro_tpu.utils.meshproxy import smoothed_topology_vertices

    faces = np.load(path).astype(np.int32)
    r = SMPLRenderer(faces=faces, image_size=64, chunk=2048)
    base = smoothed_topology_vertices(faces)[None] + np.float32([0, 0, 2])
    cam = jnp.asarray(CAM)

    target = jax.lax.stop_gradient(
        r.render_silhouettes(cam, jnp.asarray(base)
                             + jnp.asarray([0.12, 0.0, 0.0])))

    def loss(offset):
        sil = r.render_silhouettes(cam, jnp.asarray(base) + offset,
                                   edge_gradients=True)
        return jnp.mean((sil - target) ** 2)

    off = jnp.zeros((3,))
    l0 = float(loss(off))
    g = jax.grad(loss)(off)
    assert float(g[0]) != 0.0
    off = off - 0.05 * g / (jnp.abs(g[0]) + 1e-9)
    assert float(loss(off)) < l0  # one step of descent reduces the loss
