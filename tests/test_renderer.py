"""UV assets and the full textured renderer."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from jafpro_tpu.geometry.renderer import (
    SMPLRenderer, create_coords, encode_fim, points_to_sampler)
from jafpro_tpu.geometry.uvmap import (
    compute_barycenter, create_mapping, create_uvsampler, default_asset,
    get_f2vts, load_obj, save_obj)
from jafpro_tpu.train.common import synthetic_quad_mesh

MAPPER = default_asset("mapper.txt")


def make_renderer(image_size=32):
    verts, faces = synthetic_quad_mesh(6)
    return SMPLRenderer(faces=faces, image_size=image_size, chunk=16), verts


def test_obj_roundtrip(tmp_path):
    verts, faces = synthetic_quad_mesh(4)
    p = str(tmp_path / "mesh.obj")
    save_obj(p, verts, faces)
    info = load_obj(p)
    np.testing.assert_allclose(info["verts"], verts, atol=1e-5)
    np.testing.assert_array_equal(info["faces"], faces)


@pytest.mark.skipif(MAPPER is None, reason="mapper.txt asset unavailable")
def test_uv_assets_from_reference():
    f2vts = get_f2vts(MAPPER)
    assert f2vts.shape == (13776, 3, 3)
    assert f2vts[..., :2].min() >= 0.0 and f2vts[..., :2].max() <= 1.0
    bc = compute_barycenter(f2vts)
    assert bc.shape == (13776, 3)

    sampler = create_uvsampler(MAPPER, tex_size=3)
    assert sampler.shape == (13776, 9, 2)
    assert sampler.min() >= -1.0 and sampler.max() <= 1.0

    for name, dim in (("uv", 2), ("seg", 1), ("uv_seg", 3), ("ids", 1)):
        m = create_mapping(name, MAPPER)
        assert m.shape == (13777, dim), name


def test_encode_fim():
    fim = jnp.asarray([[[0, -1], [1, 0]]], jnp.int32)
    map_fn = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [9.0, 9.0]])  # last = bg
    enc = encode_fim(fim, map_fn)
    np.testing.assert_allclose(np.asarray(enc[0, 0, 1]), [9.0, 9.0])
    np.testing.assert_allclose(np.asarray(enc[0, 1, 0]), [3.0, 4.0])


def test_silhouette_and_depth():
    r, verts = make_renderer()
    cam = jnp.asarray([[1.0, 0.0, 0.0]])
    v = jnp.asarray(verts)[None]
    sil = np.asarray(r.render_silhouettes(cam, v))
    assert sil.shape == (1, 32, 32)
    assert 50 < sil.sum() < 32 * 32
    depth = np.asarray(r.render_depth(cam, v))
    body = sil[0] > 0
    # plane at z=2, eye at z=-2.732 -> depth ~ 4.73 inside the silhouette
    np.testing.assert_allclose(depth[0][body], 4.732, atol=0.01)
    assert (depth[0][~body] == 0).all()


def test_textured_render_flat_color():
    r, verts = make_renderer()
    cam = jnp.asarray([[1.0, 0.0, 0.0]])
    v = jnp.asarray(verts)[None]
    F = r.faces.shape[0]
    color = jnp.asarray([0.2, 0.5, 0.8])
    tex = jnp.broadcast_to(color, (1, F, 3, 3, 3, 3))
    img = np.asarray(r.render(cam, v, tex))
    sil = np.asarray(r.render_silhouettes(cam, v))[0] > 0
    np.testing.assert_allclose(img[0][sil],
                               np.tile([0.2, 0.5, 0.8], (sil.sum(), 1)),
                               atol=1e-4)
    assert (img[0][~sil] == 0).all()


def test_extract_tex_shapes():
    r, verts = make_renderer()
    cam = jnp.asarray([[1.0, 0.0, 0.0]])
    v = jnp.asarray(verts)[None]
    img = jnp.ones((1, 32, 32, 3)) * 0.7
    tex = r.extract_tex_from_image(img, cam, v)
    F = r.faces.shape[0]
    assert tex.shape == (1, F, 3, 3, 3, 3)
    # sampling a constant image yields the constant everywhere sampled inside
    np.testing.assert_allclose(np.asarray(tex).max(), 0.7, atol=1e-5)


def test_render_with_lighting():
    r, verts = make_renderer()
    r.light_intensity_ambient = 0.5
    cam = jnp.asarray([[1.0, 0.0, 0.0]])
    v = jnp.asarray(verts)[None]
    F = r.faces.shape[0]
    tex = jnp.ones((1, F, 3, 3, 3, 3))
    img = np.asarray(r.render(cam, v, tex))
    sil = np.asarray(r.render_silhouettes(cam, v))[0] > 0
    np.testing.assert_allclose(img[0][sil], 0.5, atol=1e-4)
