"""Geometry tests: rasterizer vs an independent numpy z-buffer oracle,
SMPL LBS sanity, and the flow engine's self-consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jafpro_tpu.geometry import (
    SMPLModel,
    SMPLFlowEngine,
    rasterize_fim_wim,
    cal_bc_transform,
    orthographic_proj_withz_idrot,
    look_at,
    default_eye,
)
from jafpro_tpu.geometry.projection import project_to_view, vertices_to_faces

RNG = np.random.RandomState(42)


def numpy_raster_oracle(fv, S, near, far):
    """Brute-force per-pixel z-buffer implementing the NMR semantics
    (pixel-center coords, backface cull, half-plane tests, clamped
    barycentric weights from the pixel-space inverse matrix,
    perspective-correct depth, first-face-wins)."""
    F = fv.shape[0]
    fim = -np.ones((S, S), np.int32)
    wim = np.zeros((S, S, 3), np.float64)
    depth = np.full((S, S), far, np.float64)
    p = 0.5 * (fv[:, :, :2] * S + S - 1)
    for yi in range(S):
        yp = (2.0 * yi + 1 - S) / S
        for xi in range(S):
            xp = (2.0 * xi + 1 - S) / S
            for fn in range(F):
                x, y, z = fv[fn, :, 0], fv[fn, :, 1], fv[fn, :, 2]
                if (y[2] - y[0]) * (x[1] - x[0]) < (y[1] - y[0]) * (x[2] - x[0]):
                    continue
                if ((yp - y[0]) * (x[1] - x[0]) < (xp - x[0]) * (y[1] - y[0]) or
                        (yp - y[1]) * (x[2] - x[1]) < (xp - x[1]) * (y[2] - y[1]) or
                        (yp - y[2]) * (x[0] - x[2]) < (xp - x[2]) * (y[0] - y[2])):
                    continue
                q = p[fn]
                inv = np.array([
                    [q[1, 1] - q[2, 1], q[2, 0] - q[1, 0],
                     q[1, 0] * q[2, 1] - q[2, 0] * q[1, 1]],
                    [q[2, 1] - q[0, 1], q[0, 0] - q[2, 0],
                     q[2, 0] * q[0, 1] - q[0, 0] * q[2, 1]],
                    [q[0, 1] - q[1, 1], q[1, 0] - q[0, 0],
                     q[0, 0] * q[1, 1] - q[1, 0] * q[0, 1]]])
                den = (q[2, 0] * (q[0, 1] - q[1, 1]) + q[0, 0] * (q[1, 1] - q[2, 1])
                       + q[1, 0] * (q[2, 1] - q[0, 1]))
                inv = inv / den
                w = inv @ np.array([xi, yi, 1.0])
                w = np.clip(w, 0.0, 1.0)
                w = w / w.sum()
                zp = 1.0 / (w[0] / z[0] + w[1] / z[1] + w[2] / z[2])
                if zp <= near or zp >= far:
                    continue
                if zp < depth[yi, xi]:
                    depth[yi, xi] = zp
                    fim[yi, xi] = fn
                    wim[yi, xi] = w
    return fim, wim


def random_faces(n_faces, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-0.8, 0.8, size=(n_faces, 1, 3))
    offsets = rng.uniform(-0.35, 0.35, size=(n_faces, 3, 3))
    fv = (centers + offsets).astype(np.float32)
    fv[:, :, 2] = rng.uniform(1.0, 5.0, size=(n_faces, 3))
    return fv


@pytest.mark.parametrize("chunk,band_rows,band_capacity", [
    (7, 0, 0),        # dense path
    (64, 16, 4096),   # banded (default capacity)
    (16, 8, 64),      # banded, capacity binds only per-band (<= 50 members)
])
def test_rasterizer_matches_oracle(chunk, band_rows, band_capacity):
    S, near, far = 32, 0.1, 25.0
    fv = random_faces(50, seed=1)
    fim, wim = rasterize_fim_wim(jnp.asarray(fv)[None], image_size=S,
                                 near=near, far=far, chunk=chunk, flip_y=False,
                                 band_rows=band_rows,
                                 band_capacity=band_capacity)
    fim, wim = np.asarray(fim[0]), np.asarray(wim[0])
    ref_fim, ref_wim = numpy_raster_oracle(fv.astype(np.float64), S, near, far)
    cover = ref_fim >= 0
    assert cover.sum() > 50  # the scene actually hits pixels
    np.testing.assert_array_equal(fim, ref_fim)
    np.testing.assert_allclose(wim[cover], ref_wim[cover], atol=1e-4)
    assert (wim[~cover] == 0).all()


@pytest.mark.parametrize("band_rows", [0, 8])
def test_rasterizer_affine_depth_matches_oracle(band_rows):
    """depth_mode='affine' (per-face affine 1/zp, no clamps/divide in the
    scan) must agree with the float64 clamped-form oracle away from
    z-fighting — which random scenes don't produce, so agreement here is
    exact, like the 'exact' mode's test."""
    S, near, far = 32, 0.1, 25.0
    fv = random_faces(50, seed=1)
    fim, wim = rasterize_fim_wim(
        jnp.asarray(fv)[None], image_size=S, near=near, far=far, chunk=16,
        flip_y=False, band_rows=band_rows, band_capacity=4096,
        depth_mode="affine")
    fim, wim = np.asarray(fim[0]), np.asarray(wim[0])
    ref_fim, ref_wim = numpy_raster_oracle(fv.astype(np.float64), S, near, far)
    cover = ref_fim >= 0
    np.testing.assert_array_equal(fim, ref_fim)
    np.testing.assert_allclose(wim[cover], ref_wim[cover], atol=1e-4)
    assert (wim[~cover] == 0).all()


@pytest.mark.parametrize("band_rows,chunk", [(0, 7), (16, 64), (8, 16)])
def test_rasterizer_fused_matches_oracle(band_rows, chunk):
    """depth_mode='fused' (affine 1/zp + precomputed affine edge functions
    + packed uint32 (quantized-depth | reversed-id) single-max race) must
    agree with the float64 clamped-form oracle away from edge-marginal
    rounding and sub-quantization z-fights — which random scenes don't
    produce, so agreement here is exact, like the other modes' tests."""
    S, near, far = 32, 0.1, 25.0
    fv = random_faces(50, seed=1)
    fim, wim, dim = rasterize_fim_wim(
        jnp.asarray(fv)[None], image_size=S, near=near, far=far, chunk=chunk,
        flip_y=False, band_rows=band_rows, band_capacity=4096,
        depth_mode="fused", return_depth=True)
    fim, wim = np.asarray(fim[0]), np.asarray(wim[0])
    ref_fim, ref_wim = numpy_raster_oracle(fv.astype(np.float64), S, near, far)
    cover = ref_fim >= 0
    np.testing.assert_array_equal(fim, ref_fim)
    np.testing.assert_allclose(wim[cover], ref_wim[cover], atol=1e-4)
    assert (wim[~cover] == 0).all()
    # the emitted depth is recomputed UNquantized from the winner's affine
    # coefficients — compare against the exact mode's depth map
    _, _, dim_exact = rasterize_fim_wim(
        jnp.asarray(fv)[None], image_size=S, near=near, far=far, chunk=chunk,
        flip_y=False, band_rows=band_rows, band_capacity=4096,
        depth_mode="exact", return_depth=True)
    np.testing.assert_allclose(np.asarray(dim[0]), np.asarray(dim_exact[0]),
                               rtol=1e-4, atol=1e-5)


def test_rasterizer_fused_tie_picks_lowest_id():
    """Two faces whose 1/zp differ by less than the 18-bit quantization
    step tie in the packed race; the CUDA rule (first/lowest face id wins)
    must hold.  The nearer face gets the HIGHER id, so a min-id tie-break
    is observable (the quantization step at 1/near=10 is ~4e-5; the faces
    are offset by 1e-7 in 1/z)."""
    S, near, far = 16, 0.1, 25.0
    base = np.array([[[-0.9, -0.9, 2.0], [0.9, -0.9, 2.0], [0.0, 0.9, 2.0]]],
                    np.float32)
    nearer = base.copy()
    nearer[..., 2] = 1.0 / (1.0 / 2.0 + 1e-7)  # 1/z offset ~1e-7 << 4e-5
    fv = np.concatenate([base, nearer], axis=0)  # id 0 = farther (barely)
    fim, _ = rasterize_fim_wim(
        jnp.asarray(fv)[None], image_size=S, near=near, far=far, chunk=4,
        flip_y=False, depth_mode="fused")
    fim = np.asarray(fim[0])
    assert (fim[fim >= 0] == 0).all()  # lowest id wins the tie
    # exact mode resolves the same geometry to the truly nearer face
    fim_exact, _ = rasterize_fim_wim(
        jnp.asarray(fv)[None], image_size=S, near=near, far=far, chunk=4,
        flip_y=False, depth_mode="exact")
    fim_exact = np.asarray(fim_exact[0])
    assert (fim_exact[fim_exact >= 0] == 1).all()


def test_band_occupancy_predicts_exactness():
    from jafpro_tpu.geometry.rasterizer import band_occupancy

    S = 32
    fv = random_faces(50, seed=7)[None]
    occ = band_occupancy(fv, image_size=S, band_rows=8)
    assert occ.shape == (1, 4)
    # brute check of one band's count
    y = fv[0, :, :, 1]
    front = (y[:, 2] - fv[0, :, :, 1][:, 0]) * (
        fv[0, :, :, 0][:, 1] - fv[0, :, :, 0][:, 0]) >= (
        (y[:, 1] - y[:, 0]) * (fv[0, :, :, 0][:, 2] - fv[0, :, :, 0][:, 0]))
    lo, hi = (2 * 0 + 1 - S) / S, (2 * 7 + 1 - S) / S
    expect = int(np.sum(front & (y.max(1) >= lo) & (y.min(1) <= hi)))
    assert int(occ[0, 0]) == expect

    # capacity >= max occupancy -> banded == dense, bitwise
    cap = int(occ.max())
    dense = rasterize_fim_wim(jnp.asarray(fv), image_size=S, chunk=16,
                              band_rows=0, flip_y=False)
    banded = rasterize_fim_wim(jnp.asarray(fv), image_size=S, chunk=16,
                               band_rows=8, band_capacity=cap, flip_y=False)
    np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(banded[0]))


@pytest.mark.parametrize("depth_mode,band_rows,cap", [
    ("exact", 8, 4096),   # plenty of capacity
    ("fused", 8, 4096),
    ("fused", 16, 4096),
    ("exact", 8, 16),     # capacity binds: truncation rule must also match
])
def test_rasterizer_copysort_matches_sort(depth_mode, band_rows, cap):
    """bin_impl='copysort' (one composite-key sort over per-face band
    copies) builds bitwise-identical band tables to the per-band row sort
    whenever bin_span admits every face's band range — including the
    K-lowest-ids truncation rule when capacity binds."""
    from jafpro_tpu.geometry.rasterizer import select_bin_span

    S, near, far = 32, 0.1, 25.0
    for seed in (1, 5, 9):
        fv = random_faces(60, seed=seed)
        span = select_bin_span(fv[None], image_size=S, band_rows=band_rows)
        assert span > 0
        kw = dict(image_size=S, near=near, far=far, chunk=16, flip_y=False,
                  band_rows=band_rows, band_capacity=cap,
                  depth_mode=depth_mode, return_depth=True)
        ref = rasterize_fim_wim(jnp.asarray(fv)[None], bin_impl="sort", **kw)
        got = rasterize_fim_wim(jnp.asarray(fv)[None], bin_impl="copysort",
                                bin_span=span, **kw)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_select_bin_span_bounds_band_ranges():
    """The selected span bucket really covers every front face's band
    range (cross-checked against the membership matrix the row sort
    uses)."""
    from jafpro_tpu.geometry.rasterizer import band_occupancy, select_bin_span

    S, band_rows = 32, 8
    fv = random_faces(80, seed=3)[None].astype(np.float32)
    span = select_bin_span(fv, image_size=S, band_rows=band_rows)
    x, y = fv[0, :, :, 0], fv[0, :, :, 1]
    front = (y[:, 2] - y[:, 0]) * (x[:, 1] - x[:, 0]) >= (
        (y[:, 1] - y[:, 0]) * (x[:, 2] - x[:, 0]))
    nb = S // band_rows
    r0 = np.arange(nb, dtype=np.float32) * band_rows
    lo = (2.0 * r0 + 1 - S) / S
    hi = (2.0 * (r0 + band_rows - 1) + 1 - S) / S
    member = (front[None, :] & (y.max(1)[None] >= lo[:, None])
              & (y.min(1)[None] <= hi[:, None]))  # (nb, F)
    for f in np.nonzero(member.any(0))[0]:
        bands = np.nonzero(member[:, f])[0]
        assert bands.max() - bands.min() + 1 <= span


@pytest.mark.parametrize("depth_mode", ["exact", "affine", "fused"])
def test_rasterizer_crop_cols_matches_full(depth_mode):
    """crop_cols (column-window racing with per-frame traced offset +
    scatter-back) is bitwise identical to the full-width banded kernel
    whenever the selected width covers every frame's front-face x extent
    — including a scene hugging the right image edge (offset clamp)."""
    from jafpro_tpu.geometry.rasterizer import select_crop_cols

    S, near, far = 32, 0.1, 25.0
    for seed, xshift in ((1, 0.0), (4, -0.55), (8, 0.62)):
        fv = random_faces(60, seed=seed)
        # squeeze into a narrow column band (people do this)
        fv[:, :, 0] = fv[:, :, 0] * 0.3 + xshift
        w = select_crop_cols(fv[None], image_size=S, buckets=(8, 12, 16, 24))
        assert w > 0
        kw = dict(image_size=S, near=near, far=far, chunk=16, flip_y=False,
                  band_rows=8, band_capacity=64, depth_mode=depth_mode,
                  return_depth=True)
        ref = rasterize_fim_wim(jnp.asarray(fv)[None], **kw)
        got = rasterize_fim_wim(jnp.asarray(fv)[None], crop_cols=w, **kw)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_select_mask_crop_cols_and_window_offset():
    """The host bucket covers every frame's True-column extent, and the
    traced window offset places a window containing every True column."""
    import jax.numpy as jnp

    from jafpro_tpu.geometry.rasterizer import (column_window_offset,
                                                select_mask_crop_cols)

    rng = np.random.RandomState(3)
    S = 64
    masks = np.zeros((5, S, S), bool)
    for b in range(5):
        c = rng.randint(0, S - 20)
        w = rng.randint(1, 20)
        rows = rng.rand(S, w) > 0.6
        masks[b, :, c:c + w] = rows
    width = select_mask_crop_cols(masks, buckets=(8, 16, 24, 32, 48))
    assert width > 0
    c0 = np.asarray(column_window_offset(jnp.asarray(masks), width))
    for b in range(5):
        idx = np.nonzero(masks[b].any(0))[0]
        if idx.size:
            assert c0[b] <= idx[0] and idx[-1] < c0[b] + width
    # a full-width mask fits no bucket -> 0 (callers run uncropped)
    full = np.ones((1, S, S), bool)
    assert select_mask_crop_cols(full, buckets=(8, 16, 32)) == 0
    # all-False frames place the window at 0 (placement is irrelevant:
    # every pixel is background)
    empty = np.zeros((2, S, S), bool)
    assert (np.asarray(column_window_offset(jnp.asarray(empty), 16))
            == 0).all()


def test_select_crop_cols_full_scene_returns_zero():
    """A scene spanning the full width fits no bucket -> 0 (no crop)."""
    from jafpro_tpu.geometry.rasterizer import select_crop_cols

    fv = random_faces(60, seed=2)  # centers span [-0.8, 0.8] ~ full width
    assert select_crop_cols(fv[None], image_size=32,
                            buckets=(8, 12, 16)) == 0


def test_rasterizer_fused_range_checked_matches():
    """depth_range_checked=True drops the per-(pixel, face) near/far
    compares + clamp; with every vertex depth strictly inside (near, far)
    — the host-verified precondition — output is bitwise identical."""
    S, near, far = 32, 0.1, 25.0
    for band_rows in (0, 8):
        fv = random_faces(50, seed=2)  # z in [1, 5] strictly inside
        kw = dict(image_size=S, near=near, far=far, chunk=16, flip_y=False,
                  band_rows=band_rows, band_capacity=4096,
                  depth_mode="fused", return_depth=True)
        ref = rasterize_fim_wim(jnp.asarray(fv)[None],
                                depth_range_checked=False, **kw)
        got = rasterize_fim_wim(jnp.asarray(fv)[None],
                                depth_range_checked=True, **kw)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_adapt_to_clip_selects_bin_and_range(tmp_path):
    """adapt_to_clip measures capacity and the copysort span per clip on
    the host.  depth_range_checked must stay OFF: it measured ~10% slower
    on TPU (TUNING.md round 2), so adapt never selects it."""
    from jafpro_tpu.train.common import synthetic_quad_mesh

    verts, faces = synthetic_quad_mesh(12)
    eng = SMPLFlowEngine(faces=faces, image_size=32, band_rows=8)
    cams = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (3, 1))
    v = np.tile(verts[None], (3, 1, 1)).astype(np.float32)
    v[..., 2] += 2.0
    adapted = eng.adapt_to_clip(cams, v)
    assert adapted.bin_impl == "copysort" and adapted.bin_span >= 1
    assert not adapted.depth_range_checked
    assert adapted.band_capacity >= 1
    # include_crop=False (the training path: conv-dominated step, no
    # measured it/s win, ~15x slower compile — TUNING.md round 3) must
    # keep full-width rasterization while still binding capacity/binning
    no_crop = eng.adapt_to_clip(cams, v, include_crop=False)
    assert no_crop.crop_cols == 0
    assert (no_crop.band_capacity, no_crop.bin_impl) == (
        adapted.band_capacity, adapted.bin_impl)


def test_merge_conservative_engines():
    """Batch serving merges per-clip adapted engines field-by-field: one
    clip can bind the capacity while another binds the crop window, so
    picking any single clip's engine would be inexact for the other."""
    import dataclasses

    from jafpro_tpu.train.common import synthetic_quad_mesh

    _, faces = synthetic_quad_mesh(6)
    base = SMPLFlowEngine(faces=faces, image_size=32, band_rows=8)
    a = dataclasses.replace(base, band_capacity=2048, bin_impl="copysort",
                            bin_span=2, crop_cols=96)
    b = dataclasses.replace(base, band_capacity=1536, bin_impl="copysort",
                            bin_span=3, crop_cols=128)
    m = SMPLFlowEngine.merge_conservative([a, b])
    assert (m.band_capacity, m.bin_span, m.crop_cols) == (2048, 3, 128)
    assert m.bin_impl == "copysort"
    # a clip that fit no crop bucket (0 = full width) forces full width;
    # a clip that fell back to the row sort forces the row sort
    c = dataclasses.replace(base, band_capacity=512, bin_impl="sort",
                            crop_cols=0)
    m = SMPLFlowEngine.merge_conservative([a, b, c])
    assert (m.band_capacity, m.crop_cols, m.bin_impl) == (2048, 0, "sort")
    # any dense clip forces the dense path
    d = dataclasses.replace(base, band_rows=0)
    assert SMPLFlowEngine.merge_conservative([a, d]).band_rows == 0


def test_torch_params_orbax_roundtrip(tmp_path):
    """Converted torch params survive an orbax save/restore cycle."""
    pytest.importorskip("torch")
    import torch

    from jafpro_tpu.checkpoints import restore_checkpoint, save_checkpoint
    from jafpro_tpu.models import CRNSmaller
    from jafpro_tpu.torch_compat import load_torch_crn

    sd = {}
    rng = np.random.RandomState(8)

    def add_block(prefix, cin, cout):
        for i, c_in in ((0, cin), (3, cout)):
            sd[f"{prefix}.conv_block.{i}.weight"] = torch.from_numpy(
                rng.randn(cout, c_in, 3, 3).astype(np.float32))
            sd[f"{prefix}.conv_block.{i}.bias"] = torch.from_numpy(
                rng.randn(cout).astype(np.float32))
        for i in (1, 4):
            sd[f"{prefix}.conv_block.{i}.gamma"] = torch.from_numpy(
                rng.rand(cout).astype(np.float32))
            sd[f"{prefix}.conv_block.{i}.beta"] = torch.from_numpy(
                rng.randn(cout).astype(np.float32))

    enc = [(6, 64), (64, 128), (128, 128), (128, 256), (256, 256),
           (256, 512)]
    for i, (ci, co) in enumerate(enc):
        add_block(f"conv{i + 1}_encoder", ci, co)
    dec_in = [6 + 512, 6 + 512 + 256, 6 + 512 + 256, 6 + 512 + 128,
              6 + 512 + 128, 6 + 512 + 64]
    for lvl, ci in zip(range(6, 0, -1), dec_in):
        add_block(f"conv{lvl}_decoder", ci, 512 if lvl > 1 else 256)
    add_block("decoder", 6 + 256, 256)
    sd["out_conv.weight"] = torch.from_numpy(
        rng.randn(3, 256, 1, 1).astype(np.float32))
    sd["out_conv.bias"] = torch.from_numpy(rng.randn(3).astype(np.float32))

    variables = load_torch_crn(sd, fg=False)
    save_checkpoint(str(tmp_path), 42000, {"bg": variables["params"]})
    target = jax.tree_util.tree_map(np.zeros_like,
                                    {"bg": variables["params"]})
    restored = restore_checkpoint(str(tmp_path), 42000, target)
    x = jnp.asarray(rng.randn(1, 64, 64, 6).astype(np.float32))
    out1 = CRNSmaller().apply(variables, x, 64)
    out2 = CRNSmaller().apply({"params": restored["bg"]}, x, 64)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_rasterizer_near_far_cull():
    S = 16
    fv = random_faces(10, seed=3)
    fim, _ = rasterize_fim_wim(jnp.asarray(fv)[None], image_size=S,
                               near=10.0, far=11.0, chunk=4)
    assert (np.asarray(fim) == -1).all()  # all faces have z in [1, 5]


def test_projection_and_look_at():
    X = RNG.randn(2, 10, 3).astype(np.float32)
    cam = np.array([[1.2, 0.1, -0.2], [0.8, 0.0, 0.3]], np.float32)
    out = np.asarray(orthographic_proj_withz_idrot(jnp.asarray(X), jnp.asarray(cam)))
    expect_xy = cam[:, :1, None] * (X[..., :2] + cam[:, None, 1:3])
    np.testing.assert_allclose(out[..., :2], expect_xy.reshape(2, 10, 2), atol=1e-5)
    np.testing.assert_allclose(out[..., 2], X[..., 2], atol=1e-6)

    # default JAFPro eye: look_at is a pure z-translation
    eye = default_eye(30.0)
    v = jnp.asarray(X)
    out = np.asarray(look_at(v, eye))
    np.testing.assert_allclose(out[..., :2], X[..., :2], atol=1e-5)
    np.testing.assert_allclose(out[..., 2], X[..., 2] - eye[2], atol=1e-5)

    # project_to_view fuses proj + y-flip + translate
    pv = np.asarray(project_to_view(v, jnp.asarray(cam), 30.0))
    np.testing.assert_allclose(pv[..., 0], expect_xy[..., 0], atol=1e-5)
    np.testing.assert_allclose(pv[..., 1], -expect_xy[..., 1], atol=1e-5)
    np.testing.assert_allclose(pv[..., 2], X[..., 2] - eye[2], atol=1e-5)


def test_smpl_lbs_properties():
    model = SMPLModel.synthetic(num_verts=32)
    beta = jnp.asarray(RNG.randn(2, 10).astype(np.float32))
    theta0 = jnp.zeros((2, 72), jnp.float32)
    verts0, joints0, Rs0 = model(beta, theta0)
    assert verts0.shape == (2, 32, 3) and joints0.shape == (2, 19, 3)
    # zero pose => rotations are identity, verts == shaped template
    np.testing.assert_allclose(
        np.asarray(Rs0), np.broadcast_to(np.eye(3), (2, 24, 3, 3)), atol=1e-5
    )
    v_shaped = (np.asarray(beta) @ np.asarray(model.shapedirs)).reshape(2, 32, 3) \
        + np.asarray(model.v_template)
    np.testing.assert_allclose(np.asarray(verts0), v_shaped, atol=1e-4)

    # a global rigid rotation rotates all vertices around the root joint
    theta_g = jnp.zeros((1, 72), jnp.float32).at[0, :3].set(
        jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float32))
    verts_g, _, Rs_g = model(beta[:1], theta_g)
    R = np.asarray(Rs_g)[0, 0]
    np.testing.assert_allclose(
        R, np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32), atol=1e-5)
    root = np.asarray(
        jnp.einsum("nvc,vk->nkc", verts0[:1], model.J_regressor))[0, 0]
    expect = (np.asarray(verts0)[0] - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(verts_g)[0], expect, atol=1e-3)


def test_rodrigues_matches_scipy():
    from scipy.spatial.transform import Rotation
    from jafpro_tpu.geometry import batch_rodrigues

    vecs = RNG.randn(20, 3).astype(np.float32)
    ours = np.asarray(batch_rodrigues(jnp.asarray(vecs)))
    ref = Rotation.from_rotvec(vecs).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_cal_bc_transform_gather():
    B, F, S = 2, 6, 8
    f2pts = RNG.randn(B, F, 3, 2).astype(np.float32)
    fim = RNG.randint(-1, F, size=(B, S, S)).astype(np.int32)
    wim = RNG.rand(B, S, S, 3).astype(np.float32)
    T = np.asarray(cal_bc_transform(jnp.asarray(f2pts), jnp.asarray(fim),
                                    jnp.asarray(wim)))
    for b in range(B):
        for y in range(S):
            for x in range(S):
                if fim[b, y, x] < 0:
                    np.testing.assert_allclose(T[b, y, x], -2.0)
                else:
                    e = (f2pts[b, fim[b, y, x]] * wim[b, y, x][:, None]).sum(0)
                    np.testing.assert_allclose(T[b, y, x], e, atol=1e-5)


def test_flow_engine_identity_warp():
    """Same pose as source and target => the flow reconstructs (a smooth
    approximation of) the identity inside the silhouette."""
    # build a small fake body: a planar quad grid mesh facing the camera
    n = 6
    ys, xs = np.meshgrid(np.linspace(-0.5, 0.5, n), np.linspace(-0.5, 0.5, n),
                         indexing="ij")
    verts = np.stack([xs, ys, np.full_like(xs, 2.0)], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b = i * n + j, i * n + j + 1
            c, d = (i + 1) * n + j, (i + 1) * n + j + 1
            faces.append([a, c, b])
            faces.append([b, c, d])
    faces = np.asarray(faces, np.int32)
    engine = SMPLFlowEngine.create(faces=faces, image_size=32, chunk=16)

    cam = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    v = jnp.asarray(verts[None], jnp.float32)
    flow = engine.cal_flow(cam, v, cam, v)
    flow = np.asarray(flow)[0]
    body = flow[..., 0] > -1.99
    assert body.sum() > 100
    # identity grid in align_corners coords
    S = 32
    gy, gx = np.meshgrid((2 * np.arange(S) + 1 - S) / S,
                         (2 * np.arange(S) + 1 - S) / S, indexing="ij")
    # with the NMR vertical flip, identity pose => identity flow
    np.testing.assert_allclose(flow[..., 0][body], gx[body], atol=0.1)
    np.testing.assert_allclose(flow[..., 1][body], gy[body], atol=0.1)
