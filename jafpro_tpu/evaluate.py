"""Video quality metrics (the ``test/video_evaluation.py`` equivalent).

Per frame: SSIM (grayscale), L1, VGG perceptual distance, and FlowNetSD
flow-consistency L1; per video: MS-SSIM and PSNR on the grayscale stack —
the exact metric set the reference logs (``video_evaluation.py:184-246``).

SSIM follows skimage's ``compare_ssim`` defaults used by the reference
(7x7 uniform window, Bessel-corrected covariances, data_range of the dtype);
MS-SSIM implements skvideo.measure.msssim's exact algorithm (5-scale
MultiScaleSSIM, Gaussian fspecial(11,1.5) window, 'product' combination),
oracle-tested against an independent scipy implementation.
All metrics run as jnp ops so evaluation can be jitted on device.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def rgb_to_gray(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB [0,1] -> (...) luma (ITU-R 601, skimage convention)."""
    w = jnp.asarray([0.2125, 0.7154, 0.0721], x.dtype)
    return jnp.tensordot(x, w, axes=1)


def _uniform_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Valid-mode uniform filter over the trailing two axes of (B, H, W)."""
    k = jnp.ones((size, size), x.dtype) / (size * size)
    return jax.lax.conv_general_dilated(
        x[:, None], k[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]


def ssim(
    a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0,
    win_size: int = 7,
) -> jnp.ndarray:
    """Mean SSIM between grayscale images (B, H, W) -> (B,)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)  # skimage sample covariance

    ux = _uniform_filter(a, win_size)
    uy = _uniform_filter(b, win_size)
    uxx = _uniform_filter(a * a, win_size)
    uyy = _uniform_filter(b * b, win_size)
    uxy = _uniform_filter(a * b, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    s = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    # skimage crops (win_size-1)//2 from each side of the valid map — the
    # valid conv already removed it
    return jnp.mean(s, axis=(1, 2))


def _fspecial_gauss_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """1-D factor of MATLAB's fspecial('gaussian', size, sigma) (the 2-D
    kernel is the normalized outer product of this with itself)."""
    radius = size // 2
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_filter(x: jnp.ndarray, size: int = 11,
                     sigma: float = 1.5) -> jnp.ndarray:
    """Valid-mode fspecial-Gaussian filter over (B, H, W), separable."""
    g = jnp.asarray(_fspecial_gauss_1d(size, sigma), x.dtype)
    y = jax.lax.conv_general_dilated(
        x[:, None], g[None, None, :, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(
        y, g[None, None, None, :], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y[:, 0]


def _ssim_for_scale(a, b, data_range=1.0, size=11, sigma=1.5):
    """One MS-SSIM scale: (mean l*cs map, mean cs map), the skvideo /
    MultiScaleSSIM per-scale statistics (K1=0.01, K2=0.03, Gaussian
    fspecial(11, 1.5) window, valid convolution)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    mu1 = _gaussian_filter(a, size, sigma)
    mu2 = _gaussian_filter(b, size, sigma)
    mu11, mu22, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s11 = _gaussian_filter(a * a, size, sigma) - mu11
    s22 = _gaussian_filter(b * b, size, sigma) - mu22
    s12 = _gaussian_filter(a * b, size, sigma) - mu12
    v1 = 2.0 * s12 + C2
    v2 = s11 + s22 + C2
    ssim_map = ((2.0 * mu12 + C1) * v1) / ((mu11 + mu22 + C1) * v2)
    return jnp.mean(ssim_map, axis=(1, 2)), jnp.mean(v1 / v2, axis=(1, 2))


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """skvideo's inter-scale downsample: 2x2 average then stride-2
    subsample.  For odd H/W the trailing row/column averages with its
    symmetric reflection (scipy.ndimage mode='reflect'), which for a 2x2
    kernel means it averages with itself — i.e. edge replication."""
    B, H, W = x.shape
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2)), mode="edge")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID") / 4.0


def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Multi-scale SSIM on grayscale stacks (B, H, W) -> (B,).

    Matches the reference evaluator's ``skvideo.measure.msssim``
    (``test/video_evaluation.py:206-212``): 5 scales, Wang et al. power
    weights, Gaussian fspecial(11, 1.5) window, 'product' combination
    ``prod(cs_i^w_i, i<4) * ssim_4^w_4`` — cross-validated against an
    independent NumPy/scipy oracle in ``tests/test_eval_misc.py``.

    Inputs smaller than 11*2^4 = 176 px (which skvideo simply crashes on;
    the reference only ever evaluates 256x256) use as many scales as fit
    the 11-px window, with the truncated weights renormalized."""
    weights = list(MSSSIM_WEIGHTS)
    sides, s = [], min(a.shape[1], a.shape[2])
    for _ in weights:
        sides.append(s)
        s = (s + 1) // 2  # the reflect downsample ceils odd sizes
    levels = max(1, sum(1 for s in sides if s >= 11))
    if levels < len(weights):
        total = sum(weights[:levels])
        weights = [w / total for w in weights[:levels]]
    mcs = []
    last_ssim = None
    for i in range(levels):
        s, cs = _ssim_for_scale(a, b, data_range)
        mcs.append(cs)
        last_ssim = s
        if i < levels - 1:
            a = _downsample2(a)
            b = _downsample2(b)
    out = last_ssim ** weights[-1]
    for i, w in enumerate(weights[:-1]):
        out = out * mcs[i] ** w
    return out


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def evaluate_video(
    pred: np.ndarray,
    gt: np.ndarray,
    vgg_apply=None,
    vgg_params=None,
    flow_apply=None,
    flow_params=None,
) -> Dict[str, float]:
    """pred/gt: (T, H, W, 3) uint8 or [0,1] float RGB.  Returns the metric
    dict the reference's evaluator logs per video."""
    pred = np.asarray(pred, np.float32)
    gt = np.asarray(gt, np.float32)
    if pred.max() > 1.5:
        pred, gt = pred / 255.0, gt / 255.0

    p = jnp.asarray(pred)
    g = jnp.asarray(gt)
    pg, gg = rgb_to_gray(p), rgb_to_gray(g)

    out = {
        "ssim": float(jnp.mean(ssim(pg, gg))),
        "l1": float(jnp.mean(jnp.abs(p - g))),
        "ms_ssim": float(jnp.mean(ms_ssim(pg, gg))),
        "psnr": float(jnp.mean(psnr(pg, gg))),
    }

    if vgg_apply is not None:
        from jafpro_tpu.losses import CRN_VGG_WEIGHTS, vgg_feature_l1, vgg_preprocess

        fx = vgg_apply(vgg_params, vgg_preprocess(p * 2 - 1))
        fy = vgg_apply(vgg_params, vgg_preprocess(g * 2 - 1))
        out["vgg"] = float(vgg_feature_l1(fx, fy, CRN_VGG_WEIGHTS))

    if flow_apply is not None:
        # flow-consistency: L1 between predicted-video flow and gt-video flow
        # over consecutive frames (reference video_evaluation.py:199-202)
        pairs_p = jnp.concatenate([p[:-1], p[1:]], axis=-1)
        pairs_g = jnp.concatenate([g[:-1], g[1:]], axis=-1)
        fp = flow_apply(flow_params, pairs_p)
        fg_ = flow_apply(flow_params, pairs_g)
        out["flow_l1"] = float(jnp.mean(jnp.abs(fp - fg_)))
    return out


def similarity_analysis(pred: np.ndarray, gt: np.ndarray) -> Dict[str, float]:
    """Legacy standalone metrics with standard deviations (reference
    ``src/similarity_analysis_update.py:56-89``): per-frame PSNR / SSIM /
    L1-norm means and stds over a video pair (T, H, W, 3) in [0, 1]."""
    pred = np.asarray(pred, np.float32)
    gt = np.asarray(gt, np.float32)
    if pred.max() > 1.5:
        pred, gt = pred / 255.0, gt / 255.0
    p, g = jnp.asarray(pred), jnp.asarray(gt)
    pg, gg = rgb_to_gray(p), rgb_to_gray(g)
    ssims = np.asarray(ssim(pg, gg))
    psnrs = np.asarray(psnr(pg, gg))
    l1s = np.abs(pred - gt).reshape(pred.shape[0], -1).mean(1)
    return {
        "psnr_mean": float(psnrs.mean()), "psnr_std": float(psnrs.std()),
        "ssim_mean": float(ssims.mean()), "ssim_std": float(ssims.std()),
        "l1_mean": float(l1s.mean()), "l1_std": float(l1s.std()),
    }
