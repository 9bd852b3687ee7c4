"""LPIPS perceptual distance (for the BASELINE north-star SSIM/LPIPS parity).

Standard LPIPS-VGG architecture: imagenet-normalized inputs through VGG16
conv blocks, unit-normalized channel features, squared differences reduced
by learned 1x1 linear heads, spatially averaged and summed over layers.

``load_torch_lpips`` converts the official ``lpips`` package checkpoint
(vgg.pth: ``lin{k}.model.1.weight``) plus a torchvision VGG16 state_dict.
Without weights the metric runs with fixed-seed random features and unit
linear heads — self-consistent for regression tracking, not comparable to
published LPIPS numbers (documented).
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_VGG16_BLOCKS = ((64, 64), (128, 128), (256, 256, 256),
                 (512, 512, 512), (512, 512, 512))
_IMAGENET_MEAN = (-0.030, -0.088, -0.188)   # lpips 'shift' (on [-1,1] input)
_IMAGENET_STD = (0.458, 0.448, 0.450)       # lpips 'scale'


class VGG16Features(nn.Module):
    """Post-ReLU outputs of the last conv in each of the 5 blocks."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        for b, widths in enumerate(_VGG16_BLOCKS):
            for i, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name=f"conv{b + 1}_{i + 1}")(x)
                x = nn.relu(x)
            feats.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """x, y: (B, H, W, 3) in [-1, 1] RGB -> (B,) distances."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_IMAGENET_MEAN, x.dtype)
        scale = jnp.asarray(_IMAGENET_STD, x.dtype)
        net = VGG16Features(dtype=self.dtype, name="vgg")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = jnp.square(a - b)
            lin = self.param(f"lin{k}", nn.initializers.ones,
                             (d.shape[-1],))
            # official heads are non-negative 1x1 convs
            d = jnp.sum(d * jnp.abs(lin), axis=-1)
            total = total + jnp.mean(d, axis=(1, 2))
        return total


def load_torch_lpips(vgg16_path: str, lpips_path: str) -> dict:
    """Build LPIPS params from a torchvision VGG16 state_dict and the
    official lpips 'vgg.pth' linear heads."""
    import torch

    sd = torch.load(vgg16_path, map_location="cpu")
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    names = [f"conv{b + 1}_{i + 1}" for b, ws in enumerate(_VGG16_BLOCKS)
             for i in range(len(ws))]
    vgg_params = {}
    for idx, name in zip(conv_idx, names):
        w = sd[f"features.{idx}.weight"].numpy().transpose(2, 3, 1, 0)
        b = sd[f"features.{idx}.bias"].numpy()
        vgg_params[name] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}

    heads = torch.load(lpips_path, map_location="cpu")
    params = {"vgg": vgg_params}
    for k in range(5):
        w = heads[f"lin{k}.model.1.weight"].numpy().reshape(-1)
        params[f"lin{k}"] = jnp.asarray(w)
    return {"params": params}


def lpips_pair(variables, pred: np.ndarray, gt: np.ndarray) -> float:
    """Convenience: mean LPIPS over (T, H, W, 3) [0,1] or uint8 stacks."""
    pred = np.asarray(pred, np.float32)
    gt = np.asarray(gt, np.float32)
    if pred.max() > 1.5:
        pred, gt = pred / 255.0, gt / 255.0
    m = LPIPS()
    d = m.apply(variables, jnp.asarray(pred * 2 - 1), jnp.asarray(gt * 2 - 1))
    return float(jnp.mean(d))
