"""Flow-propagation blend network.

Re-design of reference ``src/flow_net.py`` (``CompositeWeightUnet`` +
``Propagation3DFlowNet``): predicts a per-pixel blend weight between the
SMPL-flow-warped previous real frame (tsf) and the generated frame.

BatchNorm note: the reference trains with batch statistics and *never*
switches the propagation net to eval at inference
(``test/conv_pro_test.py:146-149`` eval()s only the other four nets), so
normalization always uses current-batch statistics.  We therefore implement
the norm as stateless per-batch normalization — identical behavior in both
phases, no mutable state under jit.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from jafpro_tpu.models.common import ReflectConv
from jafpro_tpu.ops.sampling import resize_bilinear


class BatchStatsNorm(nn.Module):
    """BatchNorm that always normalizes with current-batch statistics
    (per channel over B, H, W) — torch train-mode semantics.

    ``per_sample=True`` computes statistics over (H, W) only: identical to
    batch-size-1 train-mode BatchNorm per item, which is exactly the
    reference's inference behavior (batch 1, never .eval()).  This lets the
    TPU inference path batch independent frames without coupling their
    normalization statistics.  Parameter shapes are identical either way.
    """

    features: int
    eps: float = 1e-5
    per_sample: bool = False

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x32 = x.astype(jnp.float32)
        axes = (1, 2) if self.per_sample else (0, 1, 2)
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.var(x32, axis=axes, keepdims=True)
        y = (x32 - mean) / jnp.sqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class _ResnetBlock(nn.Module):
    features: int
    per_sample_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = ReflectConv(self.features, 3, dtype=self.dtype)(x)
        y = BatchStatsNorm(self.features, per_sample=self.per_sample_norm)(y)
        y = nn.relu(y)
        y = ReflectConv(self.features, 3, dtype=self.dtype)(y)
        y = BatchStatsNorm(self.features, per_sample=self.per_sample_norm)(y)
        return x + y


class CompositeWeightUnet(nn.Module):
    ngf: int = 32
    n_downsampling: int = 2
    n_blocks: int = 3
    per_sample_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        ngf = self.ngf
        ps = self.per_sample_norm
        x = ReflectConv(ngf, 7, dtype=self.dtype)(x)
        x = BatchStatsNorm(ngf, per_sample=ps)(x)
        x = nn.relu(x)
        for i in range(self.n_downsampling):
            mult = 2 ** i
            x = nn.Conv(ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
            x = BatchStatsNorm(ngf * mult * 2, per_sample=ps)(x)
            x = nn.relu(x)
        mult = 2 ** self.n_downsampling
        for _ in range(self.n_blocks - self.n_blocks // 2):
            x = _ResnetBlock(ngf * mult, per_sample_norm=ps, dtype=self.dtype)(x)
        for _ in range(self.n_blocks // 2):
            x = _ResnetBlock(ngf * mult, per_sample_norm=ps, dtype=self.dtype)(x)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            B, H, W, _ = x.shape
            # nn.Upsample(scale_factor=2, mode='bilinear') default:
            # align_corners=False
            x = resize_bilinear(x, (H * 2, W * 2), align_corners=False)
            x = nn.Conv(ngf * mult // 2, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype)(x)
            x = BatchStatsNorm(ngf * mult // 2, per_sample=ps)(x)
            x = nn.relu(x)
        x = ReflectConv(1, 7, dtype=self.dtype)(x)
        return nn.sigmoid(x)


class Propagation3DFlowNet(nn.Module):
    """Inputs (all NHWC): fake_tgt (B,S,S,3), tsf_image (B,S,S,3),
    tgt_IUV (B,S,S,3), tgt_smpl_mask (B,S,S,1 or 3 broadcastable).
    Returns {'pred_target', 'weight'} (reference ``flow_net.py:87-99``)."""

    ngf: int = 32
    n_downsampling: int = 2
    n_blocks: int = 3
    use_mask: bool = True
    use_iuv: bool = True
    per_sample_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, fake_tgt, tsf_image, tgt_iuv, tgt_smpl_mask=None):
        if self.use_mask and tgt_smpl_mask is not None:
            tsf_image = tsf_image * tgt_smpl_mask
        feats = [tsf_image, fake_tgt]
        if self.use_iuv:
            feats.append(tgt_iuv)
        x = jnp.concatenate(feats, axis=-1)
        weight = CompositeWeightUnet(
            self.ngf, self.n_downsampling, self.n_blocks,
            per_sample_norm=self.per_sample_norm, dtype=self.dtype
        )(x)
        pred = fake_tgt * weight + tsf_image * (1.0 - weight)
        return {"pred_target": pred, "weight": weight}
