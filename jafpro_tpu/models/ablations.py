"""Capability-parity ports of the reference's *unused* ablation networks.

The reference tree ships a large set of experiment leftovers that no train
or test script reaches (SURVEY.md §1 "dead/unused"): alternative texture
fusion networks, an EdgeConnect-style inpainting pair, vid2vid modules,
ESRGAN blocks, pix2pix discriminators and the spatio-temporal CRN.  They are
part of the reference's capability surface, so they are rebuilt here —
TPU-idiomatically (NHWC, packed-parts grouped convs, static shapes) — but
they are NOT on the production pipeline and are tuned for correctness, not
speed.

Reference citations (file:line into /root/reference):
  * UNet / UNet_TA / UNet_SE           src/networks.py:911-1056
  * Accumulate[_no_loss]               src/networks.py:1057-1119
  * Downsampler_mask / Accumulate_mask src/networks.py:1216-1289,1664-1733
  * Accumulate_{max,avg}_fusion        src/networks.py:1735-1803
  * encoder/decoder/max_fusion_module  src/networks.py:498-745
  * vid2vid ResnetBlock / Predictive / Blending
                                       src/networks.py:742-867
  * EdgeConnect InpaintGenerator / EdgeGenerator / Discriminator
                                       src/networks.py:147-355
  * NLayerDiscriminator / PixelDiscriminator / GANLoss
                                       src/networks.py:2057-2160
  * AutoEncoder / CRN_Auto / SpatioTempoCRN
                                       src/crn_model.py:310-602
  * RRDB / ResidualDenseBlock_5C / ResNetBlock
                                       src/block.py:144-258
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from jafpro_tpu.models.common import (
    ConvBlock, ConvLReLU, SampleLayerNorm, UpsampleConvLReLU, reflect_pad)
from jafpro_tpu.models.parts import (
    ENC_NC, PartConv, PartDecoder, PartEncoder, pack_parts, unpack_parts)
from jafpro_tpu.ops.image import avg_pool_3x3s2
from jafpro_tpu.ops.sampling import (
    grid_sample, resize_bilinear, resize_nearest)

# ---------------------------------------------------------------------------
# small torch-parity helpers
# ---------------------------------------------------------------------------


class TorchConvTranspose(nn.Module):
    """torch ``ConvTranspose2d(k, s, p)`` on NHWC: flax VALID transpose
    (out = (i-1)*s + k) cropped by ``p`` on every side."""

    features: int
    kernel: int
    stride: int
    pad: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="VALID",
            dtype=self.dtype)(x)
        p = self.pad
        if p:
            y = y[:, p:-p, p:-p, :]
        return y


class InstanceNorm(nn.Module):
    """torch ``InstanceNorm2d(affine=False)``: per-(sample, channel) spatial
    normalization, no learned affine."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class InstanceNorm1d(nn.Module):
    """torch-1.2 ``InstanceNorm1d`` as the reference actually invokes it
    (``src/networks.py:595-614``): the MLP code has shape (B, 1, 256), so
    torch's (N, C, L) convention sees C=1 and normalizes across the 256
    features — i.e. a per-sample feature normalization without affine."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


# ---------------------------------------------------------------------------
# plain U-Nets (UNet / UNet_TA / UNet_SE) — src/networks.py:911-1056
# ---------------------------------------------------------------------------


class UNetSE(nn.Module):
    """Single-part 200x200 texture U-Net (``UNet_SE``,
    ``src/networks.py:1014-1056``): 9-conv encoder (5x5 stem), fixed-size
    bilinear decoder.  Identical math to ``PartEncoder``/``PartDecoder``
    with one part."""

    enc_nc: Sequence[int] = ENC_NC
    dec_nc: Sequence[int] = (48, 24, 12, 6)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        skips = PartEncoder(parts=1, enc_nc=self.enc_nc, dtype=self.dtype)(x)
        return PartDecoder(parts=1, dec_nc=self.dec_nc, dtype=self.dtype)(skips)


class UNetGenerator(nn.Module):
    """The full-image U-Net (``UNet``, ``src/networks.py:911-957``):
    11-conv encoder (7x7 stem, 5 stride-2 stages) with scale-2 bilinear
    upsampling decoder and a 3-channel head."""

    enc_nc: Sequence[int] = (64, 64, 128, 128, 128, 128, 128, 128, 128, 128,
                             128)
    dec_nc: Sequence[int] = (128, 128, 128, 128, 64)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        nc = self.enc_nc
        C = lambda f, k=3, s=1: ConvLReLU(f, kernel=k, stride=s,
                                          dtype=self.dtype)
        x0 = C(nc[0], k=7)(x)
        x1 = C(nc[1], s=2)(x0)
        x3 = C(nc[2])(x1)
        x4 = C(nc[3], s=2)(x3)
        x5 = C(nc[4])(x4)
        x6 = C(nc[5], s=2)(x5)
        x7 = C(nc[6])(x6)
        x8 = C(nc[7], s=2)(x7)
        x9 = C(nc[8])(x8)
        x10 = C(nc[9], s=2)(x9)
        h = C(nc[10])(x10)
        for feat, skip in zip(self.dec_nc, (x9, x7, x5, x3, x0)):
            h = UpsampleConvLReLU(feat, output_size=skip.shape[1],
                                  dtype=self.dtype)(h, skip)
        return nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype)(h)


class UNetTA(nn.Module):
    """Whole-atlas (800x1200) texture U-Net (``UNet_TA``,
    ``src/networks.py:958-1013``): 9-conv encoder over the full atlas, 4-level
    decoder back to input resolution.  (The reference class is dead code with
    a broken decoder call signature; this implements its evident intent —
    skip connections at the 4 even encoder scales.)"""

    enc_nc: Sequence[int] = ENC_NC
    dec_nc: Sequence[int] = (48, 24, 12, 6)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        nc = self.enc_nc
        C = lambda f, k=3, s=1: ConvLReLU(f, kernel=k, stride=s,
                                          dtype=self.dtype)
        x0 = C(nc[0], k=7)(x)
        x1 = C(nc[1], s=2)(x0)
        x3 = C(nc[2])(x1)
        x4 = C(nc[3], s=2)(x3)
        x5 = C(nc[4])(x4)
        x6 = C(nc[5], s=2)(x5)
        x7 = C(nc[6])(x6)
        x8 = C(nc[7], s=2)(x7)
        h = C(nc[8])(x8)
        for feat, skip in zip(self.dec_nc, (x7, x5, x3, x0)):
            h = _resize_cat_conv(h, skip, feat, self.dtype)
        return nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype)(h)


def _resize_cat_conv(x, skip, features, dtype):
    x = resize_bilinear(x, skip.shape[1:3], align_corners=True)
    x = jnp.concatenate([x, skip], axis=-1)
    return ConvLReLU(features, dtype=dtype)(x)


# ---------------------------------------------------------------------------
# fusion ablations over the 24-part atlas — src/networks.py:1057-1803
# ---------------------------------------------------------------------------


class AccumulatePlain(nn.Module):
    """``Accumulate[_no_loss]`` (``src/networks.py:1057-1119``): the N
    reference parts are fused by straight channel concatenation into each
    part's U-Net (no recurrence).  parts run as packed grouped convs."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray) -> jnp.ndarray:
        """(B, N, P, h, w, 3) -> (B, P, h, w, 3)."""
        B, N, P, h, w, C = parts.shape
        # per-part channel concat of the N references: (B, P, h, w, N*C)
        x = jnp.transpose(parts, (0, 2, 3, 4, 1, 5)).reshape(B, P, h, w,
                                                             N * C)
        x = pack_parts(x)
        skips = PartEncoder(parts=P, dtype=self.dtype)(x)
        out = PartDecoder(parts=P, dtype=self.dtype)(skips)
        return unpack_parts(out, P)


class _ReduceFusion(nn.Module):
    """Shared body of ``Accumulate_{max,avg}_fusion``
    (``src/networks.py:1735-1803``): encode each reference with the (shared)
    per-part encoder, reduce each skip level elementwise across references,
    decode once.  (The reference classes are dead code whose reduction
    collapses the channel axis; this implements the evident intent —
    per-channel reduction across the N references.)"""

    reduce: str = "max"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray) -> jnp.ndarray:
        """(B, N, P, h, w, 3) -> (B, P, h, w, 3)."""
        B, N, P, h, w, C = parts.shape
        x = pack_parts(parts.reshape(B * N, P, h, w, C))
        skips = PartEncoder(parts=P, dtype=self.dtype)(x)
        red = jnp.max if self.reduce == "max" else jnp.mean
        fused = tuple(
            red(s.reshape(B, N, *s.shape[1:]), axis=1) for s in skips)
        out = PartDecoder(parts=P, dtype=self.dtype)(fused)
        return unpack_parts(out, P)


class AccumulateMaxFusion(_ReduceFusion):
    reduce: str = "max"


class AccumulateAvgFusion(_ReduceFusion):
    reduce: str = "mean"


class AccumulateMask(nn.Module):
    """``Accumulate_mask`` / ``Downsampler_mask``
    (``src/networks.py:1216-1289,1664-1733``): each reference is encoded by a
    shared per-part encoder; at each skip level a per-part conv over the
    concatenated reference features predicts an N-way softmax blend mask and
    the level is fused as the mask-weighted sum of the references."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray) -> jnp.ndarray:
        """(B, N, P, h, w, 3) -> (B, P, h, w, 3)."""
        B, N, P, h, w, C = parts.shape
        x = pack_parts(parts.reshape(B * N, P, h, w, C))
        skips = PartEncoder(parts=P, dtype=self.dtype)(x)
        fused = []
        for level, s in enumerate(skips):
            hs, ws = s.shape[1:3]
            c = s.shape[-1] // P
            # (B, N, hs, ws, P, c) -> refs-last per part: (B, hs, ws, P*(N*c))
            f = s.reshape(B, N, hs, ws, P, c)
            f_cat = jnp.transpose(f, (0, 2, 3, 4, 1, 5)).reshape(
                B, hs, ws, P * N * c)
            k = 5 if level == 0 else 3
            logits = PartConv(P, N, kernel=k, dtype=self.dtype,
                              name=f"mask{level}")(f_cat)
            m = jax.nn.softmax(logits.reshape(B, hs, ws, P, N), axis=-1)
            # weighted sum over refs: (B, hs, ws, P, c)
            blend = jnp.einsum("bnhwpc,bhwpn->bhwpc", f, m)
            fused.append(blend.reshape(B, hs, ws, P * c))
        out = PartDecoder(parts=P, dtype=self.dtype)(tuple(fused))
        return unpack_parts(out, P)


# ---------------------------------------------------------------------------
# latent-code fusion (encoder / decoder / max_fusion_module)
#   src/networks.py:498-745
# ---------------------------------------------------------------------------


def _maxpool(x, pad):
    neg = jnp.array(-jnp.inf, x.dtype)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


class CodeEncoder(nn.Module):
    """``encoder`` (``src/networks.py:498-523``): 7x [ConvBlock, maxpool]
    compressing one 200x200 part to a 256-d code."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        chans = (16, 32, 32, 64, 64, 128, 256)
        pads = (1, 1, 1, 0, 1, 1, 0)
        for c, p in zip(chans, pads):
            x = ConvBlock(1, c, dtype=self.dtype)(x)
            x = _maxpool(x, p)
        return x.reshape(x.shape[0], -1)  # (B, 256)


class CodeDecoder(nn.Module):
    """``decoder`` (``src/networks.py:525-588``): 7 transposed convs from a
    512-d code back to a 200x200x3 part, tanh head."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, code):
        x = code.reshape(code.shape[0], 1, 1, -1)
        spec = [(256, 3, 2, 0), (128, 4, 2, 1), (64, 4, 2, 1), (32, 3, 2, 0),
                (16, 4, 2, 1), (16, 4, 2, 1), (16, 4, 2, 1)]
        for feats, k, s, p in spec:
            x = TorchConvTranspose(feats, k, s, p, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(3, (1, 1), dtype=self.dtype)(x)
        return jnp.tanh(x)


class MaxFusionModule(nn.Module):
    """``max_fusion_module[_no_loss]`` (``src/networks.py:588-745``): encode
    every part of every reference to a 256-d code, concatenate the 24 part
    codes to a 6144-d global code, project it through a 5-layer
    InstanceNorm1d MLP, max-fuse both codes across references, and decode
    each part from [projected global (256) | its fused part code (256)].

    Per-part encoder/decoder params are stacked and vmapped over the part
    axis (the reference keeps 24 independent module lists)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts: jnp.ndarray) -> jnp.ndarray:
        """(B, N, P, h, w, 3) -> (B, P, h, w, 3)."""
        B, N, P, h, w, C = parts.shape

        enc = nn.vmap(
            CodeEncoder, in_axes=1, out_axes=1,
            variable_axes={"params": 0}, split_rngs={"params": True},
        )(dtype=self.dtype, name="encoders")
        codes = enc(parts.reshape(B * N, P, h, w, C))     # (B*N, P, 256)
        glob = codes.reshape(B, N, P * 256)               # 6144-d

        proj = glob.reshape(B * N, 1, P * 256)
        for _ in range(5):
            proj = nn.Dense(256, dtype=self.dtype)(proj)
            proj = InstanceNorm1d()(proj)
            proj = nn.relu(proj)
        proj = proj.reshape(B, N, 256)

        fus_part = jnp.max(codes.reshape(B, N, P, 256), axis=1)  # (B, P, 256)
        fus_proj = jnp.max(proj, axis=1)                         # (B, 256)

        dec_in = jnp.concatenate(
            [jnp.broadcast_to(fus_proj[:, None], (B, P, 256)), fus_part],
            axis=-1)                                             # (B, P, 512)
        dec = nn.vmap(
            CodeDecoder, in_axes=1, out_axes=1,
            variable_axes={"params": 0}, split_rngs={"params": True},
        )(dtype=self.dtype, name="decoders")
        return dec(dec_in)                                       # (B, P, h, w, 3)


# ---------------------------------------------------------------------------
# vid2vid-style modules — src/networks.py:742-867
# ---------------------------------------------------------------------------


class Vid2VidResnetBlock(nn.Module):
    """vid2vid ``ResnetBlock`` (``src/networks.py:742-781``): zero-pad 3x3
    conv + InstanceNorm + ReLU, 3x3 conv + InstanceNorm, residual add."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype)(x)
        h = nn.relu(InstanceNorm()(h))
        h = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype)(h)
        return x + InstanceNorm()(h)


class PredictiveModule(nn.Module):
    """``PredictiveModule`` (``src/networks.py:784-824``): 3-conv encoder
    256->64, 6 resblocks @256ch, deconv decoder back to 256 with tanh."""

    n_blocks: int = 6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for feats, s in ((64, 1), (128, 2), (256, 2)):
            x = nn.Conv(feats, (3, 3), strides=(s, s),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
            x = nn.relu(InstanceNorm()(x))
        for _ in range(self.n_blocks):
            x = Vid2VidResnetBlock(256, dtype=self.dtype)(x)
        for feats in (128, 64):
            # torch ConvTranspose2d(3, s2, p1, output_padding=1) == 2x size
            x = nn.ConvTranspose(feats, (3, 3), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(InstanceNorm()(x))
        x = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
        return jnp.tanh(x)


class BlendingModule(nn.Module):
    """``BlendingModule`` (``src/networks.py:826-867``): residual corrector
    over the predictive output given [pred, warped, IUV] (9ch)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, predictive, warped, tgt_iuv):
        x = jnp.concatenate([predictive, warped, tgt_iuv], axis=-1)
        x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
        x = nn.relu(InstanceNorm()(x))
        for _ in range(3):
            x = Vid2VidResnetBlock(64, dtype=self.dtype)(x)
        x = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
        return jnp.tanh(x) + predictive


# ---------------------------------------------------------------------------
# EdgeConnect-style inpainting — src/networks.py:147-355
# ---------------------------------------------------------------------------


class _SNConv(nn.Module):
    """Conv with optional spectral normalization (EdgeConnect uses SN on the
    edge generator and both discriminators)."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dilation: int = 1
    use_bias: bool = True
    spectral: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, update_sn: bool = False):
        conv = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias, dtype=self.dtype)
        if self.spectral:
            conv = nn.SpectralNorm(conv)
            return conv(x, update_stats=update_sn)
        return conv(x)


class EdgeConnectResnetBlock(nn.Module):
    """EdgeConnect ``ResnetBlock`` (``src/networks.py:327-354``): dilated
    reflect-pad conv + IN + ReLU, conv + IN, residual."""

    features: int
    dilation: int = 2
    spectral: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, update_sn: bool = False):
        h = reflect_pad(x, self.dilation)
        h = _SNConv(self.features, 3, dilation=self.dilation,
                    use_bias=not self.spectral, spectral=self.spectral,
                    dtype=self.dtype)(h, update_sn=update_sn)
        h = nn.relu(InstanceNorm()(h))
        h = reflect_pad(h, 1)
        h = _SNConv(self.features, 3, use_bias=not self.spectral,
                    spectral=self.spectral, dtype=self.dtype)(
                        h, update_sn=update_sn)
        return x + InstanceNorm()(h)


class InpaintGenerator(nn.Module):
    """EdgeConnect ``InpaintGenerator`` (``src/networks.py:180-229``):
    reflect-7x7 stem, 2 stride-2 convs, 8 dilated resblocks, 2 deconvs,
    reflect-7x7 head, (tanh+1)/2 output in [0, 1]."""

    residual_blocks: int = 8
    in_features: int = 6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = reflect_pad(x, 3)
        x = nn.Conv(64, (7, 7), padding="VALID", dtype=self.dtype)(x)
        x = nn.relu(InstanceNorm()(x))
        for feats in (128, 256):
            x = nn.Conv(feats, (4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
            x = nn.relu(InstanceNorm()(x))
        for _ in range(self.residual_blocks):
            x = EdgeConnectResnetBlock(256, dtype=self.dtype)(x)
        for feats in (128, 64):
            x = TorchConvTranspose(feats, 4, 2, 1, dtype=self.dtype)(x)
            x = nn.relu(InstanceNorm()(x))
        x = reflect_pad(x, 3)
        x = nn.Conv(3, (7, 7), padding="VALID", dtype=self.dtype)(x)
        return (jnp.tanh(x) + 1.0) / 2.0


class EdgeGenerator(nn.Module):
    """EdgeConnect ``EdgeGenerator`` (``src/networks.py:231-280``): same shape
    as InpaintGenerator but spectral-normalized convs and a sigmoid 1-channel
    edge head."""

    residual_blocks: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, update_sn: bool = False):
        x = reflect_pad(x, 3)
        x = _SNConv(64, 7, spectral=True, dtype=self.dtype)(
            x, update_sn=update_sn)
        x = nn.relu(InstanceNorm()(x))
        for feats in (128, 256):
            x = _SNConv(feats, 4, stride=2, pad=1, spectral=True,
                        dtype=self.dtype)(x, update_sn=update_sn)
            x = nn.relu(InstanceNorm()(x))
        for _ in range(self.residual_blocks):
            x = EdgeConnectResnetBlock(256, spectral=True, dtype=self.dtype)(
                x, update_sn=update_sn)
        for feats in (128, 64):
            # SN-transposed-conv: plain transpose (SN on transposes is not
            # load-bearing for capability parity)
            x = TorchConvTranspose(feats, 4, 2, 1, dtype=self.dtype)(x)
            x = nn.relu(InstanceNorm()(x))
        x = reflect_pad(x, 3)
        x = nn.Conv(1, (7, 7), padding="VALID", dtype=self.dtype)(x)
        return nn.sigmoid(x)


class PatchDiscriminator70(nn.Module):
    """EdgeConnect ``Discriminator`` (``src/networks.py:281-325``): 5
    spectral-normalized convs; returns (patch logits/probs, feature list)."""

    in_features: int = 3
    use_sigmoid: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, update_sn: bool = False):
        feats = []
        spec = [(64, 2), (128, 2), (256, 2), (512, 1), (1, 1)]
        for i, (f, s) in enumerate(spec):
            x = _SNConv(f, 4, stride=s, pad=1, use_bias=False, spectral=True,
                        dtype=self.dtype)(x, update_sn=update_sn)
            if i < 4:
                x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        out = nn.sigmoid(x) if self.use_sigmoid else x
        return out, feats


# ---------------------------------------------------------------------------
# pix2pix discriminators + GAN loss — src/networks.py:2057-2160
# ---------------------------------------------------------------------------


class NLayerDiscriminator(nn.Module):
    """pix2pix PatchGAN (``src/networks.py:2057-2103``), InstanceNorm
    variant."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * mult, (4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
            x = nn.leaky_relu(InstanceNorm()(x), 0.2)
        mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * mult, (4, 4), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype)(x)
        x = nn.leaky_relu(InstanceNorm()(x), 0.2)
        return nn.Conv(1, (4, 4), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype)(x)


class PixelDiscriminator(nn.Module):
    """pix2pix 1x1 PixelGAN (``src/networks.py:2105-2134``)."""

    ndf: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ndf, (1, 1), dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.ndf * 2, (1, 1), dtype=self.dtype)(x)
        x = nn.leaky_relu(InstanceNorm()(x), 0.2)
        return nn.Conv(1, (1, 1), dtype=self.dtype)(x)


def lsgan_loss(pred: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
    """``GANLoss(use_lsgan=True)`` (``src/networks.py:2136-2160``): MSE to a
    constant 1/0 target."""
    target = 1.0 if target_is_real else 0.0
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))


# ---------------------------------------------------------------------------
# ESRGAN / EDSR blocks — src/block.py:144-258
# ---------------------------------------------------------------------------


class EDSRResBlock(nn.Module):
    """``ResNetBlock`` 3-3 style with residual scaling (``src/block.py:144``)."""

    features: int
    res_scale: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype)(h)
        return x + h * self.res_scale


class ResidualDenseBlock5C(nn.Module):
    """``ResidualDenseBlock_5C`` (``src/block.py:177-210``): 5 densely
    connected convs with LeakyReLU, 0.2-scaled residual."""

    features: int
    growth: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        inputs = x
        for i in range(4):
            h = nn.Conv(self.growth, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype)(inputs)
            h = nn.leaky_relu(h, 0.2)
            inputs = jnp.concatenate([inputs, h], axis=-1)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      dtype=self.dtype)(inputs)
        return x + 0.2 * out


class RRDB(nn.Module):
    """``RRDB`` (``src/block.py:212-233``): 3 chained RDBs, 0.2-scaled
    residual."""

    features: int
    growth: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = x
        for _ in range(3):
            h = ResidualDenseBlock5C(self.features, self.growth,
                                     dtype=self.dtype)(h)
        return x + 0.2 * h


# ---------------------------------------------------------------------------
# CRN extras — src/crn_model.py:310-602
# ---------------------------------------------------------------------------


class AutoEncoder(nn.Module):
    """``AutoEncoder`` (``src/crn_model.py:310-329``): 6x [ConvBlock,
    maxpool/2] image embedder."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        spec = ((2, 16), (2, 32), (3, 64), (3, 64), (3, 128), (3, 128))
        for r, c in spec:
            x = ConvBlock(r, c, dtype=self.dtype)(x)
            x = _maxpool(x, 1)
        return x


class CRNAuto(nn.Module):
    """``CRN_Auto`` (``src/crn_model.py:331-402``): a CRN whose deepest
    decoder level is additionally conditioned on an AutoEncoder embedding of
    the source image."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, label: jnp.ndarray, sp: int, src_img: jnp.ndarray):
        embed = AutoEncoder(dtype=self.dtype)(src_img)
        enc_spec = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512), (3, 512))
        pools = []
        x = label
        for r, c in enc_spec:
            x = ConvBlock(r, c, dtype=self.dtype)(x)
            x = avg_pool_3x3s2(x)
            pools.append(x)

        net = None
        for lvl in range(6, 0, -1):
            size = sp // (2 ** lvl)
            down = resize_bilinear(label, (size, size), align_corners=True)
            parts = [down, pools[lvl - 1]]
            if lvl == 6:
                parts.append(resize_bilinear(embed, (size, size),
                                             align_corners=True))
            if net is not None:
                parts.append(net)
            x = jnp.concatenate(parts, axis=-1)
            x = ConvBlock(2, 512 if lvl > 1 else 256, dtype=self.dtype)(x)
            up = sp // (2 ** (lvl - 1))
            net = resize_bilinear(x, (up, up), align_corners=True)

        x = jnp.concatenate([label, net], axis=-1)
        net = ConvBlock(2, 256, dtype=self.dtype)(x)
        return nn.Conv(3, (1, 1), dtype=self.dtype)(net)


class SpatioTempoCRN(nn.Module):
    """``SpatioTempoCRN`` (``src/crn_model.py:404-602``): a twin-stream CRN
    over (current, previous) labels whose every decoder level also sees the
    other stream's encoder features warped by the inter-frame flow.

    ``flow`` is a dense (B, H, W, 2) backward flow in normalized [-1, 1]
    grid units (the reference computes it with a frozen FlowNetSD on the IUV
    pair — use ``models.flownet.FlowNetSD``; at test time it passes zeros).
    Returns (current, previous) syntheses; the training losses (VGG-L1 per
    stream + FlowNetSD flow consistency) live in ``losses_extra``."""

    ngf: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, label, prev_label, sp: int, flow):
        enc_spec = ((2, 64), (2, 128), (3, 256), (3, self.ngf),
                    (3, self.ngf), (3, self.ngf))
        blocks = [ConvBlock(r, c, dtype=self.dtype) for r, c in enc_spec]

        def encode(x):
            pools = []
            for blk in blocks:
                x = avg_pool_3x3s2(blk(x))
                pools.append(x)
            return pools

        pools, prev_pools = encode(label), encode(prev_label)

        def base_grid(size):
            ys, xs = jnp.meshgrid(
                jnp.linspace(-1.0, 1.0, size), jnp.linspace(-1.0, 1.0, size),
                indexing="ij")
            return jnp.broadcast_to(
                jnp.stack([xs, ys], -1), (label.shape[0], size, size, 2))

        dec = [ConvBlock(2, self.ngf if lvl > 1 else 256, dtype=self.dtype)
               for lvl in range(6, 0, -1)]

        net = prev_net = None
        for i, lvl in enumerate(range(6, 0, -1)):
            size = sp // (2 ** lvl)
            down = resize_bilinear(label, (size, size), align_corners=True)
            prev_down = resize_bilinear(prev_label, (size, size),
                                        align_corners=True)
            fl = resize_nearest(flow, (size, size))
            grid = base_grid(size)
            warped_prev = grid_sample(prev_pools[lvl - 1], grid + fl,
                                      padding_mode="border")
            warped_cur = grid_sample(pools[lvl - 1], grid - fl,
                                     padding_mode="border")
            parts = [down, pools[lvl - 1]]
            prev_parts = [prev_down, prev_pools[lvl - 1]]
            if net is not None:
                parts.append(net)
                prev_parts.append(prev_net)
            parts.append(warped_prev)
            prev_parts.append(warped_cur)
            up = sp // (2 ** (lvl - 1))
            x = dec[i](jnp.concatenate(parts, axis=-1))
            px = dec[i](jnp.concatenate(prev_parts, axis=-1))
            net = resize_bilinear(x, (up, up), align_corners=True)
            prev_net = resize_bilinear(px, (up, up), align_corners=True)

        final = ConvBlock(2, 256, dtype=self.dtype)
        head = nn.Conv(3, (1, 1), dtype=self.dtype)
        out = head(final(jnp.concatenate([label, net], axis=-1)))
        prev_out = head(final(jnp.concatenate([prev_label, prev_net],
                                              axis=-1)))
        return out, prev_out
