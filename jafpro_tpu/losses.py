"""Loss functions: masked atlas L1, Caffe-VGG perceptual + L1, BCE GAN.

Reference semantics:
  * ``masked_atlas_l1`` — ``Accumulate_LSTM.forward`` loss block
    (``src/networks.py:1614-1639``): per-target masked L1 over
    (union of source visibility masks) AND (target visibility mask).
  * ``vgg_preprocess`` — ``src/networks.py:109-115``: (-1,1) -> 0..255 and
    Caffe mean subtraction applied channel-wise in the stored order (the
    reference applies BGR means to whatever order the tensor is in; we keep
    that per-call-site behavior for parity).
  * ``VGG_l1_loss`` — VGG feature-weighted L1 (+ plain L1), weights
    [1/2.6, 1/4.8, 1/3.7, 1/5.6, 10/1.5] (``src/networks.py:118-125``).
  * BCE GAN with sigmoid-output discriminators (``train/4:357-404``).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

VGG_LOSS_WEIGHTS = (1 / 2.6, 1 / 4.8, 1 / 3.7, 1 / 5.6, 10 / 1.5)
CRN_VGG_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)
_CAFFE_MEANS = (103.939, 116.779, 123.68)


def l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def masked_atlas_l1(
    pred_atlas: jnp.ndarray,
    tgt_atlas: jnp.ndarray,
    src_masks: jnp.ndarray,
    tgt_masks: jnp.ndarray,
) -> jnp.ndarray:
    """pred/tgt atlas: (B, H, W, 3); src_masks: (B, N, H, W) {0,1};
    tgt_masks: (B, T, H, W).  Sum over targets of L1 restricted to
    (union of src masks) & (target mask)."""
    union = jnp.max(src_masks, axis=1)  # logical OR of {0,1} masks
    total = 0.0
    for t in range(tgt_masks.shape[1]):
        area = (union * tgt_masks[:, t])[..., None]
        total = total + l1(area * pred_atlas, area * tgt_atlas)
    return total


def vgg_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """(-1, 1) NHWC -> 0..255 with Caffe mean subtraction."""
    x = 255.0 * (x + 1.0) / 2.0
    return x - jnp.asarray(_CAFFE_MEANS, x.dtype)


def vgg_feature_l1(
    feats_x: List[jnp.ndarray],
    feats_y: List[jnp.ndarray],
    weights: Sequence[float] = VGG_LOSS_WEIGHTS,
) -> jnp.ndarray:
    loss = 0.0
    for w, fx, fy in zip(weights, feats_x, feats_y):
        loss = loss + w * l1(fx, jnp.asarray(fy))
    return loss


def vgg_l1_loss(vgg_apply, vgg_params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """The reference's ``VGG_l1_loss``: perceptual + plain L1, both on
    Caffe-preprocessed inputs.  ``y`` features are treated as constants
    (the reference detaches them)."""
    import jax

    xp, yp = vgg_preprocess(x), vgg_preprocess(y)
    # recompute VGG features in the backward pass (activation memory)
    fx = jax.checkpoint(lambda a: vgg_apply(vgg_params, a))(xp)
    fy = jax.lax.stop_gradient(vgg_apply(vgg_params, yp))
    return vgg_feature_l1(fx, fy) + l1(xp, yp)


def bce(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Binary cross entropy on sigmoid outputs (torch nn.BCELoss)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def bce_masked(
    pred: jnp.ndarray, target: jnp.ndarray, valid: jnp.ndarray,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Per-sample-masked BCE: mean over the valid samples only.

    The reference drops samples with empty face bboxes from the face-GAN
    lists (``train/4:338-353``); with static shapes we mask them instead.
    """
    p = jnp.clip(pred, eps, 1.0 - eps)
    per = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    per = jnp.mean(per.reshape(per.shape[0], -1), axis=1)
    v = valid.astype(per.dtype)
    return jnp.sum(per * v) / jnp.maximum(jnp.sum(v), 1.0)
