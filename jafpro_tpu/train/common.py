"""Shared training machinery: state container, per-module optimizers, the
reference-count curriculum, and synthetic batches for tests.

The reference's host-side ``np.random`` curriculum branching
(``train/4.convLSTM_flowpro_interval.py:249-267``) is reproduced exactly on
the host; inside jit it is just a (B, N) reference mask + one propagation
source index — static shapes, no retracing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class TrainState:
    """Per-module parameter trees and optimizer states.

    params keys follow the reference checkpoint names:
    accu / inpaint / bg / refine / pro / D / FD (+ frozen 'vgg').
    """

    params: Dict[str, Any]
    opt_states: Dict[str, Any]
    txs: Dict[str, optax.GradientTransformation]  # static (not traced)
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_states, self.step), self.txs

    @classmethod
    def tree_unflatten(cls, txs, children):
        params, opt_states, step = children
        return cls(params, opt_states, txs, step)

    @classmethod
    def create(
        cls,
        params: Dict[str, Any],
        lrs: Mapping[str, Any],
    ) -> "TrainState":
        """lrs: module -> learning rate (float or optax schedule).  Modules
        absent from ``lrs`` are frozen (no optimizer)."""
        txs = {k: optax.adam(v) for k, v in lrs.items()}
        opt_states = {k: txs[k].init(params[k]) for k in txs}
        return cls(params=params, opt_states=opt_states, txs=txs,
                   step=jnp.zeros((), jnp.int32))

    def apply_gradients(self, grads: Dict[str, Any]) -> "TrainState":
        new_params = dict(self.params)
        new_opt = dict(self.opt_states)
        for k, g in grads.items():
            updates, new_opt[k] = self.txs[k].update(
                g, self.opt_states[k], self.params[k])
            new_params[k] = optax.apply_updates(self.params[k], updates)
        return dataclasses.replace(
            self, params=new_params, opt_states=new_opt, step=self.step + 1)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: s.tree_flatten(),
    TrainState.tree_unflatten,
)


def multistep_lr(base: float, milestones=(100_000, 150_000), gamma: float = 0.3):
    """torch MultiStepLR equivalent (reference ``train/1:94``)."""
    return optax.piecewise_constant_schedule(
        base, {int(m): gamma for m in milestones})


def sample_reference_curriculum(
    rng: np.random.RandomState, max_refs: int = 4
) -> Tuple[np.ndarray, int]:
    """The reference's 1..4-reference curriculum: pick k refs w.p. 1/4 each
    and one propagation source among them.  Returns (ref_mask (N,), prosrc)."""
    r = rng.random_sample()
    k = min(int(r * 4) + 1, max_refs)
    chosen = rng.choice(max_refs, k, replace=False)
    prosrc = int(chosen[rng.choice(k)])
    mask = np.zeros((max_refs,), np.float32)
    mask[chosen] = 1.0
    return mask, prosrc


def apply_curriculum(
    batch: Dict[str, np.ndarray], stage: int, rng: np.random.RandomState,
    max_refs: int = 4,
) -> Dict[str, np.ndarray]:
    """Apply the host-side reference curriculum to a stacked raw batch.

    Stage 1 trains on all references (reference ``train/1``); stage 2 masks a
    random 1..4 subset (``train/2:155-163``); stages 3/4 additionally pick a
    random propagation source among the chosen refs and promote its
    image/cam/verts to the ``prev_*`` fields (``train/4:249-267``), dropping
    the per-ref source arrays from the device batch.  Works on batches from
    the shard reader ((B, R, ...) source arrays) and on stacked per-sample
    loads alike.
    """
    B = batch["src_parts"].shape[0]
    if stage == 1:
        batch.setdefault("ref_mask", np.ones((B, max_refs), np.float32))
        return batch
    masks, prosrcs = zip(*[sample_reference_curriculum(rng, max_refs)
                           for _ in range(B)])
    batch["ref_mask"] = np.stack(masks).astype(np.float32)
    if stage >= 3 and "src_imgs" in batch:
        pr = np.asarray(prosrcs)
        ar = np.arange(B)
        batch["prev_img"] = np.ascontiguousarray(batch["src_imgs"][ar, pr])
        batch["prev_cam"] = np.ascontiguousarray(batch["src_cams"][ar, pr])
        batch["prev_verts"] = np.ascontiguousarray(
            batch["src_verts"][ar, pr])
        for k in ("src_imgs", "src_cams", "src_verts", "src_frame_indices"):
            batch.pop(k, None)
    return batch


def normalize_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Device-side inverse of the uint8 shard wire format (traced inside the
    step jit; see ``data.shardio.encode_field_u8``).

    uint8 fields expand to their float semantics — symmetric (-1,1) images,
    (0,1) masks, raw 0..255 IUV codes — and ``tgt_iuv`` is derived from
    ``tgt_iuv255`` when absent.  float32 batches (synthetic sources, tests,
    the per-sample loader path) pass through unchanged, so every step
    function accepts both formats.  Rationale: the H2D hop is the training
    loop's bandwidth floor on the remote-TPU transport; normalization is
    free VPU work fused into the first consumers."""
    from jafpro_tpu.data.shardio import (
        U8_RAW_FIELDS, U8_SYMMETRIC_FIELDS, U8_UNIT_FIELDS)

    out = dict(batch)
    for k, v in batch.items():
        if v.dtype != jnp.uint8:
            continue
        f = v.astype(jnp.float32)
        if k in U8_SYMMETRIC_FIELDS:
            out[k] = f / 255.0 * 2.0 - 1.0
        elif k in U8_UNIT_FIELDS:
            out[k] = f / 255.0
        elif k in U8_RAW_FIELDS:
            out[k] = f
        else:  # unknown uint8 field: value-preserving float cast
            out[k] = f
    if "tgt_iuv" not in out and "tgt_iuv255" in out:
        out["tgt_iuv"] = (out["tgt_iuv255"] / 255.0 - 0.5) * 2.0
    return out


# ---------------------------------------------------------------------------
# synthetic data (tests / benchmarks without the DanceVideo dataset)
# ---------------------------------------------------------------------------

def synthetic_quad_mesh(n: int = 8, z: float = 2.0):
    """A planar grid mesh facing the camera: (verts (V, 3), faces (F, 3))."""
    ys, xs = np.meshgrid(np.linspace(-0.6, 0.6, n), np.linspace(-0.4, 0.4, n),
                         indexing="ij")
    verts = np.stack([xs, ys, np.full_like(xs, z)], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b = i * n + j, i * n + j + 1
            c, d = (i + 1) * n + j, (i + 1) * n + j + 1
            faces.append([a, c, b])
            faces.append([b, c, d])
    return verts.astype(np.float32), np.asarray(faces, np.int32)


def synthetic_batch(
    rng: np.random.RandomState,
    batch: int = 1,
    num_refs: int = 4,
    num_parts: int = 24,
    part_size: int = 32,
    image_size: int = 64,
    num_verts: int = 64,
    num_targets: int = 1,
) -> Dict[str, np.ndarray]:
    """Random tensors with the stage-4 batch contract's shapes and ranges."""
    B, N, P, p, S = batch, num_refs, num_parts, part_size, image_size
    iuv = np.zeros((B, S, S, 3), np.float32)
    iuv[..., 0] = rng.randint(0, num_parts + 1, size=(B, S, S))
    iuv[..., 1:] = rng.randint(0, 256, size=(B, S, S, 2))
    return {
        "src_parts": rng.uniform(-1, 1, (B, N, P, p, p, 3)).astype(np.float32),
        "src_mask_parts": (rng.rand(B, N, P, p, p) > 0.5).astype(np.float32),
        "tgt_parts": rng.uniform(-1, 1, (B, num_targets, P, p, p, 3)).astype(np.float32),
        "tgt_mask_parts": (rng.rand(B, num_targets, P, p, p) > 0.5).astype(np.float32),
        "tgt_iuv255": iuv,
        "tgt_iuv": (iuv / 255.0 - 0.5) * 2.0,
        "tgt_img": rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32),
        "src_img_first": rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32),
        "bg_incomplete": rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32),
        "prev_img": rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32),
        "smpl_mask": (rng.rand(B, S, S, 1) > 0.3).astype(np.float32),
        "face_bbox": np.tile(
            np.asarray([S // 4, 3 * S // 4, S // 8, S // 2], np.float32),
            (B, 1)),
        "prev_cam": np.tile(np.asarray([1.0, 0, 0], np.float32), (B, 1)),
        "tgt_cam": np.tile(np.asarray([1.0, 0, 0], np.float32), (B, 1)),
        "prev_verts": rng.uniform(-0.5, 0.5, (B, num_verts, 3)).astype(np.float32)
        + np.asarray([0, 0, 2.0], np.float32),
        "tgt_verts": rng.uniform(-0.5, 0.5, (B, num_verts, 3)).astype(np.float32)
        + np.asarray([0, 0, 2.0], np.float32),
        "ref_mask": np.ones((B, N), np.float32),
        "prosrc": np.zeros((B,), np.int32),
    }
