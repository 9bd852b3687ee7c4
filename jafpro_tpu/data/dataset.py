"""DanceVideo clip loading (host-side input pipeline).

File protocol (reference ``src/utils.py:11-58`` + ``src/data.py``):
  <data_root>/<mode>/<vid>/   frameNNN.jpg            images (256x256)
                              frameNNN*IUV*.png       DensePose IUV maps
                              frameNNN*text*.png      800x1200 texture atlases
                              frameNNN*mask*.png      800x1200 atlas masks
  <smpl_root>/<mode>/<vid>/pose_shape.pkl             cams(3) pose(72)
                                                      shape(10) vertices(V,3)
  <mask_root>/<mode>/<vid>/*.png                      SMPL-rendered masks

``load_clip`` assembles the whole-clip dict consumed by
``jafpro_tpu.infer.VideoGenerator`` including the angle-based reference
selection (reference ``src/data.py:499-528``).  Training iterators yield the
stage batch dicts with the curriculum applied on host.

For environments without the dataset, ``synthetic_clip`` mirrors the same
contract (tests, benchmarks).
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from jafpro_tpu.data.angles import compute_angle
from jafpro_tpu.data.texture import masks_to_atlas


def _frame_number(path: str) -> int:
    m = re.findall(r"(\d+)", os.path.basename(path))
    return int(m[-1]) if m else 0


def list_clip_files(vid_path: str) -> Dict[str, List[str]]:
    """Split a clip directory into sorted image/IUV/texture/mask lists."""
    files = {"img": [], "iuv": [], "text": [], "mask": []}
    for name in sorted(os.listdir(vid_path)):
        p = os.path.join(vid_path, name)
        if "IUV" in name:
            files["iuv"].append(p)
        elif "mask" in name:
            files["mask"].append(p)
        elif "text" in name:
            files["text"].append(p)
        elif "bbox" in name or name.endswith(".pkl"):
            continue
        else:
            files["img"].append(p)
    for k in files:
        files[k].sort(key=_frame_number)
    return files


def _imread(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img


def select_frames_by_angle(angles: np.ndarray, num_inputs: int) -> np.ndarray:
    """Reference frame picker (``src/data.py:499-528``)."""
    T = len(angles)
    order = np.argsort(angles)
    if num_inputs == 1:
        return np.array([int(np.argmin(np.abs(angles)))])
    if num_inputs == 4:
        return np.array([int(np.argmax(angles)), int(order[T // 3]),
                         int(order[(2 * T) // 3]), int(np.argmin(angles))])
    if num_inputs < 4:
        return np.array([int(np.argmax(angles)), int(order[T // 2]),
                         int(np.argmin(angles))])[:num_inputs]
    # 5
    return np.array([int(np.argmax(angles)), int(order[T // 4]),
                     int(order[T // 2]), int(order[(3 * T) // 4]),
                     int(np.argmin(angles))])


def load_clip(
    data_dir: str, smpl_dir: str, mask_dir: str, vid_name: str,
    num_refs: int = 4, rng: Optional[np.random.RandomState] = None,
) -> Dict[str, np.ndarray]:
    """Assemble the whole-clip inference dict (plus gt frames)."""
    import cv2

    vid_path = os.path.join(data_dir, vid_name)
    files = list_clip_files(vid_path)
    T = len(files["img"])

    iuv = np.stack([_imread(p) for p in files["iuv"]]).astype(np.float32)
    angles = np.array([compute_angle(iuv[i]) for i in range(T)])
    pro_frames = select_frames_by_angle(angles, num_refs)
    frames = np.clip(pro_frames, 0, 30)

    imgs = np.stack([_imread(p) for p in files["img"]]).astype(np.float32)
    imgs = (imgs / 255.0 - 0.5) * 2.0  # BGR, matching the reference

    texture = np.stack(
        [_imread(files["text"][f]) for f in frames]).astype(np.float32)
    texture = (texture / 255.0 - 0.5) * 2.0
    masks = np.stack(
        [_imread(files["mask"][f])[..., 0] for f in frames]).astype(np.float32)
    masks = masks / 255.0

    with open(os.path.join(smpl_dir, vid_name, "pose_shape.pkl"), "rb") as f:
        smpl = pickle.load(f)
    smpl_seq = np.concatenate(
        [smpl["cams"], smpl["pose"], smpl["shape"]], axis=1).astype(np.float32)

    real_mask_dir = os.path.join(mask_dir, vid_name)
    rm_files = sorted(
        (os.path.join(real_mask_dir, n) for n in os.listdir(real_mask_dir)
         if n.endswith("png")), key=_frame_number)
    smpl_mask = np.stack(
        [_imread(p)[..., :1] for p in rm_files]).astype(np.float32) / 255.0

    # mask-in-image of the first reference (for bg synthesis)
    from jafpro_tpu.data.texture import texture_warp as _  # noqa: F401

    # parts layout
    from jafpro_tpu.data.texture import atlas_to_parts
    import jax.numpy as jnp

    src_parts = np.asarray(atlas_to_parts(jnp.asarray(texture), 200))
    mask_parts = np.asarray(
        atlas_to_parts(jnp.asarray(masks[..., None]), 200))[..., 0]

    first_iuv = iuv[frames[0]]
    in_image = (first_iuv[..., 0] > 0).astype(np.float32)[..., None]
    rng = rng or np.random.RandomState(0)
    bg_incomplete = (1 - in_image) * imgs[frames[0]] + in_image * \
        rng.randn(*imgs[frames[0]].shape).astype(np.float32)

    return {
        "src_parts": src_parts[None],
        "src_mask_parts": mask_parts[None],
        "ref_mask": np.ones((1, num_refs), np.float32),
        "bg_incomplete": bg_incomplete[None],
        "src_imgs": imgs[frames],
        "chosen_frames": pro_frames.astype(np.int32),
        "tgt_iuv255": iuv,
        "tgt_iuv": (iuv / 255.0 - 0.5) * 2.0,
        "smpl_mask": smpl_mask,
        "cams": smpl_seq[:, 0:3],
        "verts": np.asarray(smpl["vertices"], np.float32),
        "gt_frames": imgs,
        "vid_name": vid_name,
    }


def list_videos(data_root: str, mode: str = "test") -> List[str]:
    d = os.path.join(data_root, mode)
    if not os.path.isdir(d):
        return []
    return sorted(n for n in os.listdir(d)
                  if os.path.isdir(os.path.join(d, n)))
