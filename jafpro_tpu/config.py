"""Typed configuration for the whole framework.

Mirrors the ~25 knobs of the reference's ``options.py:4-44`` (same names where
they exist) so experiments are mappable 1:1, plus TPU-specific settings
(mesh axes, dtype policy, rasterizer backend).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple


@dataclasses.dataclass
class Config:
    # ---- sequence / sampling (reference options.py) ----
    n_sample: int = 6
    num_frames: int = 30            # frames per clip (2 s @ 15 FPS)
    frame_interval: int = 5
    use_fix_interval: bool = False
    num_ref_frames: int = 3
    maximum_ref_frames: int = 4
    # targets per textonly sample (reference options.py:23; train/1:57 keeps
    # 3).  The stage-3/4 interval loaders pass 1 explicitly — this knob
    # feeds the stage-1/2 loaders and the textonly shard spec, and MUST
    # match the value the shards were packed with (the reader now verifies
    # record-size divisibility and refuses mismatched shards)
    num_target: int = 3
    test_num_inputs: int = 1
    num_outputs: int = 2
    fix_frame: bool = True
    self_recon: bool = False
    data_aug: bool = False

    # ---- training schedule ----
    n_training_iter: int = 200_001
    test_interval: int = 1000
    validate_interval: int = 10_000
    vis_interval: int = 200
    gan_test_interval: int = 10
    model_save_interval: int = 3000
    batch_size: int = 4
    face_GAN: bool = True
    output_mask: bool = True
    resume_train: bool = False

    # ---- image / texture geometry ----
    image_size: int = 256
    part_size: int = 200            # each of the 24 DensePose parts
    atlas_grid: Tuple[int, int] = (4, 6)  # 4x6 grid -> 800x1200 atlas
    num_parts: int = 24
    face_crop_size: int = 64

    # ---- SMPL / renderer ----
    num_verts: int = 6890
    num_faces: int = 13776
    tex_size: int = 3
    viewing_angle: float = 30.0
    near: float = 0.1
    far: float = 25.0

    # ---- paths ----
    project_dir: str = "."
    model_save_dir: str = "./checkpoints"
    test_save_dir: str = "./test_results"
    data_root: str = ""
    smpl_root: str = ""
    mask_root: str = ""
    smpl_faces_path: str = ""       # .npy of (13776, 3) int32; auto-discovered
    flownet_path: str = ""
    vgg_weights_path: str = ""      # converted VGG19 weights (npz), optional

    # ---- TPU-native settings ----
    compute_dtype: str = "bfloat16"   # conv/matmul activations dtype
    # PartConv lowering for the texture nets: "blocks8" (8-part
    # block-diagonal groups — fastest measured for BOTH batch-1 inference
    # and batch-4 training), "dense" (single block-diagonal conv), or
    # "groups" (feature_group_count=P).  Identical params/numerics
    # every way (models/parts.py; TUNING.md for the measurements).
    part_conv_impl: str = "blocks8"
    param_dtype: str = "float32"
    rasterizer_backend: str = "auto"  # "auto" | "xla" | "pallas"
    rasterizer_face_chunk: int = 2048
    mesh_data_axis: str = "data"
    donate_train_state: bool = True
    # rematerialize the texture-network forward in training backward passes
    # (trades ~30% recompute for the 24-part activation memory)
    remat_training: bool = True
    # AccumulateLSTM ref-axis order: False = encode all refs in one batched
    # conv stack (fastest at inference); True = unrolled per-ref loop that
    # interleaves encoder and ConvLSTM steps so only one reference's
    # encoder activations are live (the batch-4 training-memory form).
    # Identical numerics and param tree (models/accumulate.py).
    accu_ref_major: bool = False

    isTrain: bool = True

    @property
    def atlas_height(self) -> int:
        return self.atlas_grid[0] * self.part_size

    @property
    def atlas_width(self) -> int:
        return self.atlas_grid[1] * self.part_size


def get_general_options() -> Config:
    """Reference-compatible constructor (``options.py:4-44``)."""
    cfg = Config()
    env_root = os.environ.get("JAFPRO_DATA_ROOT")
    if env_root:
        cfg.data_root = env_root
    for attr, var in (("smpl_root", "JAFPRO_SMPL_ROOT"),
                      ("mask_root", "JAFPRO_MASK_ROOT")):
        v = os.environ.get(var)
        if v:
            setattr(cfg, attr, v)
    return cfg


def default_smpl_faces_path() -> Optional[str]:
    """Locate the SMPL face-index asset without shipping it in-tree."""
    candidates = [
        os.environ.get("JAFPRO_SMPL_FACES", ""),
        os.path.join(os.path.dirname(__file__), "assets", "smpl_faces.npy"),
        "/root/reference/smpl_faces.npy",
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None
