"""jafpro_tpu: a TPU-native (JAX/Flax/Pallas/pjit) framework for multi-reference
human video motion transfer, re-designed from scratch with the capabilities of
JAFPro (ACM MM 2020).

Layers (bottom to top):
  ops/       shared sampling + image primitives (grid_sample, resize, pooling,
             correlation, channelnorm) — the TPU-native equivalents of the
             reference's CUDA packages.
  geometry/  SMPL linear-blend skinning, weak-perspective projection, the
             face-index/weight-map rasterizer (XLA + Pallas), and the
             barycentric SMPL flow engine.
  models/    Flax modules: ConvLSTM texture accumulation, 24-part global
             inpainter, CRN generators, propagation net, discriminators, VGG.
  data/      texture atlas unwrap/warp, angle-based reference selection,
             dataset loaders (file-layout compatible with DanceVideo) and
             synthetic data for tests.
  parallel/  mesh construction and sharding helpers (pjit data parallelism).
  train/     the four-stage GAN training curriculum.
  pipeline   the fused end-to-end generator (accumulate -> inpaint -> warp ->
             refine -> bg -> fuse -> SMPL-flow propagate).
"""

__version__ = "0.1.0"

from jafpro_tpu.config import Config, get_general_options  # noqa: F401
