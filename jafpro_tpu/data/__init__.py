from jafpro_tpu.data.texture import (  # noqa: F401
    atlas_to_parts,
    parts_to_atlas,
    texture_warp,
    unwrap_texture,
    iuv_to_part_masks,
)
from jafpro_tpu.data.angles import compute_angle, select_reference_frames  # noqa: F401
