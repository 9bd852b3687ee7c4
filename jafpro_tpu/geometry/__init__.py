from jafpro_tpu.geometry.smpl import SMPLModel, batch_rodrigues  # noqa: F401
from jafpro_tpu.geometry.projection import (  # noqa: F401
    orthographic_proj_withz_idrot,
    look_at,
    default_eye,
)
from jafpro_tpu.geometry.rasterizer import rasterize_fim_wim  # noqa: F401
from jafpro_tpu.geometry.flow import SMPLFlowEngine, cal_bc_transform  # noqa: F401
