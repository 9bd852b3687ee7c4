from jafpro_tpu.train.common import (  # noqa: F401
    TrainState,
    sample_reference_curriculum,
)
from jafpro_tpu.train.stage1 import make_stage1_step  # noqa: F401
from jafpro_tpu.train.stage2 import make_stage2_step  # noqa: F401
from jafpro_tpu.train.stage34 import make_stage3_step, make_stage4_step  # noqa: F401
