from jafpro_tpu.utils.logging import Logger  # noqa: F401
from jafpro_tpu.utils.profiling import step_timer, trace  # noqa: F401
