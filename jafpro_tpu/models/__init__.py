from jafpro_tpu.models.conv_lstm import ConvLSTMCell, ConvLSTM  # noqa: F401
from jafpro_tpu.models.accumulate import AccumulateLSTM  # noqa: F401
from jafpro_tpu.models.inpainter import UNetInpainter  # noqa: F401
from jafpro_tpu.models.crn import CRN, CRNSmall, CRNSmaller  # noqa: F401
from jafpro_tpu.models.propagation import Propagation3DFlowNet  # noqa: F401
from jafpro_tpu.models.discriminators import (  # noqa: F401
    ImageDiscriminator,
    FaceDiscriminator,
)
from jafpro_tpu.models.vgg import VGG19Features  # noqa: F401
from jafpro_tpu.models.flownet import FlowNetSD, FlowNetC  # noqa: F401
from jafpro_tpu.models.hmr import HumanModelRecovery, ThetaRegressor  # noqa: F401
from jafpro_tpu.models.ablations import (  # noqa: F401
    AccumulateAvgFusion,
    AccumulateMask,
    AccumulateMaxFusion,
    AccumulatePlain,
    AutoEncoder,
    BlendingModule,
    CRNAuto,
    EdgeGenerator,
    InpaintGenerator,
    MaxFusionModule,
    NLayerDiscriminator,
    PatchDiscriminator70,
    PixelDiscriminator,
    PredictiveModule,
    RRDB,
    SpatioTempoCRN,
    UNetGenerator,
    UNetSE,
    UNetTA,
)
