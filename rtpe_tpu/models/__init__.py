"""Flax model zoo: HigherHRNet teacher + the CAM student family."""

from .hrnet import HRNetConfig, PoseHigherHRNet, StageCfg, w48_config  # noqa: F401
from .hrnet_packed import (  # noqa: F401
    calibrate_act_scales,
    load_act_scales,
    pack_w48_params,
    packed_forward,
    quantize_packed,
    save_act_scales,
)
from .stem import STEM_OUT_CHANS, StemHRNet  # noqa: F401
from .students import (  # noqa: F401
    AttentionStudent,
    AttentionStudentSteps,
    CamStudent,
    ContextAwareModule,
    MultistageStudent,
    RefinerStudent,
    SELayer,
    SkipConv,
)
