from vct_tpu.i3d.model import (  # noqa: F401
    FEATURE_DIM,
    I3DTower,
    i3d_stacks,
    preprocess_i3d_frames,
    resize_center_crop,
)
from vct_tpu.i3d.convert import convert_i3d, load_i3d_state_dict  # noqa: F401
from vct_tpu.i3d.flow import (  # noqa: F401
    estimate_flow,
    preprocess_i3d_flow,
)
