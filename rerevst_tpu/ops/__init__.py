"""Core numerical ops shared by the model and the losses.

Every op is a pure function on NHWC arrays, shaped for XLA: static shapes,
no Python control flow on traced values, reductions expressed so they fuse.
"""

from rerevst_tpu.ops.image import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    denormalize,
    normalize,
    rgb_to_luma_reversed,
    pad_reflect_multiple,
    crop_back,
)
from rerevst_tpu.ops.stats import (  # noqa: F401
    instance_moments,
    mean_std,
)
from rerevst_tpu.ops.warp import flow_warp, grid_sample  # noqa: F401
from rerevst_tpu.ops.resize import resize_bilinear, upsample_nearest_2x  # noqa: F401
from rerevst_tpu.ops.blur import box_blur, gaussian_blur, gaussian_kernel_1d  # noqa: F401
