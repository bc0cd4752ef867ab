"""Pure-array TPU-friendly kernels.

Every op here is functional, jit-safe (static shapes, no Python control flow on
traced values), and unit-tested against NumPy / torch-CPU oracles.
"""

from aip_tpu.ops.adain import (
    calc_mean_std,
    adain,
    coral,
)
from aip_tpu.ops.image import (
    resize_bilinear,
    resize_nearest,
    resize_bicubic,
    resize_smaller_edge,
    reflection_pad_2d,
    center_crop,
)
from aip_tpu.ops.depth import compute_stylization_strength_map
from aip_tpu.ops.metrics import mse, psnr, ssim
