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
from aip_tpu.ops.metrics import mse, psnr, ssim, l1_loss, l2_loss
from aip_tpu.ops.color import (
    rgb_to_lab,
    lab_to_rgb,
    weighted_pca1,
    masked_cdf_match,
    harmonize_foreground,
)
from aip_tpu.ops.gram import gram_matrix
from aip_tpu.ops.sh import eval_sh, rgb_to_sh, sh_to_rgb
from aip_tpu.ops.quaternion import (
    build_rotation,
    build_scaling_rotation,
    covariance_from_scaling_rotation,
    inverse_sigmoid,
)
from aip_tpu.ops.flow import estimate_flow, warp_image, blend_images
from aip_tpu.ops.knn import mean_knn_sq_dist
from aip_tpu.ops.morton import morton_encode, morton_argsort
from aip_tpu.ops.palette import (
    recolor_rgb,
    recolor_lab,
    floyd_steinberg,
    adjust_brightness_contrast,
)
