"""Geometry / photometric / loss ops (pure jnp; Pallas variants in ops.pallas)."""

from tripled_tpu.ops.geometry import (
    backproject,
    project,
    disp_to_depth,
    rot_from_axisangle,
    transformation_from_parameters,
    invert_intrinsics,
    scale_intrinsics,
    warp_coords,
)
from tripled_tpu.ops.warp import grid_sample, grid_sample_block, warp_pixel_coords
from tripled_tpu.ops.ssim import ssim
from tripled_tpu.ops.image import (
    resize_bilinear,
    resize_area,
    resize_nearest,
    upsample2x_nearest,
)
from tripled_tpu.ops.losses import (
    robust_l1,
    reprojection_loss,
    min_reprojection_with_automask,
    smooth_loss,
    feature_regularization_loss,
    perceptional_loss,
)
from tripled_tpu.ops.color import rgb2lab, lab2rgb, rgb_to_l, rgb_to_gray
