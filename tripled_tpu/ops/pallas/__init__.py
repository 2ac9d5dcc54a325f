"""Pallas TPU kernels for the view-synthesis hot loop."""

from tripled_tpu.ops.pallas.photometric import (
    fused_min_reprojection,
    pallas_available,
)
