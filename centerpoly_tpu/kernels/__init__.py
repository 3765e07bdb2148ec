from .dcn_pallas import (
    deform_conv2d_pallas, pallas_supported, PALLAS_DCN_ENV)
from .dcn_halo import deform_conv2d_halo, halo_supported
from .dcn_rowband import deform_conv2d_rowband, rowband_supported

__all__ = ["deform_conv2d_pallas", "pallas_supported", "PALLAS_DCN_ENV",
           "deform_conv2d_halo", "halo_supported",
           "deform_conv2d_rowband", "rowband_supported"]
