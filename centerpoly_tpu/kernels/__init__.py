from .dcn_pallas import (
    deform_conv2d_pallas, pallas_supported, PALLAS_DCN_ENV)

__all__ = ["deform_conv2d_pallas", "pallas_supported", "PALLAS_DCN_ENV"]
