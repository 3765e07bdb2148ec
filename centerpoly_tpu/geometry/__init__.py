from .affine import (
    get_affine_transform,
    affine_transform_points,
    transform_preds,
    warp_affine,
    warp_axis_aligned,
)
from .gaussian import (
    gaussian_radius,
    splat_gaussian,
    splat_ellipse_gaussian,
    render_heatmap,
)
from .polygon import (
    polar_to_cartesian,
    cartesian_to_polar,
    polygon_area,
    polygon_area_masked,
    clip_convex,
    polygon_intersection_area,
    polygon_iou,
)

__all__ = [
    "get_affine_transform",
    "affine_transform_points",
    "transform_preds",
    "warp_affine",
    "warp_axis_aligned",
    "gaussian_radius",
    "splat_gaussian",
    "splat_ellipse_gaussian",
    "render_heatmap",
    "polar_to_cartesian",
    "cartesian_to_polar",
    "polygon_area",
    "polygon_area_masked",
    "clip_convex",
    "polygon_intersection_area",
    "polygon_iou",
]
