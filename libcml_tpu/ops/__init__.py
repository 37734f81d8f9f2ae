from libcml_tpu.ops.image import (
    bilinear,
    gradient_image,
    reduce_by_two,
    build_pyramid,
    build_gradient_pyramid,
    remap_image,
    apply_photometric,
    gradient_squared_norm,
)

__all__ = [
    "bilinear",
    "gradient_image",
    "reduce_by_two",
    "build_pyramid",
    "build_gradient_pyramid",
    "remap_image",
    "apply_photometric",
    "gradient_squared_norm",
]
