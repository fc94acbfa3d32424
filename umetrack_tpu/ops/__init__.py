from . import resample
from .resample import (
    bilinear_sample,
    fisheye_to_pinhole_coords,
    resample_images,
    warp_fisheye_to_pinhole,
)

__all__ = [
    "resample",
    "bilinear_sample",
    "fisheye_to_pinhole_coords",
    "resample_images",
    "warp_fisheye_to_pinhole",
]
