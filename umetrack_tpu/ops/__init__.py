from . import pallas_resample, resample
from .pallas_resample import pallas_bilinear_sample
from .resample import (
    bilinear_sample,
    fisheye_to_pinhole_coords,
    resample_images,
    warp_fisheye_to_pinhole,
)

__all__ = [
    "pallas_resample",
    "pallas_bilinear_sample",
    "resample",
    "bilinear_sample",
    "fisheye_to_pinhole_coords",
    "resample_images",
    "warp_fisheye_to_pinhole",
]
