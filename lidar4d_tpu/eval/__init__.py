from .meters import DepthMeter, IntensityMeter, PointsMeter, RaydropMeter
from .ssim import structural_similarity

__all__ = [
    "DepthMeter",
    "IntensityMeter",
    "PointsMeter",
    "RaydropMeter",
    "structural_similarity",
]
