from .kitti360 import KITTI360Dataset, SEQUENCE_RANGES
from .synthetic import generate_synthetic_sequence

__all__ = ["KITTI360Dataset", "SEQUENCE_RANGES", "generate_synthetic_sequence"]
