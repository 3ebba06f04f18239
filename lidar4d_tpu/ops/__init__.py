from .trunc_exp import trunc_exp
from .grid_sample import grid_sample_2d
from .hash_enc import (
    HashEncoderSpec,
    hash_encode,
    hash_encode_blend,
    init_hash_table,
    lagrange_time_interp,
)
from .hash_onehot import hash_encode_auto, hash_encode_onehot
from .chamfer import chamfer_distance, chamfer_distance_fast, chamfer_loss
from .pano import (
    lidar_to_pano_with_intensities,
    lidar_to_pano,
    pano_to_lidar,
    pano_to_lidar_with_intensities,
)
from .rays import get_lidar_rays, pano_ray_directions
from .mlp import init_mlp, apply_mlp

__all__ = [
    "trunc_exp",
    "grid_sample_2d",
    "HashEncoderSpec",
    "hash_encode",
    "hash_encode_blend",
    "hash_encode_auto",
    "hash_encode_onehot",
    "lagrange_time_interp",
    "init_hash_table",
    "chamfer_distance",
    "chamfer_distance_fast",
    "chamfer_loss",
    "lidar_to_pano_with_intensities",
    "lidar_to_pano",
    "pano_to_lidar",
    "pano_to_lidar_with_intensities",
    "get_lidar_rays",
    "pano_ray_directions",
    "init_mlp",
    "apply_mlp",
]
