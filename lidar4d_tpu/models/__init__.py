from .hash_field import HashGrid4D
from .planes_field import Planes4D
from .flow_field import FlowField
from .lidar4d import LiDAR4DField, LiDAR4DConfig
from .renderer import render_rays, render_staged
from .unet import UNet

__all__ = [
    "HashGrid4D",
    "Planes4D",
    "FlowField",
    "LiDAR4DField",
    "LiDAR4DConfig",
    "render_rays",
    "render_staged",
    "UNet",
]
