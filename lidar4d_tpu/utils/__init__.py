from .misc import set_seed
from .pointcloud import point_removal, range_filter

__all__ = ["set_seed", "point_removal", "range_filter"]
