from .mesh import gather_rays, make_mesh, replicate, shard_rays

__all__ = ["gather_rays", "make_mesh", "replicate", "shard_rays"]
