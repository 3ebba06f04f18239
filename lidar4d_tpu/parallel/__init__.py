from .mesh import make_mesh, shard_rays, replicate

__all__ = ["make_mesh", "shard_rays", "replicate"]
