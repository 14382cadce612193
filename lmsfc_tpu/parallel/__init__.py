from .mesh import make_mesh, replicated, shard_along

__all__ = ["make_mesh", "replicated", "shard_along"]
