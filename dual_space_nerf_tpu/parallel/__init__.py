from .distributed import (
    global_ray_mesh,
    globalize_tree,
    is_multiprocess,
    maybe_initialize_distributed,
    replicated_shardings,
)
from .mesh import local_ray_mesh, make_ray_mesh, pad_rays_for_mesh

__all__ = [
    "global_ray_mesh",
    "globalize_tree",
    "is_multiprocess",
    "local_ray_mesh",
    "make_ray_mesh",
    "maybe_initialize_distributed",
    "pad_rays_for_mesh",
    "replicated_shardings",
]
