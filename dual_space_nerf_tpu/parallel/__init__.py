from .mesh import local_ray_mesh, make_ray_mesh, pad_rays_for_mesh

__all__ = ["local_ray_mesh", "make_ray_mesh", "pad_rays_for_mesh"]
