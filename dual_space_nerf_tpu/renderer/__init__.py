from .pipeline import (
    LightState,
    MeshBundle,
    RayBatch,
    RenderSettings,
    resolve_mlp_chunk,
    density_grid,
    normal_canonical_to_world,
    render_rays,
    warp_world_to_canonical,
)

__all__ = [
    "LightState",
    "MeshBundle",
    "RayBatch",
    "RenderSettings",
    "resolve_mlp_chunk",
    "density_grid",
    "normal_canonical_to_world",
    "render_rays",
    "warp_world_to_canonical",
]
