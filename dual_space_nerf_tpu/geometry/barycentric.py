"""Triangle projection and barycentric re-mapping between spaces.

The core "dual space" warp: a world-space sample point is expressed as
(barycentric uv, signed height h) w.r.t. its nearest posed-SMPL triangle and
re-constructed from the *same* triangle of the canonical X-pose mesh.

Behavioral reference (re-derived, not translated):
- `utils/geo_utils.py:96-113`  (get_barycentric_coordinates)
- `utils/geo_utils.py:181-200` (project_point2mesh)
- `utils/geo_utils.py:138-156` (barycentric_map2can)
- `utils/render_utils.py:103-109` (get_transparent_mask)

All functions are shape-polymorphic over leading batch dims: points are
(..., 3) and triangles (..., 3, 3) with matching leading dims, so they fuse
cleanly under jit/vmap and shard along the point axis with no code change.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS_NORM = 1e-12


def triangle_normal(tris: jnp.ndarray) -> jnp.ndarray:
    """Unit normal n = (v1-v0) x (v2-v0) / ||.|| for triangles (..., 3, 3).

    Matches the edge order of the reference (`geo_utils.py:191-194`), which is
    also the order used by the inverse map (`geo_utils.py:149-152`) — the two
    must agree for the warp to be orientation-consistent.
    """
    v10 = tris[..., 1, :] - tris[..., 0, :]
    v20 = tris[..., 2, :] - tris[..., 0, :]
    n = jnp.cross(v10, v20)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), _EPS_NORM)


def barycentric_uv(pts_proj: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """In-plane barycentric coords of projected points.

    u is the coefficient of edge v0->v2, v of edge v0->v1
    (`geo_utils.py:96-113`). pts_proj: (..., 3); tris: (..., 3, 3) -> (..., 2).
    """
    v0 = tris[..., 2, :] - tris[..., 0, :]
    v1 = tris[..., 1, :] - tris[..., 0, :]
    v2 = pts_proj - tris[..., 0, :]

    dot00 = jnp.sum(v0 * v0, axis=-1)
    dot01 = jnp.sum(v0 * v1, axis=-1)
    dot02 = jnp.sum(v0 * v2, axis=-1)
    dot11 = jnp.sum(v1 * v1, axis=-1)
    dot12 = jnp.sum(v1 * v2, axis=-1)

    inv_deno = 1.0 / (dot00 * dot11 - dot01 * dot01)
    u = (dot11 * dot02 - dot01 * dot12) * inv_deno
    v = (dot00 * dot12 - dot01 * dot02) * inv_deno
    return jnp.stack([u, v], axis=-1)


def project_point2mesh(
    pts: jnp.ndarray, tris: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project each point onto its (already-matched) triangle's plane.

    pts: (..., 3), tris: (..., 3, 3), one triangle per point.
    Returns (uv (..., 2), signed_distance (...,)).
    Reference behavior: `geo_utils.py:181-200`.
    """
    n = triangle_normal(tris)
    signed_distance = jnp.sum((pts - tris[..., 0, :]) * n, axis=-1)
    pts_proj = pts - n * signed_distance[..., None]
    uv = barycentric_uv(pts_proj, tris)
    return uv, signed_distance


def barycentric_map(
    uv: jnp.ndarray, signed_distance: jnp.ndarray, tris: jnp.ndarray
) -> jnp.ndarray:
    """Reconstruct a point from (uv, h) on target triangles.

    p = v0 + u*(v2-v0) + v*(v1-v0) + h*n. Inverse of `project_point2mesh`
    when applied to the same triangle. Reference: `geo_utils.py:138-156`.
    uv: (..., 2), signed_distance: (...,), tris: (..., 3, 3) -> (..., 3).
    """
    v2 = tris[..., 2, :] - tris[..., 0, :]
    v1 = tris[..., 1, :] - tris[..., 0, :]
    # same edge order + eps as project_point2mesh — the pair must stay an
    # exact inverse, so the normal comes from the one shared helper
    n = triangle_normal(tris)
    pts_proj = (
        tris[..., 0, :] + uv[..., 0:1] * v2 + uv[..., 1:2] * v1
    )
    return pts_proj + signed_distance[..., None] * n


def transparent_mask(
    uv: jnp.ndarray,
    signed_distance: jnp.ndarray,
    floor: float = -4.0,
    ceil: float = 5.0,
    max_dist: float = 0.1,
) -> jnp.ndarray:
    """Points too far outside their triangle get zero density.

    Reference thresholds: uv outside [-4, 5] or |h| > 0.1
    (`render_utils.py:103-109`). Returns bool (...,).
    """
    out_of_range = jnp.logical_or(uv > ceil, uv < floor)
    mask = jnp.logical_or(out_of_range[..., 0], out_of_range[..., 1])
    return jnp.logical_or(mask, jnp.abs(signed_distance) > max_dist)
