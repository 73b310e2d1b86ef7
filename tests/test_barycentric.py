"""Geometry-core unit tests: projection / barycentric round trips.

Test strategy per SURVEY.md section 4: the reference ships no tests; the
invariants here are the ones its correctness silently depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dual_space_nerf_tpu.geometry import (
    barycentric_map,
    barycentric_uv,
    project_point2mesh,
    transparent_mask,
    triangle_normal,
)


def random_triangles(rng, n):
    tris = rng.normal(size=(n, 3, 3)).astype(np.float32)
    # reject degenerate triangles
    areas = np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1
    )
    tris[areas < 1e-2] += np.eye(3, dtype=np.float32) * 2.0
    return jnp.asarray(tris)


def test_project_then_map_is_identity(rng_np):
    """world->(uv,h)->world on the SAME triangle must reproduce the point."""
    tris = random_triangles(rng_np, 256)
    pts = jnp.asarray(rng_np.normal(size=(256, 3)).astype(np.float32))
    uv, h = project_point2mesh(pts, tris)
    rebuilt = barycentric_map(uv, h, tris)
    np.testing.assert_allclose(rebuilt, pts, atol=1e-4)


def test_triangle_vertices_map_to_unit_uv():
    tri = jnp.asarray(
        [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], jnp.float32
    )
    # v0 -> (0,0); v1 (=edge01, the "v" coordinate) -> (0,1); v2 -> (1,0)
    uv0, h0 = project_point2mesh(tri[:, 0], tri)
    uv1, h1 = project_point2mesh(tri[:, 1], tri)
    uv2, h2 = project_point2mesh(tri[:, 2], tri)
    np.testing.assert_allclose(uv0, [[0.0, 0.0]], atol=1e-6)
    np.testing.assert_allclose(uv1, [[0.0, 1.0]], atol=1e-6)
    np.testing.assert_allclose(uv2, [[1.0, 0.0]], atol=1e-6)
    for h in (h0, h1, h2):
        np.testing.assert_allclose(h, [0.0], atol=1e-6)


def test_signed_distance_sign_follows_normal():
    tri = jnp.asarray(
        [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], jnp.float32
    )
    n = triangle_normal(tri)  # cross(e01, e02) = +z
    np.testing.assert_allclose(n, [[0.0, 0.0, 1.0]], atol=1e-6)
    above = jnp.asarray([[0.2, 0.2, 0.5]], jnp.float32)
    below = jnp.asarray([[0.2, 0.2, -0.5]], jnp.float32)
    _, h_above = project_point2mesh(above, tri)
    _, h_below = project_point2mesh(below, tri)
    assert h_above[0] > 0 and h_below[0] < 0
    np.testing.assert_allclose(h_above, [0.5], atol=1e-6)


def test_warp_between_two_meshes_preserves_barycentric(rng_np):
    """(uv,h) extracted on mesh A and rebuilt on mesh B, then reversed,
    round-trips — the core dual-space warp invariant."""
    tris_a = random_triangles(rng_np, 128)
    tris_b = random_triangles(rng_np, 128)
    pts = jnp.asarray(rng_np.normal(size=(128, 3)).astype(np.float32))
    uv, h = project_point2mesh(pts, tris_a)
    pts_b = barycentric_map(uv, h, tris_b)
    uv2, h2 = project_point2mesh(pts_b, tris_b)
    back = barycentric_map(uv2, h2, tris_a)
    np.testing.assert_allclose(back, pts, atol=2e-3)
    np.testing.assert_allclose(uv2, uv, atol=2e-3)
    np.testing.assert_allclose(h2, h, atol=2e-3)


def test_transparent_mask_thresholds():
    uv = jnp.asarray([[0.0, 0.0], [6.0, 0.0], [0.0, -5.0], [0.2, 0.2]])
    h = jnp.asarray([0.0, 0.0, 0.0, 0.2])
    mask = transparent_mask(uv, h)
    np.testing.assert_array_equal(mask, [False, True, True, True])


def test_barycentric_uv_interior_point():
    tri = jnp.asarray(
        [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], jnp.float32
    )
    centroid = tri.mean(axis=-2)
    uv = barycentric_uv(centroid, tri)
    np.testing.assert_allclose(uv, [[1 / 3, 1 / 3]], atol=1e-6)


def test_project_is_differentiable(rng_np):
    tris = random_triangles(rng_np, 8)
    pts = jnp.asarray(rng_np.normal(size=(8, 3)).astype(np.float32))

    def f(p):
        uv, h = project_point2mesh(p, tris)
        return jnp.sum(uv) + jnp.sum(h)

    g = jax.grad(f)(pts)
    assert np.isfinite(np.asarray(g)).all()
