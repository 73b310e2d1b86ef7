"""GG near/far Pallas kernel vs the reference jnp implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from dual_space_nerf_tpu.data.synthetic import make_scene
from dual_space_nerf_tpu.geometry import gg_near_far
from dual_space_nerf_tpu.ops.gg_pallas import gg_near_far_pallas

# interpret-mode Pallas / torch-reference parity: the heavy tier.
# Fast CI runs 'pytest -m "not slow"'; the full battery runs everything.
pytestmark = pytest.mark.slow


def test_gg_pallas_matches_jnp(rng_np):
    scene = make_scene(n_theta=14, n_phi=12)
    verts = jnp.asarray(scene.verts_world)
    R = 300
    eye = (-scene.R.T @ scene.T).ravel()
    targets = scene.verts_world[rng_np.integers(0, len(scene.verts_world), R)]
    d = (targets + 0.05 * rng_np.standard_normal((R, 3)) - eye).astype(np.float32)
    ray_o = jnp.asarray(np.broadcast_to(eye, (R, 3)), jnp.float32)
    ray_d = jnp.asarray(d)
    near = jnp.full((R,), 0.5, jnp.float32)
    far = jnp.full((R,), 3.0, jnp.float32)

    n1, f1 = gg_near_far(ray_o, ray_d, near, far, verts, gamma=0.05)
    n2, f2 = gg_near_far_pallas(
        ray_o, ray_d, near, far, verts, gamma=0.05, interpret=True
    )
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-4)
    # some rays must actually hit (tightened) and some miss (unchanged)
    hit = ~np.isclose(np.asarray(n2), 0.5)
    assert hit.sum() > R // 2


def _rays_at(scene, rng_np, r, miss_frac=0.0):
    eye = (-scene.R.T @ scene.T).ravel()
    targets = scene.verts_world[rng_np.integers(0, len(scene.verts_world), r)]
    targets = targets + 0.05 * rng_np.standard_normal((r, 3))
    n_miss = int(r * miss_frac)
    if n_miss:
        # aim the first n_miss rays far away from every vertex
        targets[:n_miss] = scene.verts_world.max(0) + 50.0
    d = (targets - eye).astype(np.float32)
    return (
        jnp.asarray(np.broadcast_to(eye, (r, 3)), jnp.float32),
        jnp.asarray(d),
        jnp.full((r,), 0.5, jnp.float32),
        jnp.full((r,), 3.0, jnp.float32),
    )


def test_gg_pallas_r_not_multiple_of_block(rng_np):
    """R=257 exercises the padded tail block (block size 256)."""
    scene = make_scene(n_theta=14, n_phi=12)
    verts = jnp.asarray(scene.verts_world)
    ray_o, ray_d, near, far = _rays_at(scene, rng_np, 257)
    n1, f1 = gg_near_far(ray_o, ray_d, near, far, verts, gamma=0.05)
    n2, f2 = gg_near_far_pallas(
        ray_o, ray_d, near, far, verts, gamma=0.05, interpret=True
    )
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-4)


def test_gg_pallas_vertex_padding_columns(rng_np):
    """V=1030 (not a multiple of the 1024 vertex tile): padded columns must
    never register as sphere hits."""
    scene = make_scene(n_theta=14, n_phi=12)
    verts_np = scene.verts_world[
        rng_np.permutation(len(scene.verts_world))[:1030]
    ]
    verts = jnp.asarray(verts_np)
    ray_o, ray_d, near, far = _rays_at(scene, rng_np, 128)
    n1, f1 = gg_near_far(ray_o, ray_d, near, far, verts, gamma=0.05)
    n2, f2 = gg_near_far_pallas(
        ray_o, ray_d, near, far, verts, gamma=0.05, interpret=True
    )
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-4)


def test_gg_pallas_no_hit_falls_back_to_aabb(rng_np):
    """Rays that intersect no vertex sphere keep their AABB near/far."""
    scene = make_scene(n_theta=14, n_phi=12)
    verts = jnp.asarray(scene.verts_world)
    ray_o, ray_d, near, far = _rays_at(scene, rng_np, 64, miss_frac=1.0)
    n2, f2 = gg_near_far_pallas(
        ray_o, ray_d, near, far, verts, gamma=0.05, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(n2), np.asarray(near))
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(far))


def test_gg_pallas_mixed_hit_and_miss(rng_np):
    """Half the rays miss; per-ray fallback must not leak across lanes."""
    scene = make_scene(n_theta=14, n_phi=12)
    verts = jnp.asarray(scene.verts_world)
    ray_o, ray_d, near, far = _rays_at(scene, rng_np, 200, miss_frac=0.5)
    n1, f1 = gg_near_far(ray_o, ray_d, near, far, verts, gamma=0.05)
    n2, f2 = gg_near_far_pallas(
        ray_o, ray_d, near, far, verts, gamma=0.05, interpret=True
    )
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-4)
    assert np.allclose(np.asarray(n2)[:100], 0.5)      # misses untouched
    assert not np.allclose(np.asarray(n2)[100:], 0.5)  # hits tightened
