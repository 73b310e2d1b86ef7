"""GG near/far Pallas kernel vs the reference jnp implementation."""

import jax.numpy as jnp
import numpy as np

from dual_space_nerf_tpu.data.synthetic import make_scene
from dual_space_nerf_tpu.geometry import gg_near_far
from dual_space_nerf_tpu.ops.gg_pallas import gg_near_far_pallas


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
