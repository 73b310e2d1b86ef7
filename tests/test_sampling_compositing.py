"""Along-ray sampling + alpha compositing unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dual_space_nerf_tpu.geometry import (
    composite,
    gg_near_far,
    sample_along_rays,
    stratified_z,
)


def test_stratified_z_deterministic_bounds():
    near = jnp.asarray([1.0, 2.0])
    far = jnp.asarray([3.0, 6.0])
    z = stratified_z(near, far, 5)
    np.testing.assert_allclose(z[0], [1.0, 1.5, 2.0, 2.5, 3.0], atol=1e-6)
    np.testing.assert_allclose(z[1], [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-6)


def test_stratified_z_perturbed_stays_in_bins():
    near = jnp.zeros((16,))
    far = jnp.ones((16,))
    z = stratified_z(near, far, 64, rng=jax.random.key(0))
    assert (z >= 0).all() and (z <= 1).all()
    assert (jnp.diff(z, axis=-1) >= 0).all()  # monotone within each ray


def test_sample_along_rays_unnormalized_dir():
    ray_o = jnp.asarray([[1.0, 0.0, 0.0]])
    ray_d = jnp.asarray([[0.0, 2.0, 0.0]])  # NOT unit norm
    z = jnp.asarray([[0.5, 1.0]])
    pts = sample_along_rays(ray_o, ray_d, z)
    np.testing.assert_allclose(
        pts, [[[1.0, 1.0, 0.0], [1.0, 2.0, 0.0]]], atol=1e-6
    )


def test_gg_near_far_tightens_to_sphere():
    # single vertex at (0,0,5), gamma-sphere radius 0.5; ray along +z
    ray_o = jnp.zeros((2, 3))
    ray_d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])  # 2nd ray misses
    near = jnp.asarray([0.1, 0.1])
    far = jnp.asarray([10.0, 10.0])
    verts = jnp.asarray([[0.0, 0.0, 5.0]])
    n2, f2 = gg_near_far(ray_o, ray_d, near, far, verts, gamma=0.5)
    np.testing.assert_allclose(n2[0], 4.5, atol=1e-5)
    np.testing.assert_allclose(f2[0], 5.5, atol=1e-5)
    # miss: untouched
    np.testing.assert_allclose(n2[1], 0.1, atol=1e-6)
    np.testing.assert_allclose(f2[1], 10.0, atol=1e-6)


def test_gg_near_far_unnormalized_dir_units():
    """near/far must stay in units of the UN-normalized direction."""
    ray_o = jnp.zeros((1, 3))
    ray_d = jnp.asarray([[0.0, 0.0, 2.0]])  # |d| = 2
    near = jnp.asarray([0.1])
    far = jnp.asarray([10.0])
    verts = jnp.asarray([[0.0, 0.0, 5.0]])
    n2, f2 = gg_near_far(ray_o, ray_d, near, far, verts, gamma=0.5)
    # sphere at euclidean z 4.5..5.5 -> param t 2.25..2.75 (o + t*d)
    np.testing.assert_allclose(n2[0], 2.25, atol=1e-5)
    np.testing.assert_allclose(f2[0], 2.75, atol=1e-5)


def test_composite_single_opaque_sample():
    """One very dense sample -> ray color == sample color, full opacity."""
    rgb = jnp.asarray([[[0.3, 0.6, 0.9], [0.0, 0.0, 0.0]]])
    sigma = jnp.asarray([[1e8, 0.0]])
    z_vals = jnp.asarray([[1.0, 2.0]])
    ray_d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = composite(rgb, sigma, z_vals, ray_d)
    np.testing.assert_allclose(out.rgb, [[0.3, 0.6, 0.9]], atol=1e-5)
    np.testing.assert_allclose(out.acc, [1.0], atol=1e-5)
    np.testing.assert_allclose(out.depth, [1.0], atol=1e-5)


def test_composite_matches_hand_transmittance():
    """Two samples with known alphas vs hand-computed weights."""
    sigma = jnp.asarray([[np.log(2.0), np.log(4.0)]])  # alphas 0.5, 0.75
    z_vals = jnp.asarray([[0.0, 1.0]])  # dists: 1, 1e10
    ray_d = jnp.asarray([[1.0, 0.0, 0.0]])
    rgb = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    out = composite(rgb, sigma, z_vals, ray_d)
    # alpha0 = 1-exp(-log2 * 1) = 0.5; alpha1 = 1-exp(-log4*1e10) = 1
    # w0 = 0.5; w1 = 1 * (1-0.5) = 0.5
    np.testing.assert_allclose(out.weights, [[0.5, 0.5]], atol=1e-6)
    np.testing.assert_allclose(out.rgb, [[0.5, 0.5, 0.0]], atol=1e-6)
    np.testing.assert_allclose(out.acc, [1.0], atol=1e-6)


def test_composite_scales_dists_by_dir_norm():
    sigma = jnp.asarray([[1.0, 1.0]])
    z_vals = jnp.asarray([[0.0, 1.0]])
    rgb = jnp.zeros((1, 2, 3))
    w1 = composite(rgb, sigma, z_vals, jnp.asarray([[1.0, 0.0, 0.0]])).weights
    w2 = composite(rgb, sigma, z_vals, jnp.asarray([[2.0, 0.0, 0.0]])).weights
    # alpha of first sample: 1-exp(-1*1) vs 1-exp(-1*2)
    np.testing.assert_allclose(w1[0, 0], 1 - np.exp(-1.0), atol=1e-6)
    np.testing.assert_allclose(w2[0, 0], 1 - np.exp(-2.0), atol=1e-6)


def test_composite_noise_reproducible():
    rng = jax.random.key(42)
    sigma = jnp.ones((4, 8))
    z = jnp.broadcast_to(jnp.linspace(0, 1, 8), (4, 8))
    rgb = jnp.ones((4, 8, 3))
    d = jnp.ones((4, 3))
    a = composite(rgb, sigma, z, d, noise_std=1.0, rng=rng)
    b = composite(rgb, sigma, z, d, noise_std=1.0, rng=rng)
    np.testing.assert_array_equal(a.weights, b.weights)
    c = composite(rgb, sigma, z, d, noise_std=0.0)
    assert not np.allclose(a.weights, c.weights)
