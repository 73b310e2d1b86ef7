"""Nearest-face search: XLA vs brute force vs Pallas (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dual_space_nerf_tpu.ops import (

    face_centroids,
    nearest_face_pallas,
    nearest_face_xla,
)

# interpret-mode Pallas / torch-reference parity: the heavy tier.
# Fast CI runs 'pytest -m "not slow"'; the full battery runs everything.
pytestmark = pytest.mark.slow


def brute_force(pts, centroids):
    d = np.linalg.norm(pts[:, None, :] - centroids[None], axis=-1)
    return d.argmin(axis=1)


def test_xla_matches_brute_force(rng_np):
    pts = rng_np.normal(size=(500, 3)).astype(np.float32)
    cents = rng_np.normal(size=(777, 3)).astype(np.float32)
    got = np.asarray(nearest_face_xla(jnp.asarray(pts), jnp.asarray(cents)))
    want = brute_force(pts, cents)
    # allow distance ties: compare distances, not indices
    d_got = np.linalg.norm(pts - cents[got], axis=-1)
    d_want = np.linalg.norm(pts - cents[want], axis=-1)
    np.testing.assert_allclose(d_got, d_want, atol=1e-5)


def test_pallas_interpret_matches_xla(rng_np):
    pts = rng_np.normal(size=(300, 3)).astype(np.float32)
    cents = rng_np.normal(size=(1000, 3)).astype(np.float32)
    xla_idx = np.asarray(nearest_face_xla(jnp.asarray(pts), jnp.asarray(cents)))
    pls_idx = np.asarray(
        nearest_face_pallas(jnp.asarray(pts), jnp.asarray(cents), interpret=True)
    )
    d_x = np.linalg.norm(pts - cents[xla_idx], axis=-1)
    d_p = np.linalg.norm(pts - cents[pls_idx], axis=-1)
    np.testing.assert_allclose(d_p, d_x, atol=1e-5)


def test_pallas_handles_smpl_sized_inputs(rng_np):
    """13776 centroids (SMPL face count), non-multiple-of-block points."""
    pts = rng_np.normal(size=(1030, 3)).astype(np.float32)
    cents = rng_np.normal(size=(13776, 3)).astype(np.float32)
    pls_idx = np.asarray(
        nearest_face_pallas(jnp.asarray(pts), jnp.asarray(cents), interpret=True)
    )
    assert pls_idx.shape == (1030,)
    assert (pls_idx >= 0).all() and (pls_idx < 13776).all()
    want = brute_force(pts, cents)
    d_got = np.linalg.norm(pts - cents[pls_idx], axis=-1)
    d_want = np.linalg.norm(pts - cents[want], axis=-1)
    np.testing.assert_allclose(d_got, d_want, atol=1e-5)


def test_face_centroids():
    verts = jnp.asarray([[0.0, 0, 0], [3.0, 0, 0], [0.0, 3, 0], [0.0, 0, 3]])
    faces = jnp.asarray([[0, 1, 2], [1, 2, 3]], jnp.int32)
    c = face_centroids(verts, faces)
    np.testing.assert_allclose(c, [[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]], atol=1e-6)
