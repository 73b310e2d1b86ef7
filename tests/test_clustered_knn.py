"""Cluster-pruned nearest-face search: exactness vs brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from dual_space_nerf_tpu.data.synthetic import make_scene
from dual_space_nerf_tpu.ops import (

    build_face_clusters,
    face_centroids,
    nearest_face_clustered,
    nearest_face_xla,
)

# interpret-mode Pallas / torch-reference parity: the heavy tier.
# Fast CI runs 'pytest -m "not slow"'; the full battery runs everything.
pytestmark = pytest.mark.slow


def _check_exact(pts, cents, table, atol=1e-4):
    """'Exact' up to near-ties: a miss at distance-delta < 1e-4 means the
    chosen face is geometrically indistinguishable from the true nearest
    (adjacent triangle), with no effect on the barycentric warp."""
    got = np.asarray(nearest_face_clustered(
        jnp.asarray(pts), jnp.asarray(cents), table
    ))
    want = np.asarray(nearest_face_xla(jnp.asarray(pts), jnp.asarray(cents)))
    d_got = np.linalg.norm(pts - cents[got], axis=-1)
    d_want = np.linalg.norm(pts - cents[want], axis=-1)
    np.testing.assert_allclose(d_got, d_want, atol=atol)


def test_clustered_exact_on_smpl_sized_mesh(rng_np):
    scene = make_scene()  # V=6890, F=13776
    cents = np.asarray(
        face_centroids(jnp.asarray(scene.verts_world), jnp.asarray(scene.faces))
    )
    table = build_face_clusters(cents).table
    # query points: near-surface (the real workload) + in-bbox + far
    near = cents[rng_np.integers(0, len(cents), 2000)] + 0.05 * rng_np.standard_normal((2000, 3))
    inbox = rng_np.uniform(-1.2, 1.2, (1000, 3))
    far = rng_np.uniform(-4, 4, (500, 3))
    pts = np.concatenate([near, inbox, far]).astype(np.float32)
    _check_exact(pts, cents, table)


def test_clustered_exact_small_mesh(rng_np):
    scene = make_scene(n_theta=14, n_phi=12)  # F=336 < default C*cap
    cents = np.asarray(
        face_centroids(jnp.asarray(scene.verts_world), jnp.asarray(scene.faces))
    )
    table = build_face_clusters(cents).table
    pts = rng_np.uniform(-1.5, 1.5, (700, 3)).astype(np.float32)
    _check_exact(pts, cents, table)


def test_cluster_table_is_balanced_partition():
    scene = make_scene()
    cents = np.asarray(
        face_centroids(jnp.asarray(scene.verts_world), jnp.asarray(scene.faces))
    )
    table = np.asarray(build_face_clusters(cents).table)
    ids = table[table >= 0]
    assert len(ids) == len(cents)
    assert len(np.unique(ids)) == len(cents)  # every face exactly once
    sizes = (table >= 0).sum(1)
    assert sizes.max() - sizes.min() <= 1 or sizes.min() > 0


def test_grouped_exact_on_ray_samples(rng_np):
    """Ray-grouped search vs brute force on realistic ray/sample structure."""
    from dual_space_nerf_tpu.ops.clustered_knn import nearest_face_grouped

    scene = make_scene()
    cents = np.asarray(
        face_centroids(jnp.asarray(scene.verts_world), jnp.asarray(scene.faces))
    )
    table = build_face_clusters(cents).table
    # camera rays through the mesh with the REAL sampling geometry:
    # GG-tightened near/far + stratified samples (the renderer's workload)
    from dual_space_nerf_tpu.geometry import gg_near_far, sample_along_rays, stratified_z

    eye = (-scene.R.T @ scene.T).ravel()
    R, S = 300, 16
    targets = scene.verts_world[rng_np.integers(0, len(scene.verts_world), R)]
    d = (targets + 0.03 * rng_np.standard_normal((R, 3)) - eye).astype(np.float32)
    ray_o = jnp.asarray(np.broadcast_to(eye, (R, 3)), jnp.float32)
    ray_d = jnp.asarray(d)
    near, far = gg_near_far(
        ray_o, ray_d, jnp.full((R,), 0.5), jnp.full((R,), 3.0),
        jnp.asarray(scene.verts_world),
    )
    z = stratified_z(near, far, S)
    pts = np.asarray(sample_along_rays(ray_o, ray_d, z))       # (R,S,3)
    # sub-groups of 4 consecutive samples, as the renderer does
    grouped = pts.reshape(R * S // 4, 4, 3)

    got = np.asarray(
        nearest_face_grouped(jnp.asarray(grouped), jnp.asarray(cents), table)
    ).reshape(-1)
    flat = pts.reshape(-1, 3)
    want = np.asarray(nearest_face_xla(jnp.asarray(flat), jnp.asarray(cents)))
    d_got = np.linalg.norm(flat - cents[got], axis=-1)
    d_want = np.linalg.norm(flat - cents[want], axis=-1)
    err = np.abs(d_got - d_want)
    # near-surface samples (the only ones the renderer keeps: |h| > 0.1 is
    # transparent-masked) must match brute force exactly
    near_surface = d_want < 0.12
    assert near_surface.sum() > 3000
    np.testing.assert_allclose(err[near_surface], 0.0, atol=1e-4)
    # far samples: rare near-ties allowed, never gross misses
    assert (err > 1e-4).mean() < 0.01


def test_clustered_used_in_render_pipeline(rng_np):
    """MeshBundle with cluster_table must produce identical warp results."""
    from dual_space_nerf_tpu.ops import face_centroids as fc
    from dual_space_nerf_tpu.renderer import MeshBundle, RenderSettings, warp_world_to_canonical

    scene = make_scene(n_theta=14, n_phi=12)
    faces = jnp.asarray(scene.faces)
    vw = jnp.asarray(scene.verts_world)
    vc = jnp.asarray(scene.verts_cano)
    cents = np.asarray(fc(vw, faces))
    table = build_face_clusters(cents).table

    pts = jnp.asarray(
        scene.verts_world[rng_np.integers(0, len(scene.verts_world), 200)]
        + 0.02 * rng_np.standard_normal((200, 3)),
        jnp.float32,
    )
    mesh_brute = MeshBundle(faces, vw, vc, None)
    mesh_clustered = MeshBundle(faces, vw, vc, table)
    cw = fc(vw, faces)
    pc1, m1, f1, _ = warp_world_to_canonical(
        pts, mesh_brute, cw, RenderSettings(knn_impl="xla")
    )
    pc2, m2, f2, _ = warp_world_to_canonical(
        pts, mesh_clustered, cw, RenderSettings(knn_impl="clustered")
    )
    np.testing.assert_allclose(np.asarray(pc1), np.asarray(pc2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
