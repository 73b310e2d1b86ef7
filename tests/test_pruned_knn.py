"""The production TPU nearest-face paths (ops/pruned_knn.py), interpret mode.

`knn_impl="auto"` on TPU selects the v3 list-driven search (use_listed)
when a tile table exists, else the v2 unrolled kernel (use_pruned); both
are what bench.py measures and every function here is asserted against
brute force. Reference semantics being matched:
`utils/render_utils.py:84-99` (pytorch3d K=1 knn_points).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dual_space_nerf_tpu.data.synthetic import make_scene
from dual_space_nerf_tpu.ops import build_face_clusters, face_centroids
from dual_space_nerf_tpu.ops.pruned_knn import (

    morton_order,
    nearest_face_pruned,
    pruned_search_presorted,
    pruned_tables,
)


def brute_dist(pts, cents, idx):
    return np.linalg.norm(pts - cents[idx], axis=-1)


def brute_force(pts, cents):
    d = np.linalg.norm(pts[:, None, :] - cents[None], axis=-1)
    return d.argmin(axis=1)


def _face_perm(cents):
    table = np.asarray(build_face_clusters(jnp.asarray(cents)).table)
    return jnp.asarray(table[table >= 0].ravel(), jnp.int32)


def assert_matches_brute(pts, cents, got):
    """Distance-equality (ties allowed) + index-validity assertion."""
    got = np.asarray(got)
    assert got.shape == (len(pts),)
    assert (got >= 0).all() and (got < len(cents)).all()
    want = brute_force(pts, cents)
    np.testing.assert_allclose(
        brute_dist(pts, cents, got), brute_dist(pts, cents, want), atol=1e-5
    )


@pytest.fixture(scope="module")
def smpl_like():
    """SMPL-shaped synthetic scene: V=6890, F=13776 capsule."""
    scene = make_scene()
    cents = np.asarray(
        face_centroids(jnp.asarray(scene.verts_world), jnp.asarray(scene.faces))
    )
    return scene, cents, _face_perm(cents)


def test_near_surface_gg_like_samples(smpl_like, rng_np):
    """The training workload: points scattered near the mesh surface."""
    scene, cents, perm = smpl_like
    base = scene.verts_world[rng_np.integers(0, len(scene.verts_world), 700)]
    pts = (base + 0.05 * rng_np.standard_normal((700, 3))).astype(np.float32)
    got = nearest_face_pruned(
        jnp.asarray(pts), jnp.asarray(cents), perm, interpret=True
    )
    assert_matches_brute(pts, cents, got)


def test_uniform_box_points(smpl_like, rng_np):
    """Points far from the surface (the GG fallback / AABB regime)."""
    scene, cents, perm = smpl_like
    lo, hi = cents.min(0) - 1.0, cents.max(0) + 1.0
    pts = rng_np.uniform(lo, hi, (512, 3)).astype(np.float32)
    got = nearest_face_pruned(
        jnp.asarray(pts), jnp.asarray(cents), perm, interpret=True
    )
    assert_matches_brute(pts, cents, got)


@pytest.mark.parametrize("n", [1, 127, 129, 300])
def test_point_counts_not_multiple_of_block(smpl_like, rng_np, n):
    scene, cents, perm = smpl_like
    pts = rng_np.standard_normal((n, 3)).astype(np.float32)
    got = nearest_face_pruned(
        jnp.asarray(pts), jnp.asarray(cents), perm, interpret=True
    )
    assert_matches_brute(pts, cents, got)


def test_single_tile_mesh(rng_np):
    """F < one centroid tile (1024): degenerate single-tile path."""
    cents = rng_np.standard_normal((37, 3)).astype(np.float32)
    perm = _face_perm(cents)
    pts = rng_np.standard_normal((130, 3)).astype(np.float32)
    got = nearest_face_pruned(
        jnp.asarray(pts), jnp.asarray(cents), perm, interpret=True
    )
    assert_matches_brute(pts, cents, got)


def test_exact_tile_multiple_mesh(rng_np):
    """F an exact multiple of the 1024 tile (no padded columns)."""
    cents = rng_np.standard_normal((2048, 3)).astype(np.float32)
    perm = _face_perm(cents)
    pts = rng_np.standard_normal((200, 3)).astype(np.float32)
    got = nearest_face_pruned(
        jnp.asarray(pts), jnp.asarray(cents), perm, interpret=True
    )
    assert_matches_brute(pts, cents, got)


def test_presorted_equals_wrapper(smpl_like, rng_np):
    """pruned_search_presorted on Morton-ordered points == the sorting
    wrapper's result scattered back (the renderer uses the presorted entry
    with its own block layout)."""
    scene, cents, perm = smpl_like
    pts = (
        scene.verts_world[rng_np.integers(0, len(scene.verts_world), 260)]
        + 0.03 * rng_np.standard_normal((260, 3))
    ).astype(np.float32)
    order = np.asarray(morton_order(jnp.asarray(pts)))
    sorted_ids = np.asarray(
        pruned_search_presorted(
            jnp.asarray(pts[order]), jnp.asarray(cents), perm, interpret=True
        )
    )
    unsorted = np.empty_like(sorted_ids)
    unsorted[order] = sorted_ids
    wrapper = np.asarray(
        nearest_face_pruned(jnp.asarray(pts), jnp.asarray(cents), perm,
                            interpret=True)
    )
    np.testing.assert_allclose(
        brute_dist(pts, cents, unsorted), brute_dist(pts, cents, wrapper),
        atol=1e-6,
    )
    assert_matches_brute(pts, cents, unsorted)


def test_unsorted_points_still_exact(smpl_like, rng_np):
    """Pruning is a perf heuristic only — scrambled (incoherent) blocks must
    still return exact nearest faces."""
    scene, cents, perm = smpl_like
    base = scene.verts_world[rng_np.integers(0, len(scene.verts_world), 256)]
    pts = (base + 0.05 * rng_np.standard_normal((256, 3))).astype(np.float32)
    rng_np.shuffle(pts)  # destroy spatial coherence
    got = pruned_search_presorted(
        jnp.asarray(pts), jnp.asarray(cents), perm, interpret=True
    )
    assert_matches_brute(pts, cents, got)


def test_morton_order_is_permutation_and_local(rng_np):
    pts = rng_np.standard_normal((1000, 3)).astype(np.float32)
    order = np.asarray(morton_order(jnp.asarray(pts)))
    assert sorted(order.tolist()) == list(range(1000))
    # locality: mean consecutive distance far below random pairing
    s = pts[order]
    mean_step = np.linalg.norm(np.diff(s, axis=0), axis=1).mean()
    mean_rand = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert mean_step < 0.5 * mean_rand


def test_pruned_tables_geometry(smpl_like):
    """Tile spheres must contain every centroid assigned to the tile."""
    scene, cents, perm = smpl_like
    cent_t, tile_c, tile_r, n_tiles = pruned_tables(
        jnp.asarray(cents), perm
    )
    cent_t = np.asarray(cent_t)
    tile_c, tile_r = np.asarray(tile_c), np.asarray(tile_r)
    from dual_space_nerf_tpu.ops.pruned_knn import _BLOCK_F

    f = len(cents)
    for t in range(n_tiles):
        cols = slice(t * _BLOCK_F, min((t + 1) * _BLOCK_F, f))
        tile_pts = cent_t[:3, cols].T
        tile_pts = tile_pts[(tile_pts < 1e14).all(axis=1)]
        if len(tile_pts) == 0:
            continue
        d = np.linalg.norm(tile_pts - tile_c[:3, t], axis=-1)
        assert (d <= tile_r[0, t] + 1e-4).all()


def test_pruned_search_under_shard_map(smpl_like, rng_np):
    """The Pallas kernel partitioned over the ray mesh (how a pod would run
    it: each device searches its ray shard against replicated centroids).
    Sharded == unsharded, on the 8-virtual-device mesh in interpret mode."""
    import functools

    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    scene, cents, perm = smpl_like
    base = scene.verts_world[rng_np.integers(0, len(scene.verts_world), 256)]
    pts = (base + 0.05 * rng_np.standard_normal((256, 3))).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    cents_j = jnp.asarray(cents)

    search = functools.partial(
        pruned_search_presorted, centroids=cents_j, face_perm=perm,
        interpret=True,
    )
    sharded = jax.jit(
        shard_map(
            search, mesh=mesh, in_specs=P("rays"), out_specs=P("rays"),
            # pallas_call result carries no varying-mesh-axes
            # annotation; skip the replication check (the per-shard computation
            # is independent by construction)
            check_vma=False,
        )
    )
    got = np.asarray(sharded(jnp.asarray(pts)))
    want = np.asarray(search(jnp.asarray(pts)))
    np.testing.assert_allclose(
        brute_dist(pts, cents, got), brute_dist(pts, cents, want), atol=1e-6
    )
    assert_matches_brute(pts, cents, got)


# ---------------------------------------------------------------------------
# list-driven search (pruned_knn.pruned_search_listed, the TPU "listed" impl)
# ---------------------------------------------------------------------------
from dual_space_nerf_tpu.ops.pruned_knn import (  # noqa: E402
    build_face_tiles,
    listed_tables,
    pruned_search_listed,
)

# interpret-mode Pallas / torch-reference parity: the heavy tier.
# Fast CI runs 'pytest -m "not slow"'; the full battery runs everything.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def smpl_tiles(smpl_like):
    scene, cents, _ = smpl_like
    return build_face_tiles(jnp.asarray(cents))


def _morton_sorted(pts):
    order = np.asarray(morton_order(jnp.asarray(pts)))
    return pts[order], order


# all kernel branches: wide (the production default), slim and wide+tighten
# (both measured-negative, kept OFF as recorded A/B knobs — exact either
# way; parametrizing stops silent rot)
@pytest.mark.parametrize("slim,tighten", [(True, False), (False, False),
                                          (False, True)])
def test_listed_near_surface(smpl_like, smpl_tiles, rng_np, slim, tighten):
    scene, cents, _ = smpl_like
    base = scene.verts_world[rng_np.integers(0, len(scene.verts_world), 700)]
    pts = (base + 0.05 * rng_np.standard_normal((700, 3))).astype(np.float32)
    pts_s, _ = _morton_sorted(pts)
    got = pruned_search_listed(
        jnp.asarray(pts_s), jnp.asarray(cents), smpl_tiles,
        interpret=True, block_p=256, tighten=tighten, slim=slim,
    )
    assert_matches_brute(pts_s, cents, got)


@pytest.mark.parametrize("slim,tighten", [(True, False), (False, False),
                                          (False, True)])
def test_listed_uniform_box(smpl_like, smpl_tiles, rng_np, slim, tighten):
    scene, cents, _ = smpl_like
    lo, hi = cents.min(0) - 1.0, cents.max(0) + 1.0
    pts = rng_np.uniform(lo, hi, (512, 3)).astype(np.float32)
    pts_s, _ = _morton_sorted(pts)
    got = pruned_search_listed(
        jnp.asarray(pts_s), jnp.asarray(cents), smpl_tiles,
        interpret=True, block_p=256, tighten=tighten, slim=slim,
    )
    assert_matches_brute(pts_s, cents, got)


def test_listed_two_level_sub_plans(smpl_like, smpl_tiles, rng_np):
    """n_sub > 1: each plan_p sub-block of a grid block walks its own
    SMEM plan row under its own threshold; result stays exact and equals
    whole-block planning (plan granularity only changes work, not
    output)."""
    scene, cents, _ = smpl_like
    base = scene.verts_world[rng_np.integers(0, len(scene.verts_world), 1100)]
    pts = (base + 0.05 * rng_np.standard_normal((1100, 3))).astype(np.float32)
    pts_s, _ = _morton_sorted(pts)
    got = pruned_search_listed(
        jnp.asarray(pts_s), jnp.asarray(cents), smpl_tiles,
        interpret=True, block_p=512, plan_p=128,     # 4 sub-plans per block
    )
    assert_matches_brute(pts_s, cents, got)
    whole = pruned_search_listed(
        jnp.asarray(pts_s), jnp.asarray(cents), smpl_tiles,
        interpret=True, block_p=512, plan_p=512,     # single plan per block
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(whole))


@pytest.mark.parametrize("n", [1, 127, 300])
def test_listed_ragged_counts(smpl_like, smpl_tiles, rng_np, n):
    scene, cents, _ = smpl_like
    pts = rng_np.standard_normal((n, 3)).astype(np.float32)
    got = pruned_search_listed(
        jnp.asarray(pts), jnp.asarray(cents), smpl_tiles,
        interpret=True, block_p=256,
    )
    assert_matches_brute(pts, cents, got)


def test_listed_precomputed_tables_bit_identical(smpl_like, smpl_tiles,
                                                 rng_np):
    """tables= (the canonical-mesh hoisting path, data/batching.py) must
    return bit-identical results to the in-call `listed_tables` derivation
    — it is the same function run once outside the step's graph."""
    scene, cents, _ = smpl_like
    base = scene.verts_world[rng_np.integers(0, len(scene.verts_world), 900)]
    pts = (base + 0.05 * rng_np.standard_normal((900, 3))).astype(np.float32)
    pts_s, _ = _morton_sorted(pts)
    hoisted = tuple(listed_tables(jnp.asarray(cents), smpl_tiles)[:4])
    for slots in (False, True):
        got = pruned_search_listed(
            jnp.asarray(pts_s), jnp.asarray(cents), smpl_tiles,
            interpret=True, block_p=256, return_slots=slots,
        )
        via_tables = pruned_search_listed(
            jnp.asarray(pts_s), jnp.asarray(cents), smpl_tiles,
            interpret=True, block_p=256, return_slots=slots, tables=hoisted,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(via_tables))


def test_listed_tables_np_bit_identical(smpl_like):
    """The numpy host build (listed_tables_np + numpy centroid mean) must
    equal the in-graph derivation (face_centroids -> listed_tables) bit for
    bit — it is what data/batching.py substitutes for the per-step table
    computation on the canonical mesh."""
    from dual_space_nerf_tpu.ops import face_centroids
    from dual_space_nerf_tpu.ops.pruned_knn import listed_tables_np

    scene, cents, _ = smpl_like
    verts = np.asarray(scene.verts_cano, np.float32)
    faces = np.asarray(scene.faces)
    tris = verts[faces]
    # XLA's mean = left-to-right sum * (1/n); np.mean (a divide) differs
    # in ulps — data/batching.py replicates the device formula
    cents_np = ((tris[:, 0] + tris[:, 1]) + tris[:, 2]) * np.float32(1 / 3)
    cents_dev = face_centroids(
        jnp.asarray(verts), jnp.asarray(faces, jnp.int32)
    )
    np.testing.assert_array_equal(cents_np, np.asarray(cents_dev))

    tiles = build_face_tiles(jnp.asarray(cents_np))
    ref = listed_tables(jnp.asarray(cents_np), tiles)[:4]
    got = listed_tables_np(cents_np, np.asarray(tiles))
    for r, g, name in zip(ref, got, ("cent_t", "tile_c", "tile_r",
                                     "perm_pad")):
        np.testing.assert_array_equal(np.asarray(r), g, err_msg=name)


def test_listed_tiny_mesh(rng_np):
    """F smaller than one tile width: a single 128-wide padded tile."""
    cents = rng_np.standard_normal((37, 3)).astype(np.float32)
    tiles = build_face_tiles(jnp.asarray(cents))
    pts = rng_np.standard_normal((130, 3)).astype(np.float32)
    got = pruned_search_listed(
        jnp.asarray(pts), jnp.asarray(cents), tiles,
        interpret=True, block_p=128,
    )
    assert_matches_brute(pts, cents, got)


def test_listed_tables_geometry(smpl_like, smpl_tiles):
    """Tile AABBs contain their member centroids; the witness (tile_r rows
    0:3) is the MEMBER centroid closest to the AABB midpoint; every face
    appears in exactly one tile."""
    scene, cents, _ = smpl_like
    table = np.asarray(smpl_tiles)
    ids = table[table >= 0]
    assert sorted(ids.tolist()) == list(range(len(cents)))
    cent_t, tile_c, tile_r, perm_pad, n_tiles = listed_tables(
        jnp.asarray(cents), smpl_tiles
    )
    tile_c, tile_r = np.asarray(tile_c), np.asarray(tile_r)
    for t in range(n_tiles):
        members = table[t][table[t] >= 0]
        if len(members) == 0:
            continue
        lo, hi = tile_c[:3, t], tile_c[3:6, t]
        cm = cents[members]
        assert (cm >= lo - 1e-5).all() and (cm <= hi + 1e-5).all()
        # the witness is a real member, and it is the one nearest the
        # AABB midpoint (the plan's exact upper-bound anchor)
        wit = tile_r[:3, t]
        d_wit = np.linalg.norm(cm - wit, axis=-1)
        assert d_wit.min() <= 1e-5, "witness is not a member centroid"
        d_mid = np.linalg.norm(cm - 0.5 * (lo + hi), axis=-1)
        assert abs(
            np.linalg.norm(wit - 0.5 * (lo + hi)) - d_mid.min()
        ) <= 1e-4


def test_listed_inside_renderer(smpl_like, rng_np):
    """knn_impl='listed' drives the full render pipeline off-TPU (interpret
    mode), matching the xla dispatch."""
    import jax

    from dual_space_nerf_tpu.data.batching import item_to_mesh
    from dual_space_nerf_tpu.models import DualSpaceNeRF
    from dual_space_nerf_tpu.renderer import (
        LightState, RayBatch, RenderSettings, render_rays,
    )

    scene, cents, _ = smpl_like
    mesh = item_to_mesh(
        {"xyz": scene.verts_world}, np.asarray(scene.faces), scene.verts_cano
    )
    assert mesh.tile_table is not None
    model = DualSpaceNeRF(max_frames=4)
    params = model.init(
        jax.random.key(0), jnp.zeros((4, 3)), jnp.zeros((4,), jnp.int32),
        jnp.zeros((4, 16)),
    )
    r, s = 8, 8
    eye = (-scene.R.T @ scene.T).ravel()
    tgt = scene.verts_world[rng_np.integers(0, len(scene.verts_world), r)]
    batch = RayBatch(
        ray_o=jnp.asarray(np.broadcast_to(eye, (r, 3)), jnp.float32),
        ray_d=jnp.asarray((tgt - eye).astype(np.float32)),
        near=jnp.full((r,), 0.5, jnp.float32),
        far=jnp.full((r,), 3.5, jnp.float32),
        frame=jnp.asarray(0, jnp.int32),
        body_pose=jnp.asarray(scene.poses[1:], jnp.float32),
    )
    base = dict(
        n_samples=s, sample_mode="GG", mlp_chunk=r * s, perturb=0.0,
        raw_noise_std=0.0,
    )
    out_l = render_rays(
        params, model, batch, mesh, RenderSettings(knn_impl="listed", **base),
        LightState.identity(), rng=None, train=False,
    )
    out_x = render_rays(
        params, model, batch, mesh, RenderSettings(knn_impl="xla", **base),
        LightState.identity(), rng=None, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_l["color"]), np.asarray(out_x["color"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_l["acc_map"]), np.asarray(out_x["acc_map"]), atol=1e-5
    )


def test_listed_search_under_shard_map(smpl_like, smpl_tiles, rng_np):
    """The listed search partitioned over the ray mesh: each device plans
    and searches its own ray shard against replicated centroids + tile
    table. Sharded == unsharded on the 8-virtual-device mesh."""
    import functools

    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    scene, cents, _ = smpl_like
    base = scene.verts_world[rng_np.integers(0, len(scene.verts_world), 256)]
    pts = (base + 0.05 * rng_np.standard_normal((256, 3))).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    search = functools.partial(
        pruned_search_listed, centroids=jnp.asarray(cents),
        tile_table=smpl_tiles, interpret=True, block_p=32,
    )
    sharded = jax.jit(
        shard_map(
            search, mesh=mesh, in_specs=P("rays"), out_specs=P("rays"),
            check_vma=False,
        )
    )
    got = np.asarray(sharded(jnp.asarray(pts)))
    want = np.asarray(search(jnp.asarray(pts)))
    np.testing.assert_allclose(
        brute_dist(pts, cents, got), brute_dist(pts, cents, want), atol=1e-6
    )
    assert_matches_brute(pts, cents, got)


# ---------------------------------------------------------------------------
# env-override validation (sweep knobs must fail loudly, not deep in a jit)
# ---------------------------------------------------------------------------
def test_env_override_validation(monkeypatch):
    from dual_space_nerf_tpu.ops.pruned_knn import (
        _env_override_bool,
        _env_override_int,
    )

    assert _env_override_int("DSNERF_TEST_UNSET", 2048, 2048) == 2048
    monkeypatch.setenv("DSNERF_TEST_PLAN", "512")
    assert _env_override_int("DSNERF_TEST_PLAN", 2048, 2048) == 512
    monkeypatch.setenv("DSNERF_TEST_PLAN", "768")  # not a divisor of 2048
    with pytest.raises(ValueError, match="DSNERF_TEST_PLAN"):
        _env_override_int("DSNERF_TEST_PLAN", 2048, 2048)
    monkeypatch.setenv("DSNERF_TEST_PLAN", "abc")
    with pytest.raises(ValueError, match="not an integer"):
        _env_override_int("DSNERF_TEST_PLAN", 2048, 2048)
    monkeypatch.setenv("DSNERF_TEST_PLAN", "0")
    with pytest.raises(ValueError, match="positive divisor"):
        _env_override_int("DSNERF_TEST_PLAN", 2048, 2048)

    assert _env_override_bool("DSNERF_TEST_UNSET_B", True) is True
    monkeypatch.setenv("DSNERF_TEST_TG", "1")
    assert _env_override_bool("DSNERF_TEST_TG", False) is True
    monkeypatch.setenv("DSNERF_TEST_TG", "0")
    assert _env_override_bool("DSNERF_TEST_TG", True) is False
    monkeypatch.setenv("DSNERF_TEST_TG", "yes")
    with pytest.raises(ValueError, match="must be '0' or '1'"):
        _env_override_bool("DSNERF_TEST_TG", False)
