"""Renderer pipeline integration tests (small synthetic scene, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dual_space_nerf_tpu.data.synthetic import make_scene
from dual_space_nerf_tpu.models import DualSpaceNeRF
from dual_space_nerf_tpu.ops import face_centroids
from dual_space_nerf_tpu.renderer import (
    LightState,
    MeshBundle,
    RayBatch,
    RenderSettings,
    density_grid,
    render_rays,
    warp_world_to_canonical,
)

R, S = 16, 8  # tiny: CPU compile cost dominates


@pytest.fixture(scope="module")
def scene():
    return make_scene(n_theta=14, n_phi=12, h=64, w=64)  # V=170, F=336


@pytest.fixture(scope="module")
def mesh(scene):
    return MeshBundle(
        faces=jnp.asarray(scene.faces),
        verts_world=jnp.asarray(scene.verts_world),
        verts_cano=jnp.asarray(scene.verts_cano),
    )


@pytest.fixture(scope="module")
def model_params():
    model = DualSpaceNeRF(max_frames=10)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((4, 3)),
        jnp.zeros((4,), jnp.int32),
        jnp.zeros((4, 16)),
    )
    return model, params


def _ray_batch(scene, r=R):
    rng = np.random.default_rng(5)
    # rays from the camera toward jittered points near the mesh
    eye = (-scene.R.T @ scene.T).ravel()
    targets = scene.verts_world[rng.integers(0, len(scene.verts_world), r)]
    targets = targets + 0.05 * rng.standard_normal((r, 3))
    d = targets - eye
    return RayBatch(
        ray_o=jnp.asarray(np.broadcast_to(eye, (r, 3)), jnp.float32),
        ray_d=jnp.asarray(d, jnp.float32),
        near=jnp.full((r,), 0.5, jnp.float32),
        far=jnp.full((r,), 2.0, jnp.float32),
        frame=jnp.asarray(0, jnp.int32),
        body_pose=jnp.asarray(scene.poses[1:], jnp.float32),
    )


def settings(**kw):
    base = dict(
        n_samples=S, sample_mode="GG", mlp_chunk=64, knn_impl="xla",
        remat=True,
    )
    base.update(kw)
    return RenderSettings(**base)


def test_warp_surface_points_land_on_canonical_surface(scene, mesh):
    """Mesh vertices warped world->canonical must land on (h~0) the
    corresponding canonical positions."""
    sett = settings()
    cw = face_centroids(mesh.verts_world, mesh.faces)
    take = np.arange(0, len(scene.verts_world), 7)
    pts_w = mesh.verts_world[take]
    pts_c, tmask, fidx, _ = warp_world_to_canonical(pts_w, mesh, cw, sett)
    # vertices are on the surface: none should be masked transparent
    assert not bool(np.asarray(tmask).any())
    # warped verts should be close to the true canonical verts (exact when
    # the nearest face contains the vertex)
    err = np.linalg.norm(np.asarray(pts_c) - np.asarray(mesh.verts_cano[take]), axis=-1)
    assert np.median(err) < 1e-3
    assert err.max() < 0.2  # capsule bend is smooth


def test_warp_far_points_masked(scene, mesh):
    sett = settings()
    cw = face_centroids(mesh.verts_world, mesh.faces)
    far_pts = jnp.asarray([[5.0, 5.0, 5.0], [-4.0, 2.0, -3.0]], jnp.float32)
    _, tmask, _, _ = warp_world_to_canonical(far_pts, mesh, cw, sett)
    assert bool(np.asarray(tmask).all())


def test_render_rays_shapes_and_finiteness(scene, mesh, model_params):
    model, params = model_params
    batch = _ray_batch(scene)
    out = render_rays(
        params, model, batch, mesh, settings(), LightState.identity(),
        jax.random.key(0), train=True,
    )
    assert out["color"].shape == (R, 3)
    assert out["acc_map"].shape == (R,)
    assert out["weights"].shape == (R, S)
    assert np.isfinite(np.asarray(out["color"])).all()
    assert np.isfinite(np.asarray(out["weights"])).all()


def test_render_rays_jit_and_grad(scene, mesh, model_params):
    """The full pipeline must be jittable and differentiable end-to-end."""
    model, params = model_params
    batch = _ray_batch(scene)
    sett = settings()
    light = LightState.identity()

    @jax.jit
    def loss_fn(p, rng):
        out = render_rays(p, model, batch, mesh, sett, light, rng, train=True)
        return jnp.mean(out["color"] ** 2)

    g = jax.grad(loss_fn)(params, jax.random.key(1))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0  # gradients flow through warp + vjp-normals + lighting


def test_eval_deterministic(scene, mesh, model_params):
    model, params = model_params
    batch = _ray_batch(scene)
    sett = settings()
    out1 = render_rays(
        params, model, batch, mesh, sett, LightState.identity(), None, train=False
    )
    out2 = render_rays(
        params, model, batch, mesh, sett, LightState.identity(), None, train=False
    )
    np.testing.assert_array_equal(out1["color"], out2["color"])


def test_code_scale_changes_output(scene, mesh, model_params):
    model, params = model_params
    batch = _ray_batch(scene)
    sett = settings()
    base = LightState.identity()
    zeroed = base._replace(code_scale=jnp.zeros(()))
    out1 = render_rays(params, model, batch, mesh, sett, base, None, train=False)
    out2 = render_rays(params, model, batch, mesh, sett, zeroed, None, train=False)
    assert not np.allclose(out1["color"], out2["color"])


def test_light_bias_changes_output_only_via_lighting(scene, mesh, model_params):
    model, params = model_params
    batch = _ray_batch(scene)
    sett = settings()
    base = LightState.identity()
    shifted = base._replace(light_bias=jnp.asarray([1.0, 2.0, 0.5]))
    out1 = render_rays(params, model, batch, mesh, sett, base, None, train=False)
    out2 = render_rays(params, model, batch, mesh, sett, shifted, None, train=False)
    # lighting scales color but the density field (weights) must be identical
    np.testing.assert_allclose(out1["weights"], out2["weights"], atol=1e-6)
    assert not np.allclose(out1["color"], out2["color"])


def test_density_grid_query(scene, mesh, model_params):
    model, params = model_params
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(33, 3)), jnp.float32
    )
    d = density_grid(
        params, model, pts, jnp.asarray(0, jnp.int32),
        jnp.asarray(scene.poses[1:]), settings(),
    )
    assert d.shape == (33,)
    assert np.isfinite(np.asarray(d)).all()


def test_fine_hierarchical_pass(scene, mesh, model_params):
    """FINE_RAY_SAMPLING equivalent: fine keys present, finite, denser z."""
    model, params = model_params
    batch = _ray_batch(scene)
    sett = settings(n_fine=8)
    out = render_rays(
        params, model, batch, mesh, sett, LightState.identity(),
        jax.random.key(0), train=True,
    )
    assert out["fine_color"].shape == (R, 3)
    assert out["fine_z_vals"].shape == (R, S + 8)
    assert np.isfinite(np.asarray(out["fine_color"])).all()
    # fine z grid must be sorted and contain extra samples
    z = np.asarray(out["fine_z_vals"])
    assert (np.diff(z, axis=-1) >= 0).all()


def test_sample_pdf_concentrates_on_peak(rng_np):
    from dual_space_nerf_tpu.geometry.sampling import sample_pdf

    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 17), (4, 17))
    w = np.full((4, 16), 1e-4, np.float32)
    w[:, 8] = 1.0  # peak in bin [0.5, 0.5625]
    z = np.asarray(sample_pdf(bins, jnp.asarray(w), 32))
    frac_in_peak = ((z >= 0.5) & (z <= 0.5625)).mean()
    assert frac_in_peak > 0.9
    assert (np.diff(z, axis=-1) >= 0).all()


def test_gated_shading_matches_full(scene, mesh, model_params):
    """Importance-gated shading (shade_topk) must match full shading on a
    model with surface-concentrated density. Train briefly so the weight
    mass concentrates, then compare gated vs full eval renders."""
    import optax

    from dual_space_nerf_tpu.data.synthetic import emission_color
    from dual_space_nerf_tpu.training import (
        TrainBatch,
        create_train_state,
        make_train_step,
    )

    model, _ = model_params
    tx = optax.adam(5e-3)
    state = create_train_state(model, tx, jax.random.key(1))
    sett = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=R * S, knn_impl="xla",
        raw_noise_std=0.0,
    )
    rng = np.random.default_rng(9)
    eye = (-scene.R.T @ scene.T).ravel()
    tgt_idx = rng.integers(0, len(scene.verts_world), 64)
    targets = scene.verts_world[tgt_idx] + 0.02 * rng.standard_normal((64, 3))
    rays = RayBatch(
        ray_o=jnp.asarray(np.broadcast_to(eye, (64, 3)), jnp.float32),
        ray_d=jnp.asarray((targets - eye), jnp.float32),
        near=jnp.full((64,), 0.5, jnp.float32),
        far=jnp.full((64,), 2.0, jnp.float32),
        frame=jnp.asarray(0, jnp.int32),
        body_pose=jnp.asarray(scene.poses[1:]),
    )
    batch = TrainBatch(
        rays=rays,
        rgb=jnp.asarray(emission_color(scene.verts_cano[tgt_idx]), jnp.float32),
        occupancy=jnp.ones((64,), jnp.float32),
    )
    step = make_train_step(model, tx, sett)
    key = jax.random.key(0)
    for _ in range(30):
        state, metrics = step(state, batch, mesh, key)

    full = render_rays(
        state.params, model, rays, mesh, sett, LightState.identity(),
        rng=None, train=False,
    )
    gated_sett = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=R * S, knn_impl="xla",
        raw_noise_std=0.0, shade_topk=S // 2,
    )
    gated = render_rays(
        state.params, model, rays, mesh, gated_sett, LightState.identity(),
        rng=None, train=False,
    )
    # density path is identical
    np.testing.assert_allclose(
        np.asarray(gated["weights"]), np.asarray(full["weights"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gated["acc_map"]), np.asarray(full["acc_map"]), atol=1e-6
    )
    # color matches to the weight tail outside the top-K
    w = np.sort(np.asarray(full["weights"]), axis=-1)
    tail = w[:, : S - S // 2].sum(-1).max()
    np.testing.assert_allclose(
        np.asarray(gated["color"]), np.asarray(full["color"]),
        atol=max(2.0 * tail, 1e-4),
    )
    # and on a trained surface the tail is genuinely small
    assert tail < 0.05, tail


def test_gated_shading_trains(scene, mesh, model_params):
    """A train step with gating enabled is finite and reduces loss."""
    import optax

    from dual_space_nerf_tpu.data.synthetic import emission_color
    from dual_space_nerf_tpu.training import (
        TrainBatch,
        create_train_state,
        make_train_step,
    )

    model, _ = model_params
    tx = optax.adam(5e-3)
    state = create_train_state(model, tx, jax.random.key(2))
    sett = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=R * S, knn_impl="xla",
        shade_topk=S // 2,
    )
    rng = np.random.default_rng(11)
    eye = (-scene.R.T @ scene.T).ravel()
    tgt_idx = rng.integers(0, len(scene.verts_world), 32)
    targets = scene.verts_world[tgt_idx] + 0.02 * rng.standard_normal((32, 3))
    rays = RayBatch(
        ray_o=jnp.asarray(np.broadcast_to(eye, (32, 3)), jnp.float32),
        ray_d=jnp.asarray((targets - eye), jnp.float32),
        near=jnp.full((32,), 0.5, jnp.float32),
        far=jnp.full((32,), 2.0, jnp.float32),
        frame=jnp.asarray(0, jnp.int32),
        body_pose=jnp.asarray(scene.poses[1:]),
    )
    batch = TrainBatch(
        rays=rays,
        rgb=jnp.asarray(emission_color(scene.verts_cano[tgt_idx]), jnp.float32),
        occupancy=jnp.ones((32,), jnp.float32),
    )
    step = make_train_step(model, tx, sett)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch, mesh, jax.random.key(3))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_gated_shading_with_fine_pass(scene, mesh, model_params):
    """SHADE_TOPK composes with hierarchical sampling: the fine pass gates
    over its own (coarse+fine) sample axis."""
    model, params = model_params
    sett = RenderSettings(
        n_samples=S, n_fine=S, sample_mode="GG", mlp_chunk=R * S,
        knn_impl="xla", perturb=0.0, raw_noise_std=0.0, shade_topk=S // 2,
    )
    batch = _ray_batch(scene)
    out = render_rays(
        params, model, batch, mesh, sett, LightState.identity(),
        rng=None, train=False,
    )
    assert out["fine_color"].shape == (R, 3)
    assert np.isfinite(np.asarray(out["fine_color"])).all()
    # fine weights cover 2S samples; gating shaded only S/2 of each pass
    assert out["fine_weights"].shape == (R, 2 * S)


def test_reuse_warp_faces_close_to_exact(scene, mesh, model_params):
    """MODEL.REUSE_WARP_FACES skips the canonical re-search by reusing the
    world warp's face id for the normal transport. On near-surface samples
    the re-search agrees with the warp's face for ~all points, so renders
    must stay close to the exact (reference-semantics) path — in both full
    and gated shading."""
    model, params = model_params
    batch = _ray_batch(scene)
    for topk in (0, S // 2):
        exact = render_rays(
            params, model, batch, mesh,
            settings(remat=False, perturb=0.0, raw_noise_std=0.0,
                     shade_topk=topk),
            LightState.identity(), rng=None, train=False,
        )
        fast = render_rays(
            params, model, batch, mesh,
            settings(remat=False, perturb=0.0, raw_noise_std=0.0,
                     shade_topk=topk, reuse_warp_faces=True),
            LightState.identity(), rng=None, train=False,
        )
        # sigma path is untouched -> weights identical
        np.testing.assert_allclose(
            np.asarray(exact["weights"]), np.asarray(fast["weights"]),
            atol=1e-6,
        )
        c_exact = np.asarray(exact["color"])
        c_fast = np.asarray(fast["color"])
        assert np.isfinite(c_fast).all()
        # colors differ only where the re-search picked a different face
        # for the normal transport; on this scene that is a tiny minority
        close = np.isclose(c_exact, c_fast, atol=1e-3).all(axis=-1)
        assert close.mean() >= 0.9, close.mean()


def test_fine_and_gated_with_listed_knn(scene, model_params):
    """FINE_RAY_SAMPLING + SHADE_TOPK + knn_impl='listed' compose: the
    second _render_with_z call re-plans the listed search at the larger
    (S + n_fine) sample count, and the result matches the xla dispatch."""
    from dual_space_nerf_tpu.data.batching import item_to_mesh

    model, params = model_params
    mesh_t = item_to_mesh(
        {"xyz": scene.verts_world}, np.asarray(scene.faces), scene.verts_cano
    )
    assert mesh_t.tile_table is not None
    batch = _ray_batch(scene)
    base = dict(
        n_samples=S, sample_mode="GG", mlp_chunk=64, remat=False,
        n_fine=8, shade_topk=4, perturb=0.0, raw_noise_std=0.0,
    )
    out_l = render_rays(
        params, model, batch, mesh_t,
        RenderSettings(knn_impl="listed", **base),
        LightState.identity(), rng=None, train=False,
    )
    out_x = render_rays(
        params, model, batch, mesh_t,
        RenderSettings(knn_impl="xla", **base),
        LightState.identity(), rng=None, train=False,
    )
    for k in ("color", "fine_color", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(out_l[k]), np.asarray(out_x[k]), atol=1e-5, err_msg=k
        )


def test_full_shading_faceid_dataflow_matches_materialized(
    scene, mesh, model_params
):
    """The TPU full-shading dataflow (face-id exchange + in-chunk transport
    replay) is bit-level the same math as the CPU/golden materialized
    dataflow — outputs must agree to f32 roundoff, in eval and in grads."""
    model, params = model_params
    batch = _ray_batch(scene)
    kw = dict(shade_topk=0, remat=False)
    mat = render_rays(
        params, model, batch, mesh, settings(full_dataflow="materialized", **kw),
        LightState.identity(), rng=None, train=False,
    )
    fid = render_rays(
        params, model, batch, mesh, settings(full_dataflow="faceid", **kw),
        LightState.identity(), rng=None, train=False,
    )
    for key in ("color", "acc_map", "depth_map", "weights"):
        np.testing.assert_allclose(
            np.asarray(fid[key]), np.asarray(mat[key]), atol=1e-5,
            err_msg=key,
        )

    def loss(p, dataflow):
        out = render_rays(
            p, model, batch, mesh, settings(full_dataflow=dataflow, **kw),
            LightState.identity(), rng=None, train=False,
        )
        return jnp.mean(out["color"] ** 2) + jnp.mean(out["acc_map"])

    g_mat = jax.grad(loss)(params, "materialized")
    g_fid = jax.grad(loss)(params, "faceid")
    for a, b in zip(jax.tree.leaves(g_fid), jax.tree.leaves(g_mat)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_chunk_unroll_knob_bitwise_matches_map(monkeypatch):
    """DSNERF_CHUNK_UNROLL (the r4 double-buffering A/B) must be a pure
    schedule change: lax.scan(unroll=k) over chunks returns bit-identical
    results to the default lax.map, including the edge-padded tail chunk."""
    from dual_space_nerf_tpu.renderer.pipeline import _chunked_points

    def fn(args):
        x, y = args
        return (x * 2.0 + jnp.sin(y), x - y)

    n = 1000  # 8 chunks of 128 with a padded tail
    x = jnp.arange(n, dtype=jnp.float32)
    y = x * 0.1
    ref = _chunked_points(fn, n, 128, (x, y))
    monkeypatch.setenv("DSNERF_CHUNK_UNROLL", "2")
    out = _chunked_points(fn, n, 128, (x, y))
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
