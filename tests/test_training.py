"""Train-step, schedule, checkpoint, and sharding tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dual_space_nerf_tpu.config import get_cfg_defaults
from dual_space_nerf_tpu.data.synthetic import emission_color, make_scene
from dual_space_nerf_tpu.models import DualSpaceNeRF
from dual_space_nerf_tpu.renderer import MeshBundle, RayBatch, RenderSettings
from dual_space_nerf_tpu.training import (
    Checkpointer,
    TrainBatch,
    create_train_state,
    make_optimizer,
    make_train_step,
    reference_schedule,
)

R, S = 16, 8


def _cfg():
    cfg = get_cfg_defaults()
    cfg.SOLVER.BASE_LR = 5e-4
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.START_ITERS = 100
    cfg.SOLVER.END_ITERS = 200
    cfg.SOLVER.LR_SCALE = 0.09
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    return cfg


@pytest.fixture(scope="module")
def setup():
    scene = make_scene(n_theta=14, n_phi=12)
    mesh = MeshBundle(
        faces=jnp.asarray(scene.faces),
        verts_world=jnp.asarray(scene.verts_world),
        verts_cano=jnp.asarray(scene.verts_cano),
    )
    model = DualSpaceNeRF(max_frames=10)
    tx, _ = make_optimizer(_cfg())
    state = create_train_state(model, tx, jax.random.key(0))
    return scene, mesh, model, tx, state


def _train_batch(scene, r=R, seed=7):
    rng = np.random.default_rng(seed)
    eye = (-scene.R.T @ scene.T).ravel()
    tgt_idx = rng.integers(0, len(scene.verts_world), r)
    targets = scene.verts_world[tgt_idx] + 0.03 * rng.standard_normal((r, 3))
    d = (targets - eye).astype(np.float32)
    rays = RayBatch(
        ray_o=jnp.asarray(np.broadcast_to(eye, (r, 3)), jnp.float32),
        ray_d=jnp.asarray(d),
        near=jnp.full((r,), 0.5, jnp.float32),
        far=jnp.full((r,), 2.0, jnp.float32),
        frame=jnp.asarray(0, jnp.int32),
        body_pose=jnp.asarray(scene.poses[1:]),
    )
    rgb = emission_color(scene.verts_cano[tgt_idx]).astype(np.float32)
    return TrainBatch(
        rays=rays, rgb=jnp.asarray(rgb), occupancy=jnp.ones((r,), jnp.float32)
    )


def test_reference_schedule_phases():
    s = reference_schedule(warmup_iters=10, start_iters=100, end_iters=200, scale=0.1)
    np.testing.assert_allclose(s(0), 0.1, atol=1e-6)       # (0+1)/10
    np.testing.assert_allclose(s(4), 0.5, atol=1e-6)
    np.testing.assert_allclose(s(50), 1.0, atol=1e-6)      # plateau
    np.testing.assert_allclose(
        s(99), 0.9 * np.exp(0.0) + 0.1, atol=1e-6
    )  # decay starts at it=100 (epoch0 = step+1)
    np.testing.assert_allclose(
        s(199), 0.9 * np.exp(-1.0) + 0.1, atol=1e-5
    )
    # decay continues past END (reference formula has no clamp)
    assert float(s(400)) < float(s(199))


def test_train_step_reduces_loss(setup):
    scene, mesh, model, tx, state = setup
    sett = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=R * S, knn_impl="xla"
    )
    step = make_train_step(model, tx, sett)
    batch = _train_batch(scene)
    rng = jax.random.key(42)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch, mesh, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_zero_density_gradient_keeps_grads_finite(setup):
    """Regression: a sample whose density gradient is EXACTLY zero in f32
    makes the normal-transport input (end_w - start_w) vanish; the old
    `nrm / maximum(norm(nrm), 1e-12)` then emitted 0 * (0/0) = NaN in the
    backward pass and one such sample poisoned the entire step's params
    (observed in vivo: r4 quality probe, healthy PSNR 27.2 at epoch 162,
    permanently NaN from 163). Zeroed params give a constant density field
    -> EVERY sample hits the zero-normal case -> the step must stay
    finite."""
    scene, mesh, model, tx, state = setup
    sett = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=R * S, knn_impl="xla"
    )
    step = make_train_step(model, tx, sett)
    batch = _train_batch(scene)
    # fresh state: the module fixture's state buffers are donated (hence
    # deleted) by earlier tests' step calls
    fresh = create_train_state(model, tx, jax.random.key(0))
    zero_state = fresh._replace(
        params=jax.tree.map(jnp.zeros_like, fresh.params)
    )
    new_state, metrics = step(zero_state, batch, mesh, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    leaves = jax.tree.leaves(new_state.params)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)


def test_train_step_sharded_over_ray_mesh(setup):
    """Data-parallel over rays on the 8-virtual-CPU-device mesh."""
    scene, mesh, model, tx, _ = setup
    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest must provide 8 virtual devices"
    ray_mesh = Mesh(devices, ("rays",))
    sett = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=2 * S, knn_impl="xla"
    )
    step = make_train_step(model, tx, sett, mesh=ray_mesh)
    state = create_train_state(model, tx, jax.random.key(0))
    batch = _train_batch(scene, r=16)  # 2 rays per device
    rng = jax.random.key(0)
    state2, metrics = step(state, batch, mesh, rng)
    assert np.isfinite(float(metrics["loss"]))
    # params updated and replicated
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_sharded_matches_single_device(setup):
    """The ray-sharded step must compute the same update as unsharded."""
    scene, mesh, model, tx, _ = setup
    sett = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=2 * S, knn_impl="xla",
        perturb=0.0, raw_noise_std=0.0,
    )
    batch = _train_batch(scene, r=16)
    rng = jax.random.key(3)

    state_a = create_train_state(model, tx, jax.random.key(0))
    step_a = make_train_step(model, tx, sett)
    state_a, ma = step_a(state_a, batch, mesh, rng)

    ray_mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    state_b = create_train_state(model, tx, jax.random.key(0))
    step_b = make_train_step(model, tx, sett, mesh=ray_mesh)
    state_b, mb = step_b(state_b, batch, mesh, rng)

    np.testing.assert_allclose(
        float(ma["loss"]), float(mb["loss"]), rtol=1e-5
    )
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, setup):
    scene, mesh, model, tx, _ = setup
    state = create_train_state(model, tx, jax.random.key(17))
    ck = Checkpointer(str(tmp_path))
    path = ck.save("model_epoch_0000003", state, epoch=3)
    assert os.path.exists(path)
    assert ck.has_checkpoint()

    template = create_train_state(model, tx, jax.random.key(99))
    restored, epoch = ck.resume_or_load("", template, resume=True)
    assert epoch == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # params-only load (eval path)
    params = ck.load_params_only(path, template.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fine_pass_is_supervised(setup):
    """With n_fine > 0 the loss carries a fine term and fine params get
    gradients (the fine render must not be dead compute; the reference's
    trainer only reads tmp["coarse"], trainer.py:70-75)."""
    scene, mesh, model, tx, _ = setup
    sett = RenderSettings(
        n_samples=S, n_fine=S, sample_mode="GG", mlp_chunk=R * S,
        knn_impl="xla", perturb=0.0, raw_noise_std=0.0,
    )
    step = make_train_step(model, tx, sett)
    state = create_train_state(model, tx, jax.random.key(0))
    batch = _train_batch(scene)
    state2, metrics = step(state, batch, mesh, jax.random.key(1))
    assert "fine_loss_rgb" in metrics
    assert np.isfinite(float(metrics["fine_loss_rgb"]))
    # total loss includes the fine term
    total = sum(
        float(v) for k, v in metrics.items() if k.startswith(("loss_", "fine_"))
    )
    np.testing.assert_allclose(float(metrics["loss"]), total, rtol=1e-5)


@pytest.mark.slow
def test_sharded_step_with_pruned_pallas_kernel(setup):
    """The production Pallas KNN inside the GSPMD-sharded train jit
    (interpret mode on CPU): sharded == unsharded. On a real pod this is
    the path knn_impl='auto' takes."""
    from dual_space_nerf_tpu.data.batching import item_to_mesh

    scene, _, model, tx, _ = setup
    geom = item_to_mesh(
        {"xyz": scene.verts_world},
        np.asarray(scene.faces), scene.verts_cano,
    )
    sett = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=2 * S, knn_impl="pruned",
        perturb=0.0, raw_noise_std=0.0,
    )
    batch = _train_batch(scene, r=16)
    rng = jax.random.key(3)

    state_a = create_train_state(model, tx, jax.random.key(0))
    step_a = make_train_step(model, tx, sett)
    state_a, ma = step_a(state_a, batch, geom, rng)

    ray_mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    state_b = create_train_state(model, tx, jax.random.key(0))
    step_b = make_train_step(model, tx, sett, mesh=ray_mesh)
    state_b, mb = step_b(state_b, batch, geom, rng)

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_sharded_step_with_fused_mlp(setup):
    """The fused SpaceNet Pallas kernels inside the GSPMD-sharded train jit
    (interpret mode on CPU, gated shading): sharded == unsharded. On a real
    pod this is the MODEL.FUSED_MLP production path."""
    scene, mesh, model, tx, _ = setup
    sett = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=2 * S, knn_impl="xla",
        perturb=0.0, raw_noise_std=0.0, fused_mlp=True, fused_block=64,
        shade_topk=4,
    )
    batch = _train_batch(scene, r=16)
    rng = jax.random.key(3)

    state_a = create_train_state(model, tx, jax.random.key(0))
    step_a = make_train_step(model, tx, sett)
    state_a, ma = step_a(state_a, batch, mesh, rng)

    ray_mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    state_b = create_train_state(model, tx, jax.random.key(0))
    step_b = make_train_step(model, tx, sett, mesh=ray_mesh)
    state_b, mb = step_b(state_b, batch, mesh, rng)

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
