"""Golden end-to-end parity against the ACTUAL reference pipeline.

Runs the original `/root/reference` code (CPU torch) with its single CUDA
dependency — pytorch3d's `knn_points` (`utils/render_utils.py:1,84-99`) —
replaced by an exact brute-force torch KNN, and `.cuda()` patched to the
identity. The reference's own Renderer.render() then produces golden tensors
(z_vals, warped canonical points, transparent mask, sigma, essence, final
color/disp/acc/depth/weights) on a tiny synthetic mesh, and the JAX pipeline
must match each stage to f32 tolerance.

This converts round-1's "parity by transcription" (tests/test_torch_parity.py
rebuilds the layer spec independently) into "parity by measurement" against
the reference's executable behavior.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dual_space_nerf_tpu.config import get_cfg_defaults
from dual_space_nerf_tpu.data.synthetic import make_scene
from dual_space_nerf_tpu.models import DualSpaceNeRF
from dual_space_nerf_tpu.ops import face_centroids
from dual_space_nerf_tpu.renderer import (
    LightState,
    MeshBundle,
    RayBatch,
    RenderSettings,
    render_rays,
)
from dual_space_nerf_tpu.renderer.pipeline import warp_world_to_canonical

# interpret-mode Pallas / torch-reference parity: the heavy tier.
# Fast CI runs 'pytest -m "not slow"'; the full battery runs everything.
pytestmark = pytest.mark.slow

REFERENCE = "/root/reference"

R, S = 24, 16  # rays, samples/ray


def _fake_pytorch3d():
    """Exact brute-force stand-ins for pytorch3d.ops.knn_points/knn_gather."""

    def knn_points(p1, p2, K=1, return_nn=False, **kw):
        d = ((p1[:, :, None, :] - p2[:, None, :, :]) ** 2).sum(-1)  # (B,N,M)
        dists, idx = torch.topk(d, K, dim=-1, largest=False)
        nn = knn_gather(p2, idx) if return_nn else None
        return dists, idx, nn

    def knn_gather(x, idx):
        # x (B,M,D), idx (B,N,K) -> (B,N,K,D)
        b, n, k = idx.shape
        d = x.shape[-1]
        flat = idx.reshape(b, n * k, 1).expand(-1, -1, d)
        return torch.gather(x, 1, flat).reshape(b, n, k, d)

    ops = types.ModuleType("pytorch3d.ops")
    ops.knn_points = knn_points
    ops.knn_gather = knn_gather
    pkg = types.ModuleType("pytorch3d")
    pkg.ops = ops
    return pkg, ops


@pytest.fixture(scope="module")
def reference_env(tmp_path_factory):
    """Import the reference with pytorch3d stubbed and .cuda() neutralized."""
    saved_modules = dict(sys.modules)
    saved_cuda = (torch.Tensor.cuda, torch.nn.Module.cuda)
    # tests/test_torch_parity.py sets the default dtype to float64 at module
    # import; the reference pipeline mixes fresh tensors with f32 inputs and
    # needs the stock default
    saved_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float32)
    pkg, ops = _fake_pytorch3d()
    sys.modules["pytorch3d"] = pkg
    sys.modules["pytorch3d.ops"] = ops
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REFERENCE)
    try:
        import can_render as ref_can_render  # noqa: F401
        from model import spacenet as ref_spacenet  # noqa: F401

        yield ref_can_render, ref_spacenet
    finally:
        sys.path.remove(REFERENCE)
        torch.Tensor.cuda, torch.nn.Module.cuda = saved_cuda
        torch.set_default_dtype(saved_dtype)
        for name in list(sys.modules):
            if name not in saved_modules:
                del sys.modules[name]


def _write_fake_smpl(path, scene):
    import pickle

    kintree = np.zeros((2, 24), np.int64)
    kintree[0] = np.arange(24) - 1
    kintree[0, 0] = 0
    data = {
        "kintree_table": kintree,
        "weights": np.ones((len(scene.verts_world), 24), np.float64) / 24.0,
        "f": np.asarray(scene.faces, np.int64),
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)


@pytest.fixture(scope="module")
def golden(reference_env, tmp_path_factory):
    """Run the reference pipeline once; return all golden tensors + inputs."""
    ref_can_render, ref_spacenet = reference_env
    rng = np.random.default_rng(11)

    scene = make_scene(n_theta=14, n_phi=12)
    smpl_pkl = tmp_path_factory.mktemp("smpl") / "SMPL_NEUTRAL.pkl"
    _write_fake_smpl(smpl_pkl, scene)

    cfg = get_cfg_defaults()
    cfg.MODEL.TYPE = "nerf"  # render_rays dispatches on this, can_render.py:107
    cfg.MODEL.COARSE_RAY_SAMPLING = S
    cfg.MODEL.FINE_RAY_SAMPLING = -1
    cfg.MODEL.sample_points_mode = "GG"
    cfg.DATASETS.SMPL_PATH = str(smpl_pkl)

    torch.manual_seed(0)
    ref_net = ref_spacenet.DualSpaceNeRF(cfg).float()
    # the randomly-initialized density head emits sigma <= 0 at every sample
    # (relu(sigma) == 0 -> all weights/colors identically zero, which would
    # make the color-path comparisons vacuous); bias it positive so the
    # composited outputs carry real signal through both pipelines
    with torch.no_grad():
        ref_net.nerf.density_net[0].bias += 3.0
    ref_net.eval()
    renderer = ref_can_render.Renderer(
        ref_net,
        cfg=cfg,
        canonical_vertex=torch.tensor(scene.verts_cano, dtype=torch.float32),
    )
    renderer.eval()

    # rays aimed at the surface (same recipe as the other tests)
    eye = (-scene.R.T @ scene.T).ravel()
    targets = scene.verts_world[rng.integers(0, len(scene.verts_world), R)]
    targets = targets + 0.03 * rng.standard_normal((R, 3))
    d = (targets - eye).astype(np.float32)
    poses = (0.1 * rng.standard_normal((24, 3))).astype(np.float32)

    batch = {
        "ray_o": torch.tensor(np.broadcast_to(eye, (1, R, 3)).copy(), dtype=torch.float32),
        "ray_d": torch.tensor(d[None], dtype=torch.float32),
        "near": torch.full((1, R), 0.5),
        "far": torch.full((1, R), 3.0),
        "xyz": torch.tensor(scene.verts_world[None], dtype=torch.float32),
        "frame": torch.tensor([3], dtype=torch.long),
        "poses": torch.tensor(poses[None], dtype=torch.float32),
    }

    # --- stage captures from the reference's own functions ---
    pts_world, z_vals = renderer.get_sampling_points(
        batch["ray_o"], batch["ray_d"],
        batch["near"].clone(), batch["far"].clone(),
        batch["xyz"], mode="GG",
    )
    pts_cat, rays_cat, tmask = renderer.w2l(
        pts_world, batch["ray_o"], batch["ray_d"], batch
    )

    # --- the full reference train-path render (render(), eval mode) ---
    ret = renderer.render(
        {k: (v.clone() if torch.is_tensor(v) else v) for k, v in batch.items()}
    )["coarse"]

    return {
        "scene": scene,
        "cfg": cfg,
        "renderer": renderer,
        "batch": batch,
        "ref_net": ref_net,
        "batch_np": {
            "eye": eye, "ray_d": d, "poses": poses, "frame": 3,
            "near": 0.5, "far": 3.0,
        },
        "z_vals": z_vals.reshape(R, S).detach().numpy(),
        "pts_cano": pts_cat[..., 3:].reshape(R * S, 3).detach().numpy(),
        "pts_world": pts_cat[..., :3].reshape(R * S, 3).detach().numpy(),
        "tmask": tmask.reshape(R * S).detach().numpy(),
        "color": ret["color"].reshape(R, 3).detach().numpy(),
        "disp": ret["disp_map"].reshape(R).detach().numpy(),
        "acc": ret["acc_map"].reshape(R).detach().numpy(),
        "depth": ret["depth_map"].reshape(R).detach().numpy(),
        "weights": ret["weights"].reshape(R, S).detach().numpy(),
    }


def _flax_params_from_ref(ref_net, template):
    """Copy the reference torch weights into our flax parameter tree."""

    def k(linear):
        return jnp.asarray(linear.weight.detach().numpy().T)

    def b(linear):
        return jnp.asarray(linear.bias.detach().numpy())

    p = jax.tree.map(lambda x: x, template)  # deep-ish copy of the dict tree
    nerf = p["params"]["nerf"]
    stage1 = [ref_net.nerf.stage1[i] for i in (0, 2, 4, 6)]
    stage2 = [ref_net.nerf.stage2[i] for i in (0, 2, 4)]
    for i, lin in enumerate(stage1 + stage2):
        nerf[f"Dense_{i}"]["Dense_0"]["kernel"] = k(lin)
        nerf[f"Dense_{i}"]["Dense_0"]["bias"] = b(lin)
    nerf["Dense_7"]["Dense_0"]["kernel"] = k(ref_net.nerf.density_net[0])
    nerf["Dense_7"]["Dense_0"]["bias"] = b(ref_net.nerf.density_net[0])
    for i, lin in zip((8, 9), (ref_net.nerf.rgb_net[1], ref_net.nerf.rgb_net[3])):
        nerf[f"Dense_{i}"]["Dense_0"]["kernel"] = k(lin)
        nerf[f"Dense_{i}"]["Dense_0"]["bias"] = b(lin)
    nerf["embedding"]["embedding"] = jnp.asarray(
        ref_net.nerf.embedding.weight.detach().numpy()
    )
    light = p["params"]["lighting_mlp"]
    for i, lin in enumerate(
        [ref_net.lighting_mlp.lights_encoding[j] for j in (0, 2, 4)]
    ):
        light[f"Dense_{i}"]["Dense_0"]["kernel"] = k(lin)
        light[f"Dense_{i}"]["Dense_0"]["bias"] = b(lin)
    pose = p["params"]["pose_mlp"]
    for i, lin in enumerate([ref_net.pose_mlp[j] for j in (0, 2, 4)]):
        pose[f"Dense_{i}"]["Dense_0"]["kernel"] = k(lin)
        pose[f"Dense_{i}"]["Dense_0"]["bias"] = b(lin)
    return p


@pytest.fixture(scope="module")
def ours(golden):
    """Run our pipeline with the reference's weights on identical inputs."""
    scene = golden["scene"]
    bn = golden["batch_np"]
    model = DualSpaceNeRF()
    template = model.init(
        jax.random.key(0), jnp.zeros((4, 3)), jnp.zeros((4,), jnp.int32),
        jnp.zeros((4, 16)),
    )
    params = _flax_params_from_ref(golden["ref_net"], template)

    mesh = MeshBundle(
        faces=jnp.asarray(scene.faces),
        verts_world=jnp.asarray(scene.verts_world),
        verts_cano=jnp.asarray(scene.verts_cano),
    )
    rays = RayBatch(
        ray_o=jnp.asarray(np.broadcast_to(bn["eye"], (R, 3)), jnp.float32),
        ray_d=jnp.asarray(bn["ray_d"]),
        near=jnp.full((R,), bn["near"], jnp.float32),
        far=jnp.full((R,), bn["far"], jnp.float32),
        frame=jnp.asarray(bn["frame"], jnp.int32),
        body_pose=jnp.asarray(bn["poses"][1:]),
    )
    settings = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=R * S, knn_impl="xla",
    )
    out = render_rays(
        params, model, rays, mesh, settings, LightState.identity(),
        rng=None, train=False,
    )
    return {"params": params, "model": model, "mesh": mesh, "rays": rays,
            "settings": settings, "out": out}


def test_z_vals_match(golden, ours):
    np.testing.assert_allclose(
        np.asarray(ours["out"]["z_vals"]), golden["z_vals"], atol=2e-5
    )


def test_warp_and_transparent_mask_match(golden, ours):
    """Stage capture: warped canonical points + transparent mask."""
    from dual_space_nerf_tpu.geometry import sample_along_rays

    rays, mesh, settings = ours["rays"], ours["mesh"], ours["settings"]
    z = jnp.asarray(golden["z_vals"])
    pts_w = sample_along_rays(rays.ray_o, rays.ray_d, z).reshape(-1, 3)
    np.testing.assert_allclose(
        np.asarray(pts_w), golden["pts_world"], atol=2e-5
    )
    cents = face_centroids(mesh.verts_world, mesh.faces)
    pts_c, tmask, _, _ = warp_world_to_canonical(pts_w, mesh, cents, settings)
    np.testing.assert_allclose(
        np.asarray(pts_c), golden["pts_cano"], atol=3e-4
    )
    np.testing.assert_array_equal(
        np.asarray(tmask), golden["tmask"].astype(bool)
    )


def test_sigma_essence_match(golden, ours):
    """Stage capture: raw network outputs on the reference's warped points."""
    model, params = ours["model"], ours["params"]
    pts_c = jnp.asarray(golden["pts_cano"])
    n = pts_c.shape[0]
    pose_feat = model.apply(
        params, ours["rays"].body_pose, method="pose_feature"
    )
    essence, density = model.apply(
        params, pts_c, jnp.full((n,), 3, jnp.int32),
        jnp.broadcast_to(pose_feat, (n, 16)), 1.0, method="sigma_essence",
    )

    ref_net = golden["ref_net"]
    pos6 = torch.tensor(
        np.concatenate([golden["pts_world"], golden["pts_cano"]], -1)
    )
    rays6 = torch.tensor(
        np.concatenate(
            [
                np.repeat(golden["batch_np"]["ray_d"], S, axis=0),
                np.zeros((n, 3), np.float32),
            ],
            -1,
        )
    )
    pose_t = torch.tensor(golden["batch_np"]["poses"][None])
    e_t, d_t, _ = ref_net(
        pos6, rays6, torch.full((n,), 3, dtype=torch.long),
        batch_info={
            "poses": pose_t,
            "canonical_model": {
                "meshes": torch.tensor(
                    golden["scene"].verts_cano[golden["scene"].faces]
                )
            },
            "xyz": torch.tensor(golden["scene"].verts_world[None]),
            "face_idx": torch.tensor(golden["scene"].faces, dtype=torch.long),
        },
    )
    np.testing.assert_allclose(
        np.asarray(density)[:, 0], d_t.detach().numpy()[:, 0], atol=2e-3
    )
    # essence is pre-lighting; the reference's forward returns the LIT color,
    # so compare our full lit color against it in test_final_outputs instead.
    del essence, e_t


def test_final_outputs_match(golden, ours):
    out = ours["out"]
    np.testing.assert_allclose(
        np.asarray(out["color"]), golden["color"], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["acc_map"]), golden["acc"], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["depth_map"]), golden["depth"], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["weights"]), golden["weights"], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["disp_map"]), golden["disp"], rtol=2e-3, atol=2e-3
    )


def _run_reference(golden):
    """Re-render the reference with whatever light state is set on its net."""
    batch = {
        k: (v.clone() if torch.is_tensor(v) else v)
        for k, v in golden["batch"].items()
    }
    return (
        golden["renderer"].render(batch)["coarse"]["color"]
        .reshape(R, 3).detach().numpy()
    )


def _run_ours(ours, light):
    out = render_rays(
        ours["params"], ours["model"], ours["rays"], ours["mesh"],
        ours["settings"], light, rng=None, train=False,
    )
    return np.asarray(out["color"])


def test_relight_rotation_matches_reference(golden, ours):
    """The vis_lighting path: world xy rotated about a pivot before the
    LightingMLP (`spacenet.py:254-258`, `vis_lighting.py:57-58,86-91`) ==
    our LightState(rot, rot_center)."""
    angle = 72.0
    rad = np.pi * angle / 180.0
    rot = np.array(
        [[np.cos(rad), -np.sin(rad)], [np.sin(rad), np.cos(rad)]], np.float32
    )
    center = np.array([0.05, -0.02, 0.6], np.float32)

    net = golden["ref_net"]
    net.set_rot_center(torch.tensor(center)[None])
    net.set_rot(torch.tensor(rot))
    try:
        want = _run_reference(golden)
    finally:
        net.rot_center = None
        net.rot = None

    light = LightState.identity()._replace(
        rot=jnp.asarray(rot), rot_center=jnp.asarray(center)
    )
    got = _run_ours(ours, light)
    np.testing.assert_allclose(got, want, atol=2e-3)
    # and the rotation must actually change the image
    base = _run_ours(ours, LightState.identity())
    assert np.abs(got - base).max() > 1e-4


def test_light_center_and_zero_code_match_reference(golden, ours):
    """The novel-pose inference setup: light_center world shift
    (`spacenet.py:260-263`) + frame-code zeroing (`nerf.w = 0`,
    `test.py:193-196`) == our LightState(light_bias, code_scale=0)."""
    light_center = np.array([0.3, -0.1, 1.1], np.float32)
    th = np.zeros((1, 1, 3), np.float32)  # batch Th (subject translation)

    net = golden["ref_net"]
    golden["batch"]["Th"] = torch.tensor(th)
    net.set_light_center(torch.tensor(light_center))
    net.nerf.w = 0
    try:
        want = _run_reference(golden)
    finally:
        net.light_center = None
        net.nerf.w = None
        del golden["batch"]["Th"]

    bias = light_center - th.reshape(-1, 3).mean(axis=0)
    light = LightState.identity()._replace(
        light_bias=jnp.asarray(bias),
        code_scale=jnp.asarray(0.0, jnp.float32),
    )
    got = _run_ours(ours, light)
    np.testing.assert_allclose(got, want, atol=2e-3)
    base = _run_ours(ours, LightState.identity())
    assert np.abs(got - base).max() > 1e-4


def test_uniform_sampling_mode_matches_reference(golden, ours):
    """sample_points_mode='uniform' z values vs the reference's
    uniform_sampling (`pts_utils.py:3-16`), eval determinism."""
    b = golden["batch"]
    _, z_ref = golden["renderer"].get_sampling_points(
        b["ray_o"], b["ray_d"], b["near"].clone(), b["far"].clone(),
        b["xyz"], mode="uniform",
    )
    sett = RenderSettings(
        n_samples=S, sample_mode="uniform", mlp_chunk=R * S, knn_impl="xla",
    )
    out = render_rays(
        ours["params"], ours["model"], ours["rays"], ours["mesh"], sett,
        LightState.identity(), rng=None, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["z_vals"]), z_ref.reshape(R, S).numpy(), atol=2e-5
    )


def test_gated_shading_divergence_bound(golden, ours):
    """Weights-matched direct gate for the production approximations:
    gated shading (SHADE_TOPK + nearest-shaded tail completion) and
    REUSE_WARP_FACES, rendered with the GOLDEN reference weights on the
    golden rays, must stay within a small per-ray color divergence of the
    exact render — a direct bound, independent of the convergence A/Bs
    (scripts/ab_convergence.py) that measure training-quality neutrality."""
    import dataclasses

    exact = _run_ours(ours, LightState.identity())
    np.testing.assert_allclose(exact, golden["color"], atol=2e-3)

    for kw in (
        {"shade_topk": 8},
        {"shade_topk": 8, "reuse_warp_faces": True},
    ):
        sett = dataclasses.replace(ours["settings"], **kw)
        out = render_rays(
            ours["params"], ours["model"], ours["rays"], ours["mesh"], sett,
            LightState.identity(), rng=None, train=False,
        )
        approx = np.asarray(out["color"])
        err = np.abs(approx - exact)
        # K=8 of S=16 must cover the weight mass on these surface-aimed
        # rays: bound both the worst ray and the mean
        assert err.max() < 0.05, f"{kw}: max |dcolor| = {err.max()}"
        assert err.mean() < 5e-3, f"{kw}: mean |dcolor| = {err.mean()}"
        # density/weights are computed at EVERY sample — gating may not
        # change them at all
        np.testing.assert_allclose(
            np.asarray(out["acc_map"]),
            np.asarray(ours["out"]["acc_map"]), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["weights"]),
            np.asarray(ours["out"]["weights"]), atol=1e-5,
        )


def test_converted_checkpoint_render_matches_golden(golden, ours, tmp_path):
    """Close the converter loop with IMAGES, not name maps: the reference
    net's own ``state_dict()`` saved as a reference-style ``.pth`` payload
    (``utils/checkpoint.py:113-118``), converted by
    ``tool/convert_reference_checkpoint.py``, loaded through the eval-CLI
    path, must render the golden color."""
    from dual_space_nerf_tpu.training.checkpoint import Checkpointer
    from tool.convert_reference_checkpoint import convert_file

    in_path = tmp_path / "model_epoch_0000007.pth"
    out_path = tmp_path / "converted.ckpt"
    torch.save(
        {
            "model": golden["ref_net"].state_dict(),
            "training_status": {"epoch": 7, "iteration": 70},
        },
        in_path,
    )
    convert_file(str(in_path), str(out_path))
    loaded = Checkpointer(str(tmp_path)).load_params_only(
        str(out_path), jax.device_get(ours["params"])
    )

    out = render_rays(
        jax.tree.map(jnp.asarray, loaded), ours["model"], ours["rays"],
        ours["mesh"], ours["settings"], LightState.identity(),
        rng=None, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["color"]), golden["color"], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["acc_map"]), golden["acc"], atol=2e-3
    )


def test_exported_checkpoint_renders_in_reference(golden, ours, tmp_path):
    """The reverse direction: our ``.ckpt`` exported by
    ``tool/export_reference_checkpoint.py`` and loaded into a FRESH
    (differently-initialized) reference model via the reference's own eval
    path (``torch.load(ckpt)["model"]`` -> ``load_state_dict``,
    ``validate.py:18-28``) must reproduce the golden render with the
    reference's renderer."""
    from dual_space_nerf_tpu.config import get_cfg_defaults as _gcd  # noqa: F401
    from dual_space_nerf_tpu.training import (
        create_train_state,
        make_optimizer,
    )
    from dual_space_nerf_tpu.training.checkpoint import Checkpointer
    from tool.export_reference_checkpoint import export_file

    cfg = golden["cfg"]
    tx, _ = make_optimizer(cfg)
    state = create_train_state(ours["model"], tx, jax.random.key(5))
    state = state._replace(params=jax.tree.map(jnp.asarray, ours["params"]))
    ck = Checkpointer(str(tmp_path))
    ckpt_path = ck.save("model_epoch_0000008", state, 8)
    pth_path = tmp_path / "exported.pth"
    export_file(ckpt_path, str(pth_path))

    import model.spacenet as ref_spacenet  # the reference_env import

    torch.manual_seed(77)  # a DIFFERENT init than the golden net
    fresh_net = ref_spacenet.DualSpaceNeRF(cfg).float()
    payload = torch.load(pth_path, map_location="cpu", weights_only=True)
    missing, unexpected = fresh_net.load_state_dict(
        payload["model"], strict=False
    )
    assert not unexpected, unexpected
    # the reference tracks no buffers beyond parameters; everything the
    # golden net owns must have been supplied by the export
    assert set(missing) == set(), missing
    fresh_net.eval()

    import can_render as ref_can_render

    renderer = ref_can_render.Renderer(
        fresh_net,
        cfg=cfg,
        canonical_vertex=torch.tensor(
            golden["scene"].verts_cano, dtype=torch.float32
        ),
    )
    renderer.eval()
    batch = {
        k: (v.clone() if torch.is_tensor(v) else v)
        for k, v in golden["batch"].items()
    }
    got = (
        renderer.render(batch)["coarse"]["color"]
        .reshape(R, 3).detach().numpy()
    )
    np.testing.assert_allclose(got, golden["color"], atol=2e-3)


def test_fused_kernels_match_reference_goldens(golden, ours):
    """The fused SpaceNet Pallas path (MODEL.FUSED_MLP) against the
    reference-captured tensors directly — not merely against our own XLA
    transcription (tests/test_fused_mlp.py does that)."""
    import dataclasses

    sett = dataclasses.replace(ours["settings"], fused_mlp=True,
                               fused_block=64)
    out = render_rays(
        ours["params"], ours["model"], ours["rays"], ours["mesh"], sett,
        LightState.identity(), rng=None, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["color"]), golden["color"], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["acc_map"]), golden["acc"], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["weights"]), golden["weights"], atol=2e-3
    )
