"""Config-node tests: yacs-compatible merge, freeze, and CLI coercion."""

import pytest

from dual_space_nerf_tpu.config import get_cfg_defaults


def test_merge_from_list_coercion():
    """yacs-style literal_eval coercion: bare scientific notation must
    parse as float (PyYAML's resolver would keep '5e-4' a string) and
    YAML-1.1 bool words must stay strings."""
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["SOLVER.BASE_LR", "5e-4"])
    assert cfg.SOLVER.BASE_LR == 5e-4
    cfg.merge_from_list(["SOLVER.MAX_EPOCHS", "50"])
    assert cfg.SOLVER.MAX_EPOCHS == 50
    cfg.merge_from_list(["MODEL.LOSS", "NO"])  # a string slot stays str
    assert cfg.MODEL.LOSS == "NO"
    cfg.merge_from_list(["MODEL.LOSSwMask", "True"])
    assert cfg.MODEL.LOSSwMask is True


def test_merge_from_list_rejects_bad_key_and_type():
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["SOLVER.NO_SUCH_KEY", "1"])
    with pytest.raises(TypeError):
        cfg.merge_from_list(["SOLVER.MAX_EPOCHS", "not_a_number"])


def test_freeze_blocks_writes():
    cfg = get_cfg_defaults()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 1.0
    assert cfg.SOLVER.BASE_LR == 1.0


def test_clone_is_deep():
    cfg = get_cfg_defaults()
    c2 = cfg.clone()
    c2.SOLVER.BASE_LR = 123.0
    assert cfg.SOLVER.BASE_LR != 123.0


def test_render_settings_auto_policies():
    """MODEL.REMAT/MLP_CHUNK "auto" resolve per shade_topk (v5e-measured:
    full shading wants remat + 8192 chunks, gated wants neither)."""
    from dual_space_nerf_tpu.config import get_cfg_defaults
    from dual_space_nerf_tpu.renderer import RenderSettings
    from dual_space_nerf_tpu.renderer.pipeline import (
        _resolve_remat,
        resolve_mlp_chunk,
    )

    cfg = get_cfg_defaults()  # REMAT "auto", MLP_CHUNK -1, SHADE_TOPK 0
    s = RenderSettings.from_cfg(cfg)
    assert s.remat is True and s.mlp_chunk == 8192

    cfg2 = cfg.clone()
    cfg2.MODEL.SHADE_TOPK = 8
    s2 = RenderSettings.from_cfg(cfg2)
    assert s2.remat is False and s2.mlp_chunk == 16384

    # K > 8 gating resolves like the heavy color-graph configs: remat +
    # finer chunks (K=16 sweep, v5e 2026-08-20: 174.9k vs 166.7k rays/s)
    cfg2b = cfg.clone()
    cfg2b.MODEL.SHADE_TOPK = 16
    s2b = RenderSettings.from_cfg(cfg2b)
    assert s2b.remat is True and s2b.mlp_chunk == 8192

    # explicit values are honored verbatim, any topk
    cfg3 = cfg.clone()
    cfg3.MODEL.REMAT = True
    cfg3.MODEL.MLP_CHUNK = 2048
    s3 = RenderSettings.from_cfg(cfg3)
    assert s3.remat is True and s3.mlp_chunk == 2048

    assert _resolve_remat("off", 0) is False
    assert _resolve_remat("on", 8) is True
    assert resolve_mlp_chunk(0, 8) == 16384
    import pytest as _pytest
    with _pytest.raises(ValueError, match="REMAT"):
        _resolve_remat("maybe", 0)


def test_bool_overrides_merge_into_auto_sentinels(tmp_path):
    """The tri-state knobs documented as "auto" | True | False must accept
    bool replacements through BOTH config surfaces: a YAML `REMAT: true`
    (incl. unquoted on/off, which PyYAML 1.1 parses as bools) and the CLI
    override list."""
    from dual_space_nerf_tpu.renderer import RenderSettings

    yml = tmp_path / "o.yml"
    yml.write_text("MODEL:\n  REMAT: true\n  FUSED_MLP: off\n")
    cfg = get_cfg_defaults()
    cfg.merge_from_file(str(yml))
    assert cfg.MODEL.REMAT is True and cfg.MODEL.FUSED_MLP is False
    s = RenderSettings.from_cfg(cfg)
    assert s.remat is True and s.fused_mlp is False

    cfg2 = get_cfg_defaults()
    cfg2.merge_from_list(["MODEL.REMAT", "True", "MODEL.FUSED_MLP", "False"])
    assert cfg2.MODEL.REMAT is True and cfg2.MODEL.FUSED_MLP is False


def test_listed_slot_space_matches_face_space():
    """A render through the listed search (slot-space ids) must equal the
    same render through the brute XLA search (face-id space)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dual_space_nerf_tpu.config import get_cfg_defaults
    from dual_space_nerf_tpu.data.synthetic import make_scene
    from dual_space_nerf_tpu.data.batching import item_to_mesh
    from dual_space_nerf_tpu.models import DualSpaceNeRF
    from dual_space_nerf_tpu.renderer import (
        LightState,
        RayBatch,
        RenderSettings,
        render_rays,
    )

    scene = make_scene(n_theta=18, n_phi=20)
    mesh = item_to_mesh(
        {"xyz": scene.verts_world}, scene.faces, scene.verts_cano
    )
    rng = np.random.default_rng(3)
    r = 48
    eye = (-scene.R.T @ scene.T).ravel()
    tgt = scene.verts_world[rng.integers(0, len(scene.verts_world), r)]
    batch = RayBatch(
        ray_o=jnp.asarray(np.broadcast_to(eye, (r, 3)), jnp.float32),
        ray_d=jnp.asarray((tgt - eye).astype(np.float32)),
        near=jnp.full((r,), 0.5, jnp.float32),
        far=jnp.full((r,), 3.5, jnp.float32),
        frame=jnp.asarray(0, jnp.int32),
        body_pose=jnp.asarray(scene.poses[1:], jnp.float32),
    )
    model = DualSpaceNeRF()
    params = model.init(
        jax.random.key(0), batch.ray_o[:2], jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 16)),
    )
    outs = {}
    for impl in ("listed", "xla"):
        settings = RenderSettings(
            n_samples=8, sample_mode="uniform", perturb=0.0,
            raw_noise_std=0.0, mlp_chunk=256, knn_impl=impl, shade_topk=4,
        )
        outs[impl] = render_rays(
            params, model, batch, mesh, settings,
            LightState.identity(), jax.random.key(1), False,
        )["color"]
    np.testing.assert_allclose(
        np.asarray(outs["listed"]), np.asarray(outs["xla"]),
        atol=2e-5, rtol=0,
    )
