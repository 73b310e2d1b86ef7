"""Shared CLI plumbing: config loading, model construction, asset loading."""

from __future__ import annotations

import os

import numpy as np

from ..config import get_cfg_defaults
from ..data.smpl import load_body_model
from ..models import DualSpaceNeRF
from ..renderer import RenderSettings
from ..training import Checkpointer, create_train_state, make_optimizer


def enable_compilation_cache():
    """Persistent XLA compile cache for every CLI entry point.

    Same settings as bench.py: repeat runs of identical graph shapes
    (sweeps, A/B fleets, resumed training) start in seconds instead of
    re-compiling for minutes through the remote compile service. Opt out
    with DSNERF_COMPILE_CACHE=0; relocate with DSNERF_COMPILE_CACHE_DIR.
    """
    if os.environ.get("DSNERF_COMPILE_CACHE", "1") == "0":
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DSNERF_COMPILE_CACHE_DIR", ".jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def load_cfg(config_path: str):
    cfg = get_cfg_defaults()
    if config_path:
        assert os.path.exists(config_path), f"config does not exist: {config_path}"
        cfg.merge_from_file(config_path)
    cfg.freeze()
    return cfg


def epoch_from_ckpt(ckpt_path: str) -> int:
    """Epoch number from a `model_epoch_%07d.ckpt` filename; 0 for names
    with no numeric tail (e.g. a hand-renamed `best.ckpt`)."""
    tail = os.path.basename(ckpt_path).split(".")[0].split("_")[-1]
    return int(tail) if tail.isdigit() else 0


def build_model(cfg) -> DualSpaceNeRF:
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.MODEL.MATMUL_PRECISION == "bf16" else None
    return DualSpaceNeRF(
        max_frames=cfg.MODEL.MAX_FRAMES,
        code_dim=cfg.MODEL.CODE_DIM,
        backbone_dim=cfg.MODEL.BACKBONE_DIM,
        compute_dtype=dtype,
    )


def load_faces(cfg, dataset=None) -> np.ndarray:
    """SMPL faces from the body-model pickle; synthetic topology fallback."""
    if cfg.DATASETS.TYPE == "synthetic":
        return np.asarray(dataset.faces, np.int32)
    smpl_path = os.environ.get("DSNERF_SMPL_PATH", cfg.DATASETS.SMPL_PATH)
    return load_body_model(smpl_path).faces


def load_render_state(ckpt_path: str, cfg, model=None):
    """Eval scripts' parameter loading (validate.py:18-28 equivalent).

    Returns (model, params)."""
    import jax

    model = model or build_model(cfg)
    tx, _ = make_optimizer(cfg)
    template = create_train_state(model, tx, jax.random.key(0))
    ck = Checkpointer(os.path.dirname(ckpt_path) or ".")
    params = ck.load_params_only(ckpt_path, template.params)
    return model, params


def eval_settings(cfg) -> RenderSettings:
    return RenderSettings.from_cfg(cfg)
