"""Shared problem construction for the multi-process tests: a fixed tiny
synthetic batch + model/optimizer/settings, deterministic across processes
(everything derives from literal seeds — no ambient rng)."""

import numpy as np

N_STEPS = 3
NRAYS = 64  # divisible by the 8-device global mesh


def tiny_cfg():
    from dual_space_nerf_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.DATASETS.TYPE = "synthetic"
    cfg.MODEL.COARSE_RAY_SAMPLING = 8
    cfg.MODEL.MLP_CHUNK = 2048
    cfg.MODEL.MAX_FRAMES = 16
    cfg.MODEL.KNN_IMPL = "xla"
    cfg.SOLVER.MAX_EPOCHS = 3
    cfg.SOLVER.TRAIN_NRAYS = NRAYS
    cfg.SOLVER.WARMUP_ITERS = 5
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.SOLVER.LOG_PERIOD = 2
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.RAY_CHUNK = 512
    cfg.freeze()
    return cfg


def make_problem():
    """(model, tx, cfg, settings, batch, geom) — identical on every caller."""
    from dual_space_nerf_tpu.cli.common import build_model
    from dual_space_nerf_tpu.data import SyntheticDataset
    from dual_space_nerf_tpu.data.batching import (
        item_to_mesh,
        item_to_train_batch,
    )
    from dual_space_nerf_tpu.renderer import RenderSettings
    from dual_space_nerf_tpu.training import make_optimizer

    cfg = tiny_cfg()
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg)
    settings = RenderSettings.from_cfg(cfg)

    ds = SyntheticDataset(
        split="train", nrays=NRAYS, n_frames=1, n_views=1, h=48, w=48,
    )
    item = ds[0]
    batch = item_to_train_batch(item, NRAYS)
    geom = item_to_mesh(item, np.asarray(ds.faces), ds.canonical_vertex)
    return model, tx, cfg, settings, batch, geom
