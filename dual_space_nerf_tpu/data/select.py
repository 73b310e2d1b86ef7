"""Dataset selection from the two-tier config.

Behavioral reference: `utils/data_utils.py:12-107` — `MyCfg`/`set_my_cfg`
turn plain-YAML data configs into attribute objects; `select_dataset` maps
(cfg.DATASETS.TYPE, cfg.DATASETS.HUMAN) + `data_configs/{type}/{human}.yml`
to (train, val) or (novel_view, novel_pose) dataset pairs. A "synthetic"
type is added for asset-free development.
"""

from __future__ import annotations

import os

import yaml

from .h36m import H36M
from .synthetic_dataset import SyntheticDataset
from .zju import Mocap, MocapInfer, MocapView


class MyCfg:
    pass


def set_my_cfg(mycfg: MyCfg, data_config: dict) -> MyCfg:
    for key, value in data_config.items():
        if isinstance(value, dict):
            sub = MyCfg()
            set_my_cfg(sub, value)
            setattr(mycfg, key, sub)
        else:
            setattr(mycfg, key, value)
    return mycfg


def load_yml_as_cfg(yml_path: str) -> MyCfg:
    with open(yml_path, "r", encoding="utf-8") as f:
        return set_my_cfg(MyCfg(), yaml.safe_load(f.read()))


def resolve_data_config(rel: str) -> str:
    """Resolve a data_configs/... path: CWD-relative first (reference
    behavior), then the repo root. Shared with the motion-transfer path
    (`h36m_novel_pose.get_novel_pose_dataset`)."""
    if os.path.exists(rel):
        return rel
    here = os.path.join(os.path.dirname(__file__), "..", "..", rel)
    return os.path.normpath(here)


def _data_config_path(cfg) -> str:
    return resolve_data_config(
        f"data_configs/{cfg.DATASETS.TYPE}/{cfg.DATASETS.HUMAN}.yml"
    )


def select_dataset(cfg, train_nrays=2000, formal_test=False):
    if cfg.DATASETS.TYPE == "synthetic":
        ds = cfg.DATASETS
        size = dict(
            n_frames=getattr(ds, "SYNTHETIC_FRAMES", 2),
            n_views=getattr(ds, "SYNTHETIC_VIEWS", 3),
            h=getattr(ds, "SYNTHETIC_SIZE", 96),
            w=getattr(ds, "SYNTHETIC_SIZE", 96),
        )
        val_offset = getattr(ds, "SYNTHETIC_VAL_VIEW_OFFSET", 0.0)
        # HUMAN selects the essence field: "capsule" = smooth (default),
        # "capsule_hf" = high-frequency textured (the harder quality-gate
        # scene for approximation A/Bs; data/synthetic.py emission_color)
        size["essence"] = (
            "textured" if ds.HUMAN in ("capsule_hf", "textured") else "smooth"
        )
        train = SyntheticDataset(split="train", nrays=train_nrays, **size)
        val = SyntheticDataset(split="val", view_offset=val_offset, **size)
        if formal_test:
            return (
                SyntheticDataset(split="val", view_offset=val_offset, **size),
                SyntheticDataset(split="val", view_offset=val_offset, **size),
            )
        return train, val

    with open(_data_config_path(cfg), "r", encoding="utf-8") as f:
        data_config = yaml.safe_load(f.read())

    if cfg.DATASETS.TYPE == "zju_mocap":
        data_dir = os.environ.get(
            "DSNERF_ZJU_PATH", cfg.DATASETS.ZJU_MOCAP_PATH
        )
        tr = data_config["Train"]
        train_max_frame = tr["end"] - tr["begin"] + 1
        if formal_test:
            te = data_config["Test"]
            common = dict(
                human=cfg.DATASETS.HUMAN, ratio=te["ratio"], begin=te["begin"],
                end=te["end"], train_views=tr["views"],
                train_max_frame=train_max_frame, interval=te["intv"],
                eval_begin_frame=te["novel_pose_begin"], data_dir=data_dir,
            )
            return (
                MocapInfer(novel_pose=False, **common),
                MocapInfer(novel_pose=True, **common),
            )
        train_set = Mocap(
            cfg.DATASETS.HUMAN, tr["ratio"], train_nrays, tr["begin"],
            tr["end"], tr["views"], data_dir=data_dir,
        )
        va = data_config["Val"]
        val_set = MocapView(
            cfg.DATASETS.HUMAN, va["ratio"], va["begin"], va["end"],
            tr["views"], train_max_frame, interval=va["intv"],
            data_dir=data_dir,
        )
        return train_set, val_set

    if cfg.DATASETS.TYPE == "h36m":
        mycfg = set_my_cfg(MyCfg(), data_config)
        data_dir = os.environ.get("DSNERF_H36M_PATH", cfg.DATASETS.H36M_PATH)
        data_root = f"{data_dir}/{cfg.DATASETS.HUMAN}/Posing"
        ann_file = f"{data_root}/annots.npy"
        if formal_test:
            return (
                H36M(mycfg, data_root, cfg.DATASETS.HUMAN, ann_file, "test",
                     train_nrays, test_novel_pose=False, is_eval=True,
                     is_formal=True),
                H36M(mycfg, data_root, cfg.DATASETS.HUMAN, ann_file, "test",
                     train_nrays, test_novel_pose=True, is_eval=True,
                     is_formal=True),
            )
        train_set = H36M(
            mycfg, data_root, cfg.DATASETS.HUMAN, ann_file, "train",
            train_nrays, test_novel_pose=False, is_eval=False,
        )
        val_set = H36M(
            mycfg, data_root, cfg.DATASETS.HUMAN, ann_file, "test",
            train_nrays, test_novel_pose=True, is_eval=True, is_formal=False,
        )
        return train_set, val_set

    raise ValueError(f"Unknown dataset type: {cfg.DATASETS.TYPE}")
