"""SMPL body-model asset loading.

Behavioral reference: `utils/smpl_utils.py:3-14` (pickle load) and
`can_render.py:382-406` (faces / blend weights / X-pose extraction). The SMPL
pickle is licensed and not distributed; when it is absent, callers may fall
back to the synthetic capsule body (data/synthetic.py) for development.
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple

import numpy as np


class BodyModel(NamedTuple):
    faces: np.ndarray          # (F, 3) int32
    blend_weights: np.ndarray  # (V, 24) float32
    parents: np.ndarray        # (24,) int64, parents[0] = -1
    x_pose: np.ndarray         # (24, 3): zero pose with legs spread +-0.6 rad


def load_bodydata(
    model_path: str, model_type: str = "smpl", gender: str = "neutral"
) -> dict:
    """Unpickle the SMPL model dict (kintree_table, weights, f, ...)."""
    if os.path.isdir(model_path):
        fn = f"{model_type.upper()}_{gender.upper()}.pkl"
        model_path = os.path.join(model_path, fn)
    if not os.path.exists(model_path):
        raise FileNotFoundError(f"SMPL model not found: {model_path}")
    with open(model_path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def x_pose() -> np.ndarray:
    """The canonical X-pose: rest pose with legs rotated +-0.6 rad about z
    (`can_render.py:397-399`)."""
    pose = np.zeros((24, 3), np.float32)
    pose[1, 2] += 0.6
    pose[2, 2] -= 0.6
    return pose


def load_body_model(model_path: str, gender: str = "neutral") -> BodyModel:
    data = load_bodydata(model_path, gender=gender)
    parents = np.asarray(data["kintree_table"][0], np.int64).copy()
    parents[0] = -1
    return BodyModel(
        faces=np.asarray(data["f"], np.int32),
        blend_weights=np.asarray(data["weights"], np.float32),
        parents=parents,
        x_pose=x_pose(),
    )


def synthetic_body_model(faces: np.ndarray, n_verts: int) -> BodyModel:
    """Capsule-body stand-in with SMPL-shaped metadata (tests / no-asset dev)."""
    parents = np.arange(-1, 23, dtype=np.int64)
    rng = np.random.default_rng(0)
    w = rng.random((n_verts, 24)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    return BodyModel(
        faces=np.asarray(faces, np.int32),
        blend_weights=w,
        parents=parents,
        x_pose=x_pose(),
    )
