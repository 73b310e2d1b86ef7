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


class _ChumpyStub:
    """Stand-in for chumpy.Ch objects inside official SMPL pickles.

    The basicModel_* downloads store v_template/shapedirs/posedirs as
    chumpy arrays; chumpy is an abandoned dependency we refuse to require.
    A Ch object's pickled state keeps its numpy payload in the 'x' slot,
    so a stub that captures the state dict is enough to recover it."""

    def __setstate__(self, state):
        self.__dict__.update(state)


class _SMPLUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.split(".")[0] == "chumpy":
            return _ChumpyStub
        return super().find_class(module, name)


def _to_numpy(v):
    if isinstance(v, _ChumpyStub):
        return np.asarray(v.__dict__["x"])
    if hasattr(v, "toarray"):  # scipy.sparse J_regressor
        return np.asarray(v.toarray())
    return v


def load_bodydata(
    model_path: str, model_type: str = "smpl", gender: str = "neutral"
) -> dict:
    """Unpickle the SMPL model dict (kintree_table, weights, f, ...).

    Accepts both pre-converted all-numpy pickles and the OFFICIAL SMPL
    downloads, whose chumpy arrays load through a stub (chumpy itself is
    not a dependency) and whose sparse J_regressor is densified."""
    if os.path.isdir(model_path):
        fn = f"{model_type.upper()}_{gender.upper()}.pkl"
        model_path = os.path.join(model_path, fn)
    if not os.path.exists(model_path):
        raise FileNotFoundError(f"SMPL model not found: {model_path}")
    with open(model_path, "rb") as f:
        data = _SMPLUnpickler(f, encoding="latin1").load()
    return {k: _to_numpy(v) for k, v in data.items()}


def x_pose() -> np.ndarray:
    """The canonical X-pose: rest pose with legs rotated +-0.6 rad about z
    (`can_render.py:397-399`). The ZJU loader applies the inverse offsets
    to per-frame poses (data/zju.py prepare_input) — the two must stay
    negations of each other."""
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

