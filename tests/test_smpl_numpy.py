"""Numpy SMPL forward tests against a synthetic model pickle."""

import os
import pickle

import numpy as np
import pytest

from dual_space_nerf_tpu.data.smpl_numpy import SMPLModel


@pytest.fixture
def fake_smpl(tmp_path):
    rng = np.random.default_rng(0)
    V = 60
    v_template = rng.normal(size=(V, 3)) * 0.3
    shapedirs = rng.normal(size=(V, 3, 10)) * 0.01
    posedirs = rng.normal(size=(V, 3, 207)) * 0.001
    J_regressor = np.abs(rng.normal(size=(24, V)))
    J_regressor /= J_regressor.sum(1, keepdims=True)
    weights = np.abs(rng.normal(size=(V, 24)))
    weights /= weights.sum(1, keepdims=True)
    kintree = np.zeros((2, 24), np.int64)
    kintree[0] = np.concatenate([[0], np.arange(23)])  # chain
    data = {
        "v_template": v_template,
        "shapedirs": shapedirs,
        "posedirs": posedirs,
        "J_regressor": J_regressor,
        "weights": weights,
        "kintree_table": kintree,
        "f": np.zeros((4, 3), np.int32),
    }
    path = tmp_path / "SMPL_NEUTRAL.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return str(path)


def test_zero_pose_is_shaped_template(fake_smpl):
    m = SMPLModel(fake_smpl)
    betas = np.zeros(10)
    verts, joints = m.forward(np.zeros((24, 3)), betas=betas)
    np.testing.assert_allclose(verts, m.v_template, atol=1e-5)
    np.testing.assert_allclose(joints, m.joints(betas), atol=1e-5)


def test_shape_betas_apply_linearly(fake_smpl):
    m = SMPLModel(fake_smpl)
    betas = np.ones(10) * 0.5
    verts, _ = m.forward(np.zeros((24, 3)), betas=betas)
    np.testing.assert_allclose(
        verts, m.v_template + m.shapedirs @ betas, atol=1e-5
    )


def test_global_rotation_is_rigid(fake_smpl):
    """Root rotation must rigidly rotate the whole body about the root joint."""
    m = SMPLModel(fake_smpl)
    pose = np.zeros((24, 3))
    pose[0] = [0, 0, np.pi / 2]
    verts, _ = m.forward(pose)
    v0, _ = m.forward(np.zeros((24, 3)))
    j0 = m.joints()[0]
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    expect = (v0 - j0) @ Rz.T + j0
    np.testing.assert_allclose(verts, expect, atol=1e-4)


def test_rh_th_applied_after(fake_smpl):
    m = SMPLModel(fake_smpl)
    Th = np.array([1.0, 2.0, 3.0])
    v1, _ = m.forward(np.zeros((24, 3)))
    v2, _ = m.forward(np.zeros((24, 3)), Th=Th)
    np.testing.assert_allclose(v2, v1 + Th, atol=1e-5)


def test_pose_blendshapes_active(fake_smpl):
    """Bending a joint must engage posedirs, not just rigid LBS."""
    m = SMPLModel(fake_smpl)
    pose = np.zeros((24, 3))
    pose[5] = [0.4, 0.0, 0.0]
    verts_with, _ = m.forward(pose)
    m2 = SMPLModel(fake_smpl)
    m2.posedirs = np.zeros_like(m2.posedirs)
    verts_without, _ = m2.forward(pose)
    assert not np.allclose(verts_with, verts_without)


def test_load_bodydata_official_pickle_formats(tmp_path):
    """Official SMPL downloads store arrays as chumpy.Ch objects and the
    J_regressor as scipy sparse; load_bodydata must read them without
    chumpy installed (stub unpickler) and densify the regressor."""
    import pickle
    import sys
    import types

    import scipy.sparse as sp

    from dual_space_nerf_tpu.data.smpl import load_bodydata

    # fabricate a pickle that references chumpy.ch.Ch without having chumpy
    chumpy = types.ModuleType("chumpy")
    ch = types.ModuleType("chumpy.ch")

    class Ch:
        def __init__(self, x):
            self.x = x
            self.dirty = True  # extra state like the real class carries

    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    ch.Ch = Ch
    chumpy.ch = ch
    sys.modules["chumpy"] = chumpy
    sys.modules["chumpy.ch"] = ch
    try:
        data = {
            "v_template": Ch(np.arange(12.0).reshape(4, 3)),
            "J_regressor": sp.csc_matrix(np.eye(4)[:2]),
            "f": np.array([[0, 1, 2]], np.int32),
            "kintree_table": np.array([[-1, 0], [0, 1]]),
            "weights": np.ones((4, 2), np.float32),
        }
        pkl = tmp_path / "SMPL_NEUTRAL.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(data, f, protocol=2)
    finally:
        del sys.modules["chumpy"], sys.modules["chumpy.ch"]

    out = load_bodydata(str(pkl))
    np.testing.assert_array_equal(
        out["v_template"], np.arange(12.0).reshape(4, 3)
    )
    assert isinstance(out["J_regressor"], np.ndarray)
    np.testing.assert_array_equal(out["J_regressor"], np.eye(4)[:2])
    np.testing.assert_array_equal(out["f"], data["f"])
