"""End-to-end drive of the novel_pose_vis CLI (cross-dataset path).

Reference behavior: `novel_pose_vis.py:86-170` — render a trained avatar
under a driving pose sequence with the frame code zeroed, dump frames, and
assemble mp4s. Here the H36M S9 motion drives the CoreView_377 performer
through the real `cli/novel_pose_vis.py main()` surface on synthesized
on-disk trees (no monkeypatching of framework internals: SMPL faces come
from a synthetic SMPL pickle via DSNERF_SMPL_PATH).
"""

import glob
import os
import pickle

import cv2
import jax
import numpy as np
import pytest

from dual_space_nerf_tpu.data.synthetic import look_at_camera, make_scene
from dual_space_nerf_tpu.data.synthetic_dataset import splat_image

H, W = 48, 48
N_FRAMES, N_CAMS = 6, 4


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    """Synthesized H36M motion tree + ZJU performer canonical verts +
    synthetic SMPL pickle + a tiny saved checkpoint; returns the argv
    pieces and the working dir."""
    scene = make_scene(n_theta=12, n_phi=10, h=H, w=W)
    rng = np.random.default_rng(5)

    # --- driving H36M S9/Posing tree (annots.npy protocol) ---
    h36m_dir = tmp_path_factory.mktemp("h36m_root")
    root = h36m_dir / "S9" / "Posing"
    cams = {"K": [], "R": [], "T": [], "D": []}
    ims = []
    for c in range(N_CAMS):
        ang = 2 * np.pi * c / N_CAMS
        eye = np.array([2.0 * np.cos(ang), 2.0 * np.sin(ang), 0.3])
        K, R, T = look_at_camera(eye, np.zeros(3), H, W, focal=60.0)
        cams["K"].append(K)
        cams["R"].append(R)
        cams["T"].append(T * 1000.0)
        cams["D"].append(np.zeros((5, 1)))
    for f in range(N_FRAMES):
        frame_ims = []
        for c in range(N_CAMS):
            rel = f"images/Camera{c}/{f}.jpg"
            img_path = root / rel
            os.makedirs(img_path.parent, exist_ok=True)
            img, mask = splat_image(scene, H, W)
            cv2.imwrite(str(img_path), (img * 255).astype(np.uint8))
            msk_path = root / "mask_cihp" / f"images/Camera{c}/{f}.png"
            os.makedirs(msk_path.parent, exist_ok=True)
            cv2.imwrite(str(msk_path), mask * 255)
            frame_ims.append(rel)
        ims.append({"ims": frame_ims})
    np.save(root / "annots.npy", {"cams": cams, "ims": ims})
    os.makedirs(root / "lbs", exist_ok=True)
    np.save(root / "lbs" / "parents.npy",
            np.concatenate([[-1], np.zeros(23, np.int64)]))
    os.makedirs(root / "new_params", exist_ok=True)
    os.makedirs(root / "new_vertices", exist_ok=True)
    for f in range(N_FRAMES):
        np.save(
            root / "new_params" / f"{f}.npy",
            {
                "Rh": np.zeros((1, 3), np.float32),
                "Th": np.zeros((1, 3), np.float32),
                "poses": (0.05 * rng.standard_normal((1, 72))).astype(
                    np.float32
                ),
            },
        )
        np.save(root / "new_vertices" / f"{f}.npy", scene.verts_world)

    # --- performer canonical avatar in the ZJU tree ---
    zju_dir = tmp_path_factory.mktemp("zju_root")
    os.makedirs(zju_dir / "CoreView_377", exist_ok=True)
    np.save(zju_dir / "CoreView_377" / "X_smpl_vertices.npy",
            scene.verts_cano[None])

    # --- synthetic SMPL pickle matching the scene topology ---
    smpl_path = tmp_path_factory.mktemp("smpl") / "SMPL_NEUTRAL.pkl"
    n_verts = scene.verts_cano.shape[0]
    kintree = np.stack([np.arange(-1, 23), np.arange(24)]).astype(np.int64)
    with open(smpl_path, "wb") as fh:
        pickle.dump(
            {
                "f": scene.faces,
                "weights": np.full((n_verts, 24), 1.0 / 24, np.float32),
                "kintree_table": kintree,
            },
            fh,
        )

    # --- tiny config + freshly-initialized checkpoint ---
    work = tmp_path_factory.mktemp("np_cli_work")
    cfg_path = work / "tiny.yml"
    cfg_path.write_text(
        """
MODEL:
  TYPE: "nerf"
  COARSE_RAY_SAMPLING: 8
  FINE_RAY_SAMPLING: -1
  sample_points_mode: "GG"
  MLP_CHUNK: 2048
  MAX_FRAMES: 16
  KNN_IMPL: "xla"
DATASETS:
  TYPE: "h36m"
  HUMAN: "S9"
TEST:
  IMS_PER_BATCH: 1
  RAY_CHUNK: 512
  light_center: [0.0, 0.0, 0.5]
"""
    )
    from dual_space_nerf_tpu.cli.common import build_model, load_cfg
    from dual_space_nerf_tpu.training import (
        Checkpointer, create_train_state, make_optimizer,
    )

    cfg = load_cfg(str(cfg_path))
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg)
    state = create_train_state(model, tx, jax.random.key(11))
    ckpt_dir = work / "EXP" / "np_cli"
    ck = Checkpointer(str(ckpt_dir))
    ckpt_path = ck.save("model_epoch_0000002", state, 2)

    return {
        "work": work,
        "cfg": str(cfg_path),
        "ckpt": ckpt_path,
        "h36m": str(h36m_dir),
        "zju": str(zju_dir),
        "smpl": str(smpl_path),
    }


def test_novel_pose_vis_cli_cross_dataset(cli_env, monkeypatch):
    monkeypatch.chdir(cli_env["work"])
    monkeypatch.setenv("DSNERF_H36M_PATH", cli_env["h36m"])
    monkeypatch.setenv("DSNERF_ZJU_PATH", cli_env["zju"])
    monkeypatch.setenv("DSNERF_SMPL_PATH", cli_env["smpl"])

    from dual_space_nerf_tpu.cli import novel_pose_vis as cli_np

    cli_np.main([
        "-c", cli_env["cfg"], "--exp", "np_cli", "--ckpt", cli_env["ckpt"],
        "--performer", "CoreView_377", "--motion_seq", "S9",
        "--n_frames", "2", "--data_parallel",
    ])

    out = cli_env["work"] / "motion_transfer" / "np_cli"
    renders = sorted(glob.glob(str(out / "2" / "rendering" / "*.jpg")))
    assert len(renders) == 2, renders
    side_by_side = sorted(glob.glob(str(out / "2" / "img" / "*.jpg")))
    assert len(side_by_side) == 2
    # side-by-side frames are render|gt, twice the width
    img = cv2.imread(side_by_side[0])
    ren = cv2.imread(renders[0])
    assert img.shape[1] == 2 * ren.shape[1]
    assert ren.shape[0] > 0 and np.isfinite(ren).all()
    for vid in ("rendering.mp4", "video.mp4"):
        assert os.path.exists(out / vid), vid
