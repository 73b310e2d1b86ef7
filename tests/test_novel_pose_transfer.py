"""Cross-dataset motion transfer (H36M motion -> ZJU performer avatar).

Reference: `dataloader/novel_poses_dataset.py:16-247` + the
`get_novel_pose_dataset` factory (:232-246) consuming
data_configs/novel_poses/{performer}_{motion_seq}.yml.
"""

import os

import cv2
import numpy as np
import pytest

from dual_space_nerf_tpu.data.h36m_novel_pose import get_novel_pose_dataset
from dual_space_nerf_tpu.data.synthetic import look_at_camera, make_scene
from dual_space_nerf_tpu.data.synthetic_dataset import splat_image

H, W = 64, 64
N_FRAMES, N_CAMS = 6, 4


@pytest.fixture(scope="module")
def transfer_roots(tmp_path_factory):
    """Synthesized H36M S9/Posing tree (the driving motion) + a ZJU
    CoreView_377 dir holding only the performer's canonical vertices."""
    scene = make_scene(n_theta=14, n_phi=12, h=H, w=W)
    rng = np.random.default_rng(3)

    h36m_dir = tmp_path_factory.mktemp("h36m_root")
    root = h36m_dir / "S9" / "Posing"
    cams = {"K": [], "R": [], "T": [], "D": []}
    ims = []
    for c in range(N_CAMS):
        ang = 2 * np.pi * c / N_CAMS
        eye = np.array([2.0 * np.cos(ang), 2.0 * np.sin(ang), 0.3])
        K, R, T = look_at_camera(eye, np.zeros(3), H, W, focal=80.0)
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
                "poses": (0.05 * rng.standard_normal((1, 72))).astype(np.float32),
            },
        )
        np.save(root / "new_vertices" / f"{f}.npy", scene.verts_world)

    # the PERFORMER's canonical avatar lives in the ZJU tree — distinct
    # vertices so the test can prove they were taken from the performer
    zju_dir = tmp_path_factory.mktemp("zju_root")
    performer_cano = scene.verts_cano * 1.1 + 0.05
    os.makedirs(zju_dir / "CoreView_377", exist_ok=True)
    np.save(zju_dir / "CoreView_377" / "X_smpl_vertices.npy",
            performer_cano[None])
    return str(h36m_dir), str(zju_dir), scene, performer_cano


def test_factory_builds_from_shipped_yml(transfer_roots):
    h36m_dir, zju_dir, scene, performer_cano = transfer_roots
    ds = get_novel_pose_dataset(
        performer="CoreView_377", motion_seq="S9",
        zju_data_dir=zju_dir, h36m_data_dir=h36m_dir,
    )
    # split="test" with test_view=[] -> all non-training views; shipped yml
    # has training_view [0,1,2] -> view 3; frame_interval 3 -> frames 0,3
    assert len(ds) == 2
    # the canonical avatar is the PERFORMER's, not the motion sequence's
    np.testing.assert_allclose(ds.canonical_vertex, performer_cano, atol=1e-6)


def test_items_keep_sequence_frame_timeline(transfer_roots):
    h36m_dir, zju_dir, scene, _ = transfer_roots
    ds = get_novel_pose_dataset(
        performer="CoreView_377", motion_seq="S9",
        zju_data_dir=zju_dir, h36m_data_dir=h36m_dir,
    )
    items = [ds[i] for i in range(len(ds))]
    # frame code follows the driving sequence (frame_index // i_intv), no
    # randomization (reference :226-227 disables the base-class behavior)
    assert [it["frame"] for it in items] == [0, 1]
    it = items[0]
    assert it["xyz"].shape[1] == 3
    assert (it["near"] < it["far"]).all()
    assert it["poses"].shape == (24, 3)
    # rays are the eval full-image set, normalized (H36M convention)
    np.testing.assert_allclose(
        np.linalg.norm(it["ray_d"], axis=-1), 1.0, atol=1e-5
    )


def test_all_eight_pairing_configs_parse():
    from dual_space_nerf_tpu.data.select import MyCfg, set_my_cfg
    import yaml

    base = os.path.join(os.path.dirname(__file__), "..", "data_configs",
                        "novel_poses")
    files = sorted(os.listdir(base))
    assert len(files) == 8, files  # one per ZJU performer (reference set)
    for f in files:
        with open(os.path.join(base, f)) as fh:
            cfg = set_my_cfg(MyCfg(), yaml.safe_load(fh.read()))
        for field in ("training_view", "test_view", "begin_ith_frame",
                      "frame_interval", "vertices", "params", "ratio"):
            assert hasattr(cfg, field), (f, field)
