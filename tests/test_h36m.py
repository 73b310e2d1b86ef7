"""H36M dataset-path tests against a synthesized on-disk layout.

The reference's H36M path crashes as shipped (unbound `joints`,
`h36m_dataset.py:62-67`); these tests build a miniature H36M directory tree
(annots.npy, images, mask_cihp, lbs assets, new_params/new_vertices) and
exercise the fixed loader end-to-end.
"""

import os

import cv2
import numpy as np
import pytest

from dual_space_nerf_tpu.data.h36m import H36M
from dual_space_nerf_tpu.data.select import MyCfg, set_my_cfg
from dual_space_nerf_tpu.data.synthetic import look_at_camera, make_scene


H, W = 64, 64
N_FRAMES, N_CAMS = 4, 3


@pytest.fixture(scope="module")
def h36m_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("h36m") / "S9" / "Posing"
    scene = make_scene(n_theta=14, n_phi=12, h=H, w=W)
    rng = np.random.default_rng(0)

    cams = {"K": [], "R": [], "T": [], "D": []}
    ims = []
    for c in range(N_CAMS):
        ang = 2 * np.pi * c / N_CAMS
        eye = np.array([2.0 * np.cos(ang), 2.0 * np.sin(ang), 0.3])
        K, R, T = look_at_camera(eye, np.zeros(3), H, W, focal=80.0)
        cams["K"].append(K)
        cams["R"].append(R)
        cams["T"].append(T * 1000.0)  # annots store mm
        cams["D"].append(np.zeros((5, 1)))

    from dual_space_nerf_tpu.data.synthetic_dataset import splat_image

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

    lbs = root / "lbs"
    os.makedirs(lbs, exist_ok=True)
    np.save(lbs / "X_smpl_joints.npy", rng.normal(size=(1, 24, 3)))
    np.save(lbs / "parents.npy",
            np.concatenate([[-1], np.zeros(23, np.int64)]))
    np.save(lbs / "X_smpl_vertices.npy", scene.verts_cano[None])

    os.makedirs(root / "new_params", exist_ok=True)
    os.makedirs(root / "new_vertices", exist_ok=True)
    for f in range(N_FRAMES):
        np.save(
            root / "new_params" / f"{f}.npy",
            {
                "Rh": np.zeros((1, 3), np.float32),
                "Th": np.zeros((1, 3), np.float32),
                "poses": (0.05 * rng.standard_normal((1, 72))).astype(np.float32),
                "shapes": np.zeros((1, 10), np.float32),
            },
        )
        np.save(root / "new_vertices" / f"{f}.npy", scene.verts_world)
    return str(root)


def _cfg():
    return set_my_cfg(MyCfg(), {
        "ratio": 1.0,
        "training_view": [0, 1],
        "test_view": [],
        "num_train_frame": 2,
        "num_eval_frame": 2,
        "my_num_eval_frame": 1,
        "begin_ith_frame": 0,
        "frame_interval": 1,
        "vertices": "new_vertices",
        "params": "new_params",
    })


def test_h36m_train_split(h36m_tree):
    ds = H36M(_cfg(), h36m_tree, "S9", os.path.join(h36m_tree, "annots.npy"),
              "train", nrays=64)
    assert len(ds) == 4  # 2 frames x 2 train views
    item = ds[0]
    assert item["rgb"].shape == (64, 3)
    assert item["ray_d"].shape == (64, 3)
    # H36M convention: normalized ray dirs
    np.testing.assert_allclose(
        np.linalg.norm(item["ray_d"], axis=-1), 1.0, atol=1e-5
    )
    assert item["poses"].shape == (24, 3)
    assert item["xyz"].shape[1] == 3
    assert (item["near"] < item["far"]).all()
    assert item["A"].shape == (24, 4, 4)


def test_h36m_test_split_novel_pose(h36m_tree):
    ds = H36M(_cfg(), h36m_tree, "S9", os.path.join(h36m_tree, "annots.npy"),
              "test", nrays=64, test_novel_pose=True, is_eval=True,
              is_formal=True)
    assert len(ds) == 2  # frames 2..3 x held-out view
    item = ds[0]
    # full-image mode at eval
    assert item["ray_o"].shape[0] == item["mask_at_box"].sum()
    assert item["frame"] < 2  # randomized into the train-frame range


def test_h36m_deterministic_items_order_independent(h36m_tree):
    """Multi-host contract on the H36M loader (same as data/zju.py): with
    deterministic_items, draws are a pure function of (seed, epoch, index)
    regardless of read order across instances."""
    def make():
        ds = H36M(_cfg(), h36m_tree, "S9",
                  os.path.join(h36m_tree, "annots.npy"), "train", nrays=64)
        ds.deterministic_items = True
        ds.set_epoch(2)
        return ds

    a, b = make(), make()
    item_a = a[0]
    _ = b[1]
    item_b = b[0]
    for k in ("coord", "rgb", "ray_d", "near", "far"):
        np.testing.assert_array_equal(item_a[k], item_b[k], err_msg=k)

    c = make()
    c.set_epoch(3)
    assert not np.array_equal(item_a["coord"], c[0]["coord"])
