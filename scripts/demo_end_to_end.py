#!/usr/bin/env python3
"""Zero-setup end-to-end demo: synthesize a mini ZJU-MoCap-style tree, then
drive the FULL CLI surface on it — train -> validate -> formal test ->
novel-pose motion transfer -> relighting sweep.

This is the committed recipe for running the framework on real ZJU data
(swap the synthesized tree for a real capture + real SMPL assets and drop
the size overrides): every directory-layout quirk the real loaders expect
is reproduced — annots.npy cameras with mm translations, "Camera (N)" dirs
with 1-indexed CoreView_313 filenames, mask_cihp masks, new_params /
new_vertices per-frame SMPL, novelpose_examples pose sequences, the
X_smpl_vertices.npy canonical asset (the committed `tool/
X_smpl_vertices.npy` sample — the SMPL-sized synthetic capsule, V=6890/
F=13776), and a SMPL_NEUTRAL.pkl with the matching topology.

Reference surface being exercised: `main.py`, `validate.py`, `test.py`,
`novel_pose_vis.py`, `vis_lighting.py` (`/root/reference/README.md:40-64`).

Usage (CPU-safe, ~4 min; set JAX_PLATFORMS=cpu to force off-TPU):

    python scripts/demo_end_to_end.py [--out demo_run] [--epochs 3]
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = W = 96
N_FRAMES = 6                 # raw 1-indexed frame names 1..6 (313 protocol)
TRAIN_VIEWS = [0, 2]         # "Camera (1)" / "Camera (3)"
VAL_VIEW_DIR = "Camera (5)"  # a held-out camera the val/test splits find
NOVEL_POSE_VIEW_DIR = "Camera (10)"  # novel_pose_vis hardcodes vis_views=[9]


def _cam(ang: float, h: int = None, w: int = None):
    from dual_space_nerf_tpu.data.synthetic import look_at_camera

    h = H if h is None else h
    w = W if w is None else w
    eye = np.array([2.6 * np.cos(ang), 2.6 * np.sin(ang), 0.35])
    # focal tuned so the capsule fills the frame at 96^2; scales with size
    return look_at_camera(eye, np.zeros(3), h, w, focal=110.0 * h / 96.0)


def synthesize_tree(
    data_dir: str, h: int = None, w: int = None, n_frames: int = None,
    train_views=None, extra_view_dirs=None,
):
    """CoreView_313-style capture of the SMPL-sized capsule body.

    The size/view arguments default to the demo's tiny CPU-safe scene;
    bench.py reuses this generator at ZJU scale (1024^2 raw JPEGs) for the
    cache-cold epoch-1 loader measurement."""
    from dual_space_nerf_tpu.data.synthetic import make_scene
    from dual_space_nerf_tpu.data.synthetic_dataset import splat_image

    h = H if h is None else h
    w = W if w is None else w
    n_frames = N_FRAMES if n_frames is None else n_frames
    train_views = TRAIN_VIEWS if train_views is None else train_views
    if extra_view_dirs is None:
        extra_view_dirs = (VAL_VIEW_DIR, NOVEL_POSE_VIEW_DIR)

    root = os.path.join(data_dir, "CoreView_313")
    os.makedirs(root, exist_ok=True)

    # 21 physical cameras -> annots names Camera (1..19), (22), (23)
    n_cams = 21
    rings = [_cam(2 * np.pi * c / n_cams, h, w) for c in range(n_cams)]
    cams = {
        "K": [k for k, _, _ in rings],
        "R": [r for _, r, _ in rings],
        "T": [t * 1000.0 for _, _, t in rings],  # annots store millimeters
        "D": [np.zeros((5, 1)) for _ in range(n_cams)],
    }
    np.save(os.path.join(root, "annots.npy"), {"cams": cams, "ims": []})

    # canonical asset: the COMMITTED sample (same deterministic capsule)
    sample = os.path.join(os.path.dirname(__file__), "..", "tool",
                          "X_smpl_vertices.npy")
    verts_cano = np.load(sample).squeeze()

    os.makedirs(os.path.join(root, "new_params"), exist_ok=True)
    os.makedirs(os.path.join(root, "new_vertices"), exist_ok=True)
    scenes = {}
    for f in range(1, n_frames + 1):
        # a slightly different bend per frame = per-frame SMPL fits
        scene = make_scene(bend=0.25 + 0.04 * f, h=h, w=w)
        assert np.allclose(scene.verts_cano, verts_cano), (
            "tool/X_smpl_vertices.npy must match make_scene()'s canonical "
            "capsule — regenerate the sample if the mesh generator changed"
        )
        scenes[f] = scene
        np.save(
            os.path.join(root, "new_params", f"{f}.npy"),
            {
                "Rh": np.zeros((1, 3), np.float32),
                "Th": np.zeros((1, 3), np.float32),
                "poses": np.zeros((1, 72), np.float32),
                "shapes": np.zeros((1, 10), np.float32),
            },
        )
        np.save(os.path.join(root, "new_vertices", f"{f}.npy"),
                scene.verts_world)
    np.save(os.path.join(root, "X_smpl_vertices.npy"), verts_cano[None])

    # images + masks only for the camera dirs the demo splits touch
    dirs = [f"Camera ({v + 1})" for v in train_views] + list(extra_view_dirs)
    for cam_dir in dirs:
        cam_idx = int(cam_dir.split("(")[1].rstrip(")")) - 1
        K, R, T = rings[cam_idx]
        for f in range(1, n_frames + 1):
            img, mask = splat_image(
                scenes[f]._replace(K=K, R=R, T=T.reshape(3, 1)), h, w
            )
            fname = f"CoreView_313_Camera_(x)_{f:04d}_2019-08-23"
            ipath = os.path.join(root, cam_dir, f"{fname}.jpg")
            os.makedirs(os.path.dirname(ipath), exist_ok=True)
            cv2.imwrite(ipath, (img * 255).astype(np.uint8))
            mpath = os.path.join(root, "mask_cihp", cam_dir, f"{fname}.png")
            os.makedirs(os.path.dirname(mpath), exist_ok=True)
            cv2.imwrite(mpath, mask * 255)

    # novel-pose driving sequence (novel_pose_vis reads {idx*4}.npy)
    pose_root = os.path.join(data_dir, "novelpose_examples",
                             "CoreView_313_op3")
    os.makedirs(os.path.join(pose_root, "new_params"), exist_ok=True)
    os.makedirs(os.path.join(pose_root, "new_vertices"), exist_ok=True)
    for i, f in enumerate(fr for fr in (1, 3, 5) if fr <= n_frames):
        np.save(
            os.path.join(pose_root, "new_params", f"{i * 4}.npy"),
            {
                "Rh": np.zeros((1, 3), np.float32),
                "Th": np.zeros((1, 3), np.float32),
                "poses": np.zeros((1, 72), np.float32),
            },
        )
        np.save(os.path.join(pose_root, "new_vertices", f"{i * 4}.npy"),
                scenes[f].verts_world)

    return verts_cano


def write_smpl_pickle(path: str, verts_cano: np.ndarray) -> None:
    from dual_space_nerf_tpu.data.synthetic import make_scene

    faces = make_scene(h=8, w=8).faces
    kintree = np.stack([np.arange(-1, 23), np.arange(24)]).astype(np.int64)
    with open(path, "wb") as fh:
        pickle.dump(
            {
                "f": faces,
                "weights": np.full(
                    (verts_cano.shape[0], 24), 1.0 / 24, np.float32
                ),
                "kintree_table": kintree,
            },
            fh,
        )


DEMO_CFG = """\
MODEL:
  TYPE: "nerf"
  COARSE_RAY_SAMPLING: 12
  FINE_RAY_SAMPLING: -1
  sample_points_mode: "GG"
  MAX_FRAMES: 16
DATASETS:
  TYPE: "zju_mocap"
  HUMAN: "CoreView_313"
DATALOADER:
  NUM_WORKERS: 2
SOLVER:
  MAX_EPOCHS: {epochs}
  BASE_LR: 0.0005
  WEIGHT_DECAY: 0.0
  WARMUP_ITERS: 10
  CHECKPOINT_PERIOD: 1
  LOG_PERIOD: 4
  TRAIN_NRAYS: 384
TEST:
  IMS_PER_BATCH: 1
  RAY_CHUNK: 2048
  light_center: [0.0, 0.0, 0.4]
"""

DATA_CFG = """\
Train:
  views: [0, 2]
  ratio: 0.5
  begin: 0
  end: 3

Val:
  ratio: 0.5
  begin: 0
  end: 5
  intv: 3

Test:
  ratio: 0.5
  begin: 0
  end: 5
  intv: 2
  novel_pose_begin: 4
"""


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="demo_run")
    parser.add_argument("--epochs", type=int, default=3)
    args = parser.parse_args(argv)

    out = os.path.abspath(args.out)
    data_dir = os.path.join(out, "data", "zju_mocap")
    os.makedirs(data_dir, exist_ok=True)

    print(f"[demo] synthesizing mini ZJU tree under {data_dir} ...")
    verts_cano = synthesize_tree(data_dir)
    smpl_path = os.path.join(out, "SMPL_NEUTRAL.pkl")
    write_smpl_pickle(smpl_path, verts_cano)

    os.makedirs(os.path.join(out, "data_configs", "zju_mocap"), exist_ok=True)
    with open(os.path.join(out, "data_configs", "zju_mocap",
                           "CoreView_313.yml"), "w") as f:
        f.write(DATA_CFG)
    cfg_path = os.path.join(out, "demo.yml")
    with open(cfg_path, "w") as f:
        f.write(DEMO_CFG.format(epochs=args.epochs))

    os.environ["DSNERF_ZJU_PATH"] = data_dir
    os.environ["DSNERF_SMPL_PATH"] = smpl_path
    os.chdir(out)

    from dual_space_nerf_tpu.cli import novel_pose_vis as cli_novel_pose
    from dual_space_nerf_tpu.cli import test as cli_test
    from dual_space_nerf_tpu.cli import train as cli_train
    from dual_space_nerf_tpu.cli import validate as cli_validate
    from dual_space_nerf_tpu.cli import vis_lighting as cli_vis

    print("[demo] 1/5 train ...")
    cli_train.main(["-c", cfg_path, "--exp", "demo"])
    ckpt = sorted(glob.glob("EXP/demo/model_epoch_*.ckpt"))[-1]

    print(f"[demo] 2/5 validate ({ckpt}) ...")
    res = cli_validate.main(["-c", cfg_path, "--exp", "demo", "--ckpt", ckpt])
    print(f"[demo]      val metrics: {res}")

    print("[demo] 3/5 formal test (novel view + novel pose splits) ...")
    nv, npse = cli_test.main(["-c", cfg_path, "--exp", "demo", "--ckpt", ckpt])
    print(f"[demo]      novel-view: {nv}")
    print(f"[demo]      novel-pose: {npse}")

    print("[demo] 4/5 novel-pose motion transfer ...")
    cli_novel_pose.main([
        "-c", cfg_path, "--exp", "demo", "--ckpt", ckpt,
        "--pose_dir",
        os.path.join(data_dir, "novelpose_examples", "CoreView_313_op3"),
        "--n_frames", "2",
    ])

    print("[demo] 5/5 relighting sweep ...")
    cli_vis.main(["-c", cfg_path, "--exp", "demo", "--ckpt", ckpt])

    print("[demo] DONE. Artifacts:")
    for pattern in ("EXP/demo/model_epoch_*.ckpt", "EXP/demo/log.txt",
                    "EXP/demo/vis/*/img/*", "TEST/demo/*/*/rendering/*",
                    "motion_transfer/demo/*.mp4",
                    "vis_lighting/demo/*.mp4"):
        for p in sorted(glob.glob(pattern))[:4]:
            print("  ", p)


if __name__ == "__main__":
    main()
