#!/usr/bin/env python3
"""Compute per-subject canonical X-pose SMPL vertices + joints.

Standalone replacement for the reference's EasyMocap-hosted
`tool/get_X_pose.py` (which must be copied into EasyMocap/apps/demo): uses
the pure-numpy SMPL forward (data/smpl_numpy.py) directly on the model
pickle. For every subject, loads one frame's fitted `shapes`, zeroes Rh/Th,
poses the body in the X-pose (legs +-0.6 rad about z), and writes
`X_smpl_vertices.npy` (1, 6890, 3) and `X_smpl_joints.npy` (1, 24, 3) — the
latter also fixes the reference's H36M unbound-`joints` bug by actually
providing the asset it expects.

Usage:
  python tool/get_X_pose.py --smpl PATH/SMPL_NEUTRAL.pkl \
      --zju_root DATA/zju_mocap [--subjects CoreView_313 ...]
  python tool/get_X_pose.py --smpl ... --h36m_root DATA/h36m [--subjects S9 ...]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dual_space_nerf_tpu.data.smpl import x_pose  # noqa: E402
from dual_space_nerf_tpu.data.smpl_numpy import SMPLModel  # noqa: E402

ZJU_SUBJECTS = [
    "CoreView_313", "CoreView_315", "CoreView_377", "CoreView_386",
    "CoreView_387", "CoreView_392", "CoreView_393", "CoreView_394",
]
H36M_SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]


def first_param_file(params_dir: str) -> str:
    files = sorted(glob.glob(os.path.join(params_dir, "*.npy")))
    if not files:
        raise FileNotFoundError(f"no params in {params_dir}")
    return files[0]


def compute_x_pose_assets(model: SMPLModel, param_path: str):
    param = np.load(param_path, allow_pickle=True).item()
    betas = np.asarray(param.get("shapes", np.zeros(10))).reshape(-1)[:10]
    verts, joints = model.forward(x_pose(), betas=betas, Rh=None, Th=None)
    return verts[None], joints[None]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--smpl", required=True, help="SMPL model pkl (or dir)")
    ap.add_argument("--zju_root", default="")
    ap.add_argument("--h36m_root", default="")
    ap.add_argument("--subjects", nargs="*", default=None)
    args = ap.parse_args(argv)

    model = SMPLModel(args.smpl)

    if args.zju_root:
        for subject in args.subjects or ZJU_SUBJECTS:
            base = os.path.join(args.zju_root, subject)
            verts, joints = compute_x_pose_assets(
                model, first_param_file(os.path.join(base, "new_params"))
            )
            np.save(os.path.join(base, "X_smpl_vertices.npy"), verts)
            np.save(os.path.join(base, "X_smpl_joints.npy"), joints)
            print(subject, verts.shape)

    if args.h36m_root:
        for subject in args.subjects or H36M_SUBJECTS:
            base = os.path.join(args.h36m_root, subject, "Posing")
            verts, joints = compute_x_pose_assets(
                model, first_param_file(os.path.join(base, "new_params"))
            )
            lbs = os.path.join(base, "lbs")
            os.makedirs(lbs, exist_ok=True)
            np.save(os.path.join(lbs, "X_smpl_vertices.npy"), verts)
            np.save(os.path.join(lbs, "X_smpl_joints.npy"), joints)
            print(subject, verts.shape)


if __name__ == "__main__":
    main()
