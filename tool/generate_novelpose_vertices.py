#!/usr/bin/env python3
"""Re-pose a target motion sequence with a source performer's body shape.

Standalone replacement for the reference's EasyMocap-hosted
`tool/generate_novelpose_vertices.py`: for each frame of the target
sequence's fitted params, substitutes the source performer's `shapes` (and
pins Rh/Th to the source's first frame so the avatar stays in place), runs
the numpy SMPL forward, and writes new_vertices/new_params for the
novel-pose datasets (`novelpose_examples/...` layout).

Usage (animate ZJU performer with an H36M motion):
  python tool/generate_novelpose_vertices.py --smpl SMPL_NEUTRAL.pkl \
      --src_params DATA/zju_mocap/CoreView_313/new_params/1.npy \
      --tgt_params_dir DATA/h36m/S9/Posing/new_params \
      --out OUT/CoreView_313_S9
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dual_space_nerf_tpu.data.smpl_numpy import SMPLModel  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--smpl", required=True)
    ap.add_argument("--src_params", required=True,
                    help="one params .npy of the SOURCE performer (shape donor)")
    ap.add_argument("--tgt_params_dir", required=True,
                    help="directory of the TARGET motion's per-frame params")
    ap.add_argument("--out", required=True)
    ap.add_argument("--keep_target_rt", action="store_true",
                    help="keep the target's Rh/Th instead of pinning to source")
    args = ap.parse_args(argv)

    model = SMPLModel(args.smpl)
    src = np.load(args.src_params, allow_pickle=True).item()
    src_shapes = np.asarray(src["shapes"]).reshape(-1)[:10]
    src_Rh = src["Rh"]
    src_Th = src["Th"]

    out_v = os.path.join(args.out, "new_vertices")
    out_p = os.path.join(args.out, "new_params")
    os.makedirs(out_v, exist_ok=True)
    os.makedirs(out_p, exist_ok=True)

    for path in sorted(glob.glob(os.path.join(args.tgt_params_dir, "*.npy"))):
        fn = os.path.basename(path)
        param = np.load(path, allow_pickle=True).item()
        param["shapes"] = src_shapes.reshape(1, -1)
        if not args.keep_target_rt:
            param["Rh"] = src_Rh
            param["Th"] = src_Th
        verts, _ = model.forward(
            np.asarray(param["poses"]).reshape(24, 3),
            betas=src_shapes,
            Rh=param["Rh"],
            Th=param["Th"],
        )
        np.save(os.path.join(out_v, fn), verts[None])
        np.save(os.path.join(out_p, fn), param)
        print(fn, verts.shape)


if __name__ == "__main__":
    main()
