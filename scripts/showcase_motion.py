#!/usr/bin/env python3
"""Motion-transfer showcase on the asset-free synthetic avatar.

Drives a trained showcase checkpoint (scripts/tpu_showcase.sh) with a pose
sequence the model never saw — bends sweeping well past the training range
while the camera slowly orbits — through the SAME `run_motion_transfer`
loop the novel-pose CLI uses (frame code zeroed, light_center shift),
producing `motion_transfer/<exp>/rendering.mp4` and the side-by-side
`video.mp4` against splatted ground truth.

Usage:
  python scripts/showcase_motion.py --exp showcase_cpu_r2 \
      [--config configs/showcase_synthetic.yml] [--frames 40]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)


class SyntheticMotion:
    """Unseen-pose sequence: bend 0.2 -> 0.9 (training uses 0.3 + 0.05*f),
    camera orbiting a quarter turn. Items match the dataset schema, so the
    CLI's run_motion_transfer consumes them unchanged."""

    def __init__(self, n_frames=40, h=128, w=128, seed=0):
        from dual_space_nerf_tpu.data.synthetic import make_scene

        self.h, self.w = h, w
        self.nrays = -1  # full-image rays, eval convention
        self.scenes = []
        for i in range(n_frames):
            t = i / max(n_frames - 1, 1)
            self.scenes.append(make_scene(
                seed=seed,
                bend=0.2 + 0.7 * t,
                cam_angle=0.5 * np.pi * t,
                h=h, w=w,
            ))
        self.canonical_vertex = self.scenes[0].verts_cano
        self.faces = self.scenes[0].faces
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, idx):
        from dual_space_nerf_tpu.data.rays import sample_rays
        from dual_space_nerf_tpu.data.synthetic_dataset import splat_image

        scene = self.scenes[idx]
        img, mask = splat_image(scene, self.h, self.w)
        rgb, ray_o, ray_d, near, far, coord, mask_at_box, bound_mask = (
            sample_rays(
                img, scene.K, scene.R, scene.T, scene.bounds,
                mask=mask, face_mask=None, nrays=self.nrays, rng=self.rng,
            )
        )
        occupancy = mask[coord[:, 0], coord[:, 1]]
        return {
            "img": img,
            "coord": coord,
            "rgb": rgb,
            "occupancy": occupancy.astype(np.float32),
            "ray_o": ray_o,
            "ray_d": ray_d,
            "near": near,
            "far": far,
            "mask_at_box": mask_at_box,
            "poses": scene.poses,
            "xyz": scene.verts_world,
            "bounds": scene.bounds,
            "Rh": np.eye(3, dtype=np.float32),
            "Th": np.zeros((1, 3), np.float32),
            "R": scene.R,
            "T": scene.T,
            "frame": 0,
            "cam_ind": 0,
            "save_name": f"motion{idx:04d}",
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="showcase_cpu_r2")
    ap.add_argument("--config", default="configs/showcase_synthetic.yml")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args()

    from dual_space_nerf_tpu.cli.common import (
        epoch_from_ckpt, load_cfg, load_render_state,
    )
    from dual_space_nerf_tpu.cli.novel_pose_vis import run_motion_transfer
    from dual_space_nerf_tpu.evaluation import ImageRenderer
    from dual_space_nerf_tpu.renderer import RenderSettings

    cfg = load_cfg(args.config)
    with open(f"EXP/{args.exp}/last_checkpoint", encoding="utf-8") as f:
        ckpt = f"EXP/{args.exp}/" + f.read().strip()

    dataset = SyntheticMotion(n_frames=args.frames, h=args.size, w=args.size)
    model, params = load_render_state(ckpt, cfg)
    renderer = ImageRenderer(
        model, params, RenderSettings.from_cfg(cfg),
        np.asarray(dataset.faces), dataset.canonical_vertex,
        chunk=cfg.TEST.RAY_CHUNK,
    )
    save_dir = os.path.join("motion_transfer", args.exp)
    run_motion_transfer(
        dataset, renderer, save_dir, epoch_from_ckpt(ckpt),
        light_center=cfg.TEST.light_center,
    )
    print(f"motion showcase done -> {save_dir}/rendering.mp4, video.mp4")


if __name__ == "__main__":
    main()
