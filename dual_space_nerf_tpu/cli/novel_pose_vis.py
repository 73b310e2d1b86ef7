"""Novel-pose motion-transfer video CLI.

Behavioral reference: `novel_pose_vis.py:86-170` — drive the trained
canonical avatar of CoreView_313 with the `novelpose_examples/CoreView_313_op3`
pose sequence, frame code zeroed, light_center shift applied, frames dumped
and assembled into an mp4 (ffmpeg if available, else imageio/cv2 writer).
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess

import cv2
import numpy as np

from ..evaluation import ImageRenderer, light_state_for_novel_pose


def img2vid(img_dir: str, output_path: str, fps: int = 15) -> bool:
    frames = sorted(glob.glob(os.path.join(img_dir, "*.jpg")))
    if not frames:
        return False
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps), "-pattern_type", "glob",
             "-i", f"{img_dir}/*.jpg", output_path],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        first = cv2.imread(frames[0])
        h, w = first.shape[:2]
        vw = cv2.VideoWriter(
            output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for f in frames:
            vw.write(cv2.imread(f))
        vw.release()
        return True


def run_motion_transfer(
    dataset, renderer: ImageRenderer, save_dir: str, epoch: int,
    light_center, n_frames: int | None = None,
):
    rendering_dir = f"{save_dir}/{epoch}/rendering"
    img_dir = f"{save_dir}/{epoch}/img"
    os.makedirs(rendering_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)

    n = n_frames if n_frames is not None else len(dataset)
    for idx in range(n):
        try:
            item = dataset[idx]
        except (FileNotFoundError, IndexError):
            break  # pose sequence exhausted (reference relies on except->mp4)
        light = light_state_for_novel_pose(light_center, item["Th"], code_scale=0.0)
        results = renderer.render_item(item, light=light)
        color = np.clip(results["coarse_color"], 0.0, 1.0) * 255
        cv2.imwrite(f"{rendering_dir}/{idx:06d}.jpg", color)
        gt = item["img"] * 255
        cv2.imwrite(
            f"{img_dir}/{idx:06d}.jpg", np.concatenate([color, gt], axis=1)
        )
    img2vid(rendering_dir, os.path.join(save_dir, "rendering.mp4"))
    img2vid(img_dir, os.path.join(save_dir, "video.mp4"))


def main(argv=None):
    parser = argparse.ArgumentParser(description="novel pose motion transfer")
    parser.add_argument("-c", "--config", default="")
    parser.add_argument("--exp", type=str, default="test")
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--pose_dir", type=str,
                        default="novelpose_examples/CoreView_313_op3")
    parser.add_argument("--n_frames", type=int, default=0)
    parser.add_argument(
        "--performer", type=str, default="",
        help="cross-dataset motion transfer: the trained avatar (e.g. "
        "CoreView_377); with --motion_seq, routes through "
        "data_configs/novel_poses/{performer}_{motion_seq}.yml "
        "(reference novel_poses_dataset.py:232-246)",
    )
    parser.add_argument(
        "--motion_seq", type=str, default="",
        help="cross-dataset motion transfer: the driving H36M sequence "
        "(e.g. S9)",
    )
    parser.add_argument(
        "--vertices_dir", type=str, default="",
        help="override the driving sequence's posed-vertex dir (needed when "
        "the performer's body shape differs; see tool/"
        "generate_novelpose_vertices.py)",
    )
    parser.add_argument(
        "--data_parallel", action="store_true",
        help="shard render chunks over all local devices",
    )
    args = parser.parse_args(argv)

    from .common import (
        enable_compilation_cache,
        epoch_from_ckpt,
        eval_settings,
        load_cfg,
        load_faces,
        load_render_state,
    )

    enable_compilation_cache()

    cfg = load_cfg(args.config)
    epoch = epoch_from_ckpt(args.ckpt)
    save_dir = os.path.join("./motion_transfer", args.exp)

    zju_dir = os.environ.get("DSNERF_ZJU_PATH", cfg.DATASETS.ZJU_MOCAP_PATH)
    h36m_dir = os.environ.get("DSNERF_H36M_PATH", cfg.DATASETS.H36M_PATH)
    if args.performer and args.motion_seq:
        # H36M motion driving a (ZJU or H36M) performer's canonical avatar
        from ..data.h36m_novel_pose import get_novel_pose_dataset

        dataset = get_novel_pose_dataset(
            performer=args.performer, motion_seq=args.motion_seq,
            zju_data_dir=zju_dir, h36m_data_dir=h36m_dir,
        )
        if args.vertices_dir:
            dataset.cfg.vertices = args.vertices_dir
    else:
        # same-subject ZJU pose-sequence transfer (reference default path)
        from ..data.zju_novel_pose import MocapNovelPoseView

        dataset = MocapNovelPoseView(
            "CoreView_313", ratio=1, begin=0, end=100000, train_views=[],
            train_max_frame=2000, interval=4, vis_views=[9],
            performer="CoreView_313", zju_data_dir=zju_dir,
            h36m_data_dir=h36m_dir,
        )
        dataset.set_novel_pose_dirs(
            os.path.join(args.pose_dir, "new_params"),
            os.path.join(args.pose_dir, "new_vertices"),
        )
    print("length:", len(dataset))

    model, params = load_render_state(args.ckpt, cfg)
    faces = load_faces(cfg, dataset)
    from ..parallel import local_ray_mesh

    renderer = ImageRenderer(
        model, params, eval_settings(cfg), faces, dataset.canonical_vertex,
        chunk=cfg.TEST.RAY_CHUNK,
        mesh_devices=local_ray_mesh() if args.data_parallel else None,
    )
    run_motion_transfer(
        dataset, renderer, save_dir, epoch,
        light_center=list(cfg.TEST.light_center) or None,
        n_frames=args.n_frames or None,
    )


if __name__ == "__main__":
    main()
