"""Validation loop + CLI.

Behavioral reference: `validate.py:34-97` (`val`): full-image renders on the
validation views with frame code fixed to 50, masked/unmasked PSNR + SSIM,
JPEG dumps of render/acc/depth.
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

from ..evaluation import ImageRenderer, psnr, ssim_metric


def mkdir(d):
    os.makedirs(d, exist_ok=True)


def val(
    dataset, renderer: ImageRenderer, save_dir: str, epoch: int = 0,
    fixed_frame: int = 50,
) -> dict:
    psnr_w, psnr_wo, ssims = [], [], []
    img_dir = f"{save_dir}/{epoch}/img"
    acc_dir = f"{save_dir}/{epoch}/acc"
    depth_dir = f"{save_dir}/{epoch}/depth"
    for d in (img_dir, acc_dir, depth_dir):
        mkdir(d)

    for batch_idx in range(len(dataset)):
        item = dataset[batch_idx]
        real_frame = int(item["frame"])
        results = renderer.render_item(item, frame_override=fixed_frame)  # validate.py:48
        color = np.clip(results["coarse_color"], 0.0, 1.0)
        gt = item["img"]
        H, W = gt.shape[:2]
        mask = item["mask_at_box"].reshape(H, W).astype(bool)

        psnr_w.append(psnr(color, gt, np.repeat(mask[..., None], 3, -1)))
        psnr_wo.append(psnr(color, gt))
        ssims.append(ssim_metric(color, gt, mask))

        cat = np.concatenate([color, gt], axis=1) * 255
        cv2.imwrite(f"{img_dir}/{real_frame:06d}_{batch_idx}.jpg", cat)
        cv2.imwrite(
            f"{depth_dir}/{real_frame:06d}_{batch_idx}.jpg",
            np.repeat(results["coarse_depth"], 3, axis=2) * 255,
        )
        cv2.imwrite(
            f"{acc_dir}/{real_frame:06d}_{batch_idx}.jpg",
            np.repeat(results["coarse_acc"], 3, axis=2) * 255,
        )

    out = {
        "psnr_wMask": float(np.mean(psnr_w)),
        "psnr_woMask": float(np.mean(psnr_wo)),
        "ssim": float(np.mean(ssims)),
    }
    print(epoch)
    for k, v in out.items():
        print(f"{k}_mean", v)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="validate")
    parser.add_argument("-c", "--config", default="")
    parser.add_argument("--exp", type=str, default="test")
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument(
        "--data_parallel", action="store_true",
        help="shard eval ray chunks over all local devices (replicated "
        "params, ray-axis mesh)",
    )
    args = parser.parse_args(argv)

    from ..data import select_dataset
    from ..parallel import local_ray_mesh
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
    _, val_set = select_dataset(cfg, train_nrays=cfg.SOLVER.TRAIN_NRAYS)
    model, params = load_render_state(args.ckpt, cfg)
    faces = load_faces(cfg, val_set)
    renderer = ImageRenderer(
        model, params, eval_settings(cfg), faces, val_set.canonical_vertex,
        chunk=cfg.TEST.RAY_CHUNK,
        mesh_devices=local_ray_mesh() if args.data_parallel else None,
    )
    epoch = epoch_from_ckpt(args.ckpt)
    return val(
        val_set, renderer, f"EXP/{args.exp}/vis", epoch,
        fixed_frame=min(50, cfg.MODEL.MAX_FRAMES - 1),
    )


if __name__ == "__main__":
    main()
