#!/usr/bin/env python3
"""Host data-pipeline throughput: items/s through PrefetchLoader with the
full ZJU transform (imread + undistort + fg-mask + resize + 60/5/35 ray
importance sampling + batch conversion/device put) on synthetic image files
at real ZJU resolution (1024x1024 -> ratio 0.5).

The device consumes ~10-16 steps/s (60-95 ms/step on v5e, scripts/
profile_step.py); the loader must sustain at least that or training goes
host-bound. Prints one JSON line per worker count.

Usage: python scripts/bench_loader.py [--items 40] [--workers 1 3 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 1024, 1024
N_FRAMES, N_VIEWS = 8, 4
NRAYS = 5500


def build_tree(data_dir: str) -> None:
    import cv2

    from dual_space_nerf_tpu.data.synthetic import look_at_camera, make_scene

    scene = make_scene(h=H, w=W)  # V=6890/F=13776
    root = os.path.join(data_dir, "CoreView_377")
    os.makedirs(root, exist_ok=True)

    names, mats = [], {}
    rng = np.random.default_rng(0)
    for c in range(N_VIEWS):
        ang = 2 * np.pi * c / N_VIEWS
        eye = np.array([3.0 * np.cos(ang), 3.0 * np.sin(ang), 0.3])
        K, R, T = look_at_camera(eye, np.zeros(3), H, W, focal=1200.0)
        nm = f"Camera_B{c + 1}"
        names.append(nm)
        mats[f"K_{nm}"] = K
        # real ZJU cameras have nonzero distortion — keep it nonzero so the
        # bench exercises the cached-undistort remap, not its no-op path
        mats[f"dist_{nm}"] = np.array([-0.1, 0.05, 1e-3, -1e-3, 0.01]).reshape(5, 1)
        mats[f"R_{nm}"] = __import__("cv2").Rodrigues(R)[0]
        mats[f"T_{nm}"] = T.reshape(3, 1)

    _write_opencv_yml(
        os.path.join(root, "intri.yml"), names,
        {k: v for k, v in mats.items() if k[0] in "Kd"},
    )
    _write_opencv_yml(
        os.path.join(root, "extri.yml"), None,
        {k: v for k, v in mats.items() if k[0] in "RT"},
    )

    # one real rendered splat per view reused across frames: imread/undistort
    # cost depends on pixels, not content
    from dual_space_nerf_tpu.data.synthetic_dataset import splat_image

    for c in range(N_VIEWS):
        img, mask = splat_image(scene, H, W)
        for f in range(N_FRAMES):
            cam = f"Camera_B{c + 1}"
            os.makedirs(os.path.join(root, cam), exist_ok=True)
            cv2.imwrite(
                os.path.join(root, cam, f"{f}.jpg"),
                (img * 255).astype(np.uint8),
            )
            mdir = os.path.join(root, "mask_cihp", cam)
            os.makedirs(mdir, exist_ok=True)
            cv2.imwrite(os.path.join(mdir, f"{f}.png"), mask * 255)

    os.makedirs(os.path.join(root, "new_params"), exist_ok=True)
    os.makedirs(os.path.join(root, "new_vertices"), exist_ok=True)
    for f in range(N_FRAMES):
        np.save(
            os.path.join(root, "new_params", f"{f}.npy"),
            {
                "Rh": np.zeros((1, 3), np.float32),
                "Th": np.zeros((1, 3), np.float32),
                "poses": (0.05 * rng.standard_normal((1, 72))).astype(np.float32),
            },
        )
        np.save(
            os.path.join(root, "new_vertices", f"{f}.npy"),
            scene.verts_world.astype(np.float32),
        )
    np.save(
        os.path.join(root, "X_smpl_vertices.npy"), scene.verts_cano[None]
    )


def _write_opencv_yml(path, names, mats):
    lines = ["%YAML:1.0", "---"]
    if names is not None:
        lines.append("names:")
        lines += [f'   - "{nm}"' for nm in names]
    for key, m in mats.items():
        m = np.asarray(m, np.float64)
        data = ", ".join(f"{v:.10e}" for v in m.ravel())
        lines += [f"{key}: !!opencv-matrix", f"   rows: {m.shape[0]}",
                  f"   cols: {m.shape[1]}", "   dt: d", f"   data: [ {data} ]"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=32)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 3, 6])
    ap.add_argument(
        "--backend", nargs="+", default=["thread"],
        choices=["thread", "process"],
        help="PrefetchLoader backend(s) to sweep",
    )
    args = ap.parse_args()

    from dual_space_nerf_tpu.data import PrefetchLoader
    from dual_space_nerf_tpu.data.batching import (
        item_to_mesh,
        item_to_train_batch,
    )
    from dual_space_nerf_tpu.data.zju import Mocap

    with tempfile.TemporaryDirectory() as d:
        print("building synthetic ZJU tree...", file=sys.stderr)
        build_tree(d)
        ds = Mocap(
            human="CoreView_377", ratio=0.5, nrays=NRAYS, begin=0,
            end=N_FRAMES, train_views=tuple(range(N_VIEWS)), data_dir=d,
        )
        from dual_space_nerf_tpu.data.synthetic import make_scene

        faces = np.asarray(make_scene().faces)
        cano = ds.canonical_vertex

        def to_device(item):
            return (
                item_to_train_batch(item, NRAYS),
                item_to_mesh(item, faces, cano),
            )

        for tf, tag in ((None, "bare"), (to_device, "with_transform")):
            for nw, backend in (
                (nw, b) for b in args.backend for nw in args.workers
            ):
                loader = PrefetchLoader(
                    ds, shuffle=True, num_workers=nw, seed=0, transform=tf,
                    backend=backend,
                )
                it = iter(loader)
                next(it)  # warm caches / compile device puts
                t0 = time.perf_counter()
                n = 0
                while n < args.items:
                    try:
                        next(it)
                    except StopIteration:
                        it.close()
                        it = iter(loader)
                    n += 1
                dt = time.perf_counter() - t0
                it.close()  # stop workers before the tempdir goes away
                print(json.dumps({
                    "metric": f"zju_loader_items_per_sec_{tag}",
                    "workers": nw,
                    "backend": backend,
                    "value": round(args.items / dt, 2),
                    "unit": f"items/s ({H}x{W} imgs, {NRAYS} rays sampled)",
                }))


if __name__ == "__main__":
    main()
