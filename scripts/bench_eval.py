#!/usr/bin/env python3
"""Eval-path (full-image render) throughput: s/image + rays/s at 512x512.

BASELINE.json config #1 is the reference's inference render
(`/root/reference/can_render.py:172-278`: `render_view` in 3072-ray
chunks over the AABB-masked pixels of a 512x512 image). This script
measures the TPU equivalent — `evaluation.ImageRenderer.render_item` on
the synthetic 512x512 scene (SMPL-sized mesh, GG sampling, 64 samples,
full exact shading) — sweeping the ray-chunk size and the fused-MLP
kernels.

Eval is full-shading (no gating). Measured on v5e (bench/r3): the fused
SpaceNet kernels LOSE here too (80.0k vs 132.2k rays/s at chunk 16384),
so the production eval path is the plain XLA face-id pipeline; the fused
sweep column stays for A/Bs.

Usage: python scripts/bench_eval.py [--images 3] [--chunks 3072,8192,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=3,
                    help="timed renders per config (after 1 warmup)")
    ap.add_argument("--chunks", type=str, default="3072,4096,8192,16384,32768")
    ap.add_argument("--fused", type=str, default="0,1")
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from dual_space_nerf_tpu.cli.common import build_model
    from dual_space_nerf_tpu.config import get_cfg_defaults
    from dual_space_nerf_tpu.data import SyntheticDataset
    from dual_space_nerf_tpu.evaluation import ImageRenderer
    from dual_space_nerf_tpu.renderer import RenderSettings, resolve_mlp_chunk
    from dual_space_nerf_tpu.training import create_train_state, make_optimizer

    cfg = get_cfg_defaults()
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg)
    state = create_train_state(model, tx, jax.random.key(0))

    dataset = SyntheticDataset(
        split="val", n_frames=1, n_views=1, h=args.size, w=args.size,
    )
    item = dataset[0]
    n_rays = int(np.asarray(item["mask_at_box"]).sum())
    print(f"image {args.size}x{args.size}: {n_rays} AABB rays "
          f"(reference renders these in 3072-ray chunks)")

    for fused in [int(x) for x in args.fused.split(",")]:
        for chunk in [int(x) for x in args.chunks.split(",")]:
            settings = RenderSettings(
                n_samples=64, sample_mode="GG", mlp_chunk=resolve_mlp_chunk(cfg.MODEL.MLP_CHUNK, 0),
                knn_impl="auto", shade_topk=0, fused_mlp=bool(fused),
            )
            renderer = ImageRenderer(
                model, state.params, settings, np.asarray(dataset.faces),
                dataset.canonical_vertex, chunk=chunk,
            )
            try:
                renderer.render_item(item)  # warmup (compile)
                t0 = time.perf_counter()
                for _ in range(args.images):
                    out = renderer.render_item(item)
                dt = (time.perf_counter() - t0) / args.images
            except Exception as e:
                msg = str(e).splitlines()[0][:110]
                print(f"fused={fused} chunk={chunk:6d}: FAILED "
                      f"({type(e).__name__}: {msg})")
                continue
            print(f"fused={fused} chunk={chunk:6d}: {dt:6.3f} s/image  "
                  f"{n_rays / dt / 1e3:8.1f}k rays/s")
