#!/usr/bin/env python3
"""Sweep pruned-KNN kernel variants on the production bench workload.

Builds the exact point set the train step feeds the world nearest-face
search (SyntheticDataset 512x512 -> importance-sampled rays -> GG near/far
-> stratified samples -> the renderer's block-coherent layout) and times
`pruned_search_presorted` across (block_p, block_f, tighten) variants.

Usage: python scripts/sweep_knn.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NRAYS, S = 5500, 64


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument(
        "--listed", action="store_true",
        help="sweep the v3 list-driven search over (block_sc, block_p) "
        "instead of the v2 unrolled kernel",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from dual_space_nerf_tpu.data import SyntheticDataset
    from dual_space_nerf_tpu.data.batching import item_to_mesh, item_to_train_batch
    from dual_space_nerf_tpu.geometry import stratified_z, sample_along_rays
    from dual_space_nerf_tpu.ops import face_centroids
    from dual_space_nerf_tpu.ops.gg_pallas import gg_near_far_pallas
    from dual_space_nerf_tpu.ops.pruned_knn import pruned_search_presorted

    dataset = SyntheticDataset(
        split="train", nrays=NRAYS, n_frames=1, n_views=1, h=512, w=512,
    )
    item = dataset[0]
    batch = item_to_train_batch(item, NRAYS)
    geom = item_to_mesh(
        item, np.asarray(dataset.faces), dataset.canonical_vertex
    )
    rays = batch.rays

    @functools.partial(jax.jit, static_argnames=("sc",))
    def make_pts(sc=8):
        near, far = gg_near_far_pallas(
            rays.ray_o, rays.ray_d, rays.near, rays.far, geom.verts_world,
            gamma=0.05,
        )
        z = stratified_z(near, far, S, jax.random.key(0))
        pts = sample_along_rays(rays.ray_o, rays.ray_d, z)  # (R, S, 3)
        # the renderer's block layout: (sample-chunk, ray, sample-within)
        y = pts.reshape(NRAYS, S // sc, sc, 3)
        y = jnp.swapaxes(y, 0, 1)
        return y.reshape(NRAYS * S, 3)

    pts = jax.block_until_ready(make_pts())
    np.asarray(pts)
    cents_w = face_centroids(geom.verts_world, geom.faces)

    if args.listed:
        from dual_space_nerf_tpu.ops.pruned_knn import (
            build_face_tiles,
            pruned_search_listed,
        )

        tile_tables = {
            bf: build_face_tiles(cents_w, block_f=bf) for bf in (64, 128)
        }
        for sc in (16, 32):
            pts_sc = jax.block_until_ready(make_pts(sc=sc))
            base = None
            base_cfg = None
            for bf in (128, 64):
                for bp in (1024, 2048, 4096):
                    for pp in (256, 512, bp):
                        if pp > bp or bp // pp > 8:
                            continue
                        fn = jax.jit(
                            lambda p, bp=bp, bf=bf, pp=pp:
                            pruned_search_listed(
                                p, cents_w, tile_tables[bf], block_p=bp,
                                plan_p=pp,
                            )
                        )
                        try:
                            ms = timeit(fn, pts_sc, iters=args.iters)
                            got = fn(pts_sc)
                        except Exception as e:  # e.g. VMEM OOM at large blocks
                            msg = str(e).splitlines()[0][:120]
                            print(f"sc={sc:3d} bf={bf:4d} block_p={bp:5d} "
                                  f"plan_p={pp:5d}: FAILED "
                                  f"({type(e).__name__}: {msg})")
                            continue
                        if base is None:
                            base = got
                            base_cfg = (bf, bp, pp)
                            if base_cfg != (128, 1024, 256):
                                print(
                                    "NOTE: earlier configs failed; mismatch "
                                    f"counts compare against bf={bf} "
                                    f"block_p={bp} plan_p={pp}, not the "
                                    "first-listed config"
                                )
                        mism = int(jnp.sum(got != base))
                        note = f"  mism={mism}" if mism else ""
                        print(f"sc={sc:3d} bf={bf:4d} block_p={bp:5d} "
                              f"plan_p={pp:5d}: {ms:7.2f} ms{note}")
        sys.exit(0)

    variants = [
        (128, 1024, 1),   # production default
        (128, 1024, 0),
        (128, 1024, 2),
        (256, 1024, 1),
        (128, 512, 1),
        (128, 512, 0),
        (256, 512, 1),
        (128, 2048, 1),
        (256, 2048, 1),
        (512, 1024, 1),
    ]
    base = None
    for bp, bf, tg in variants:
        fn = jax.jit(
            lambda p, bp=bp, bf=bf, tg=tg: pruned_search_presorted(
                p, cents_w, geom.face_perm, block_p=bp, block_f=bf, tighten=tg
            )
        )
        ms = timeit(fn, pts, iters=args.iters)
        if base is None:
            base = fn(pts)
        else:
            mism = int(jnp.sum(fn(pts) != base))
            if mism:
                print(f"  !! ({bp},{bf},tighten={tg}): {mism} mismatches vs default")
        print(f"block_p={bp:4d} block_f={bf:5d} tighten={tg}: {ms:7.2f} ms")
