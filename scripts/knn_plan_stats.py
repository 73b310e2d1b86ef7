#!/usr/bin/env python3
"""CPU estimate of the listed-KNN kernel's visit work vs plan granularity.

Simulates the exact in-kernel algorithm of `pruned_search_listed`
(ops/pruned_knn.py): per plan block — seed from the closest tile, walk the
lower-bound-sorted visit list, tighten the squared threshold after every
visit — using the production witness upper bound
(u_p = min_t d(p, witness_t)), and counts the d2 evaluations each
configuration performs:

    work = sum over plan blocks of visits(block) * bp_plan * bf

A "two-level" kernel would keep the 2048-pt grid block (amortizing the
Pallas prologue) but plan/threshold at bp_plan < 2048 granularity inside
it; this script bounds the payoff before any kernel work is spent.
Blocks are statistically independent, so a random subset estimates the
mean well.

Run on CPU: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/knn_plan_stats.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NRAYS, S = 5500, 64
SAMPLE_SUPERBLOCKS = 24  # 2048-pt superblocks sampled per config


def tile_geometry(cents, table):
    valid = table >= 0
    member = np.where(valid[..., None], cents[np.maximum(table, 0)], 1e15)
    lo = np.min(np.where(valid[..., None], member, np.inf), axis=1)
    hi = np.max(np.where(valid[..., None], member, -np.inf), axis=1)
    mid = 0.5 * (lo + hi)
    r2 = np.sum(
        (np.where(valid[..., None], member, 0.0) - mid[:, None]) ** 2, -1
    )
    w_idx = np.argmin(np.where(valid, r2, np.inf), axis=-1)
    witness = member[np.arange(len(table)), w_idx]
    return member, lo, hi, witness


def simulate_block(p, member, lo, hi, witness, oracle=False):
    """One plan block (P, 3) -> in-kernel visit count.

    oracle=True replaces the witness upper bound with a PERFECT per-point
    bound (the true nearest-centroid distance) — an unattainable best case
    that bounds how much better bounds could ever prune. The README /
    ops/pruned_knn.py cite this mode's numbers (12.5 -> 10.8 mean visits at
    whole-block plans) as the evidence the bound lever is closed."""
    if oracle:
        # true nearest-centroid distance per point, computed tile by tile
        # to keep memory at (P, BF)
        u_p = np.full((p.shape[0], 1), np.inf)
        for ti in range(member.shape[0]):
            d = p[:, None] - member[ti][None]
            d2 = np.sum(d * d, axis=-1)
            u_p = np.minimum(u_p, np.sqrt(d2.min(-1, keepdims=True)))
    else:
        d_w = np.linalg.norm(p[:, None] - witness[None], axis=-1)  # (P, T)
        u_p = d_w.min(1, keepdims=True)                            # (P, 1)
    ex = (np.maximum(lo[None] - p[:, None], 0.0)
          + np.maximum(p[:, None] - hi[None], 0.0))               # (P, T, 3)
    lb2 = np.sum(ex * ex, axis=-1)                                # (P, T)
    vis = (lb2 <= u_p * u_p).any(0)                               # (T,)
    lbs = np.where(vis, lb2.min(0), np.inf)
    order = np.argsort(lbs)
    cnt = int(vis.sum())
    if cnt == 0:
        return 1

    def tile_d2(ti):
        d = p[:, None] - member[ti][None]
        return np.sum(d * d, axis=-1)

    best = tile_d2(order[0])
    thresh = np.max(np.min(best, axis=-1))
    visited = 1
    for i in range(1, cnt):
        if lbs[order[i]] <= thresh:
            best = np.minimum(best, tile_d2(order[i]))
            thresh = np.max(np.min(best, axis=-1))
            visited += 1
    return visited


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--oracle", action="store_true",
        help="also simulate a PERFECT per-point upper bound (true nearest "
        "distance) next to the production witness bound, quantifying the "
        "remaining pruning headroom from better bounds",
    )
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dual_space_nerf_tpu.data import SyntheticDataset
    from dual_space_nerf_tpu.data.batching import (
        item_to_mesh, item_to_train_batch,
    )
    from dual_space_nerf_tpu.geometry import sample_along_rays, stratified_z
    from dual_space_nerf_tpu.ops import face_centroids
    from dual_space_nerf_tpu.ops.gg_pallas import gg_near_far_pallas
    from dual_space_nerf_tpu.ops.pruned_knn import build_face_tiles

    dataset = SyntheticDataset(
        split="train", nrays=NRAYS, n_frames=1, n_views=1, h=512, w=512,
    )
    item = dataset[0]
    batch = item_to_train_batch(item, NRAYS)
    geom = item_to_mesh(item, np.asarray(dataset.faces),
                        dataset.canonical_vertex)
    rays = batch.rays
    near, far = gg_near_far_pallas(
        rays.ray_o, rays.ray_d, rays.near, rays.far, geom.verts_world,
        gamma=0.05, interpret=jax.default_backend() != "tpu",
    )
    z = stratified_z(near, far, S, jax.random.key(0))
    pts = sample_along_rays(rays.ray_o, rays.ray_d, z)
    sc = 16
    y = jnp.swapaxes(pts.reshape(NRAYS, S // sc, sc, 3), 0, 1)
    pts_np = np.asarray(y.reshape(NRAYS * S, 3), np.float32)
    cents = np.asarray(face_centroids(geom.verts_world, geom.faces),
                       np.float32)

    n = pts_np.shape[0]
    n_super = n // 2048
    rng = np.random.default_rng(0)
    supers = rng.choice(n_super, min(SAMPLE_SUPERBLOCKS, n_super),
                        replace=False)

    bounds = [("witness", False)] + ([("oracle", True)] if cli.oracle else [])
    for bf in (128, 64):
        table = np.asarray(build_face_tiles(jnp.asarray(cents), block_f=bf))
        member, lo, hi, witness = tile_geometry(cents, table)
        for bound_name, oracle in bounds:
            ref_work = None
            for bp_plan in (2048, 1024, 512, 256):
                visits = []
                for sb in supers:
                    block = pts_np[sb * 2048: (sb + 1) * 2048]
                    for j in range(2048 // bp_plan):
                        visits.append(simulate_block(
                            block[j * bp_plan: (j + 1) * bp_plan],
                            member, lo, hi, witness, oracle=oracle,
                        ))
                work = (
                    float(np.mean(visits)) * (2048 // bp_plan) * bp_plan * bf
                )
                rel = work / ref_work if ref_work else 1.0
                if ref_work is None:
                    ref_work = work
                print(
                    f"bf={bf:4d} bound={bound_name:7s} bp_plan={bp_plan:5d}: "
                    f"mean_visits={np.mean(visits):6.1f} "
                    f"p90={np.percentile(visits, 90):6.1f} "
                    f"work/superblock={work/1e6:6.2f}M d2"
                    f"  (x{rel:.2f} vs bp=2048)"
                )
