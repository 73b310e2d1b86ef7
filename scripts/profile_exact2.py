#!/usr/bin/env python3
"""Composed-chain timings for the exact path (follow-up to profile_exact).

Times the exact-step stages AS COMPOSED (same producers/consumers as the
real pipeline) to locate the gap between the step total and the sum of
isolated stages:

  a) warp+posenc+pack only (the fused kernel's input chain, rooted at the
     face-table gather)
  b) a + fused kernel forward
  c) canonical KNN on the real in-step warped points
  d) b + c + transport + lighting (full fused exact fwd)
  e) d + backward (the region the step actually runs)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from dual_space_nerf_tpu.config import get_cfg_defaults
    from dual_space_nerf_tpu.data import SyntheticDataset
    from dual_space_nerf_tpu.data.batching import (
        item_to_mesh,
        item_to_train_batch,
    )
    from dual_space_nerf_tpu.geometry import sample_along_rays
    from dual_space_nerf_tpu.geometry.sampling import gg_near_far
    from dual_space_nerf_tpu.models import DualSpaceNeRF
    from dual_space_nerf_tpu.ops import face_centroids
    from dual_space_nerf_tpu.ops.fused_mlp import (
        extract_nerf_weights,
        fused_sigma_essence_normal,
    )
    from dual_space_nerf_tpu.ops.posenc import posenc
    from dual_space_nerf_tpu.ops.pruned_knn import pruned_search_listed
    from dual_space_nerf_tpu.renderer import RenderSettings, resolve_mlp_chunk
    from dual_space_nerf_tpu.renderer.pipeline import (
        _faces_table,
        _warp_chunk,
    )
    from dual_space_nerf_tpu.training import create_train_state, make_optimizer

    NRAYS, S = 5500, 64
    N = NRAYS * S
    cfg = get_cfg_defaults()
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    settings = RenderSettings(
        n_samples=S, sample_mode="GG", mlp_chunk=resolve_mlp_chunk(cfg.MODEL.MLP_CHUNK, 0),
        knn_impl="listed", shade_topk=0,
    )

    dataset = SyntheticDataset(
        split="train", nrays=NRAYS, n_frames=1, n_views=1, h=512, w=512,
    )
    item = dataset[0]
    batch = item_to_train_batch(item, NRAYS)
    geom = item_to_mesh(item, np.asarray(dataset.faces),
                        dataset.canonical_vertex)
    model = DualSpaceNeRF()
    tx, _ = make_optimizer(cfg)
    state = create_train_state(model, tx, jax.random.key(0))
    params = state.params

    cents_w = face_centroids(geom.verts_world, geom.faces)
    cents_c = face_centroids(geom.verts_cano, geom.faces)
    faces_wc = _faces_table(geom)
    rays = batch.rays

    # reproduce the step's point layout (blocked order) once, on device
    @jax.jit
    def make_points():
        near, far = gg_near_far(
            rays.ray_o, rays.ray_d, rays.near, rays.far, geom.verts_world,
            gamma=0.05,
        )
        z = near[:, None] + (far - near)[:, None] * jnp.linspace(0, 1, S)
        pts_w = sample_along_rays(rays.ray_o, rays.ray_d, z)
        r, s = z.shape
        sc = settings.block_sc
        while s % sc:
            sc //= 2
        y = pts_w.reshape(r, s // sc, sc, 3)
        return jnp.swapaxes(y, 0, 1).reshape(r * s, 3)

    pts_w_flat = jax.block_until_ready(make_points())

    knn_w = jax.jit(
        lambda p: pruned_search_listed(p, cents_w, geom.tile_table))
    fidx = jax.block_until_ready(knn_w(pts_w_flat))
    print(f"world KNN (in-step blocked layout)      : "
          f"{timeit(knn_w, pts_w_flat, iters=args.iters):8.2f} ms")

    @jax.jit
    def warp_only(pw, fi):
        pc, tmask, _, _ = _warp_chunk(pw, fi, faces_wc, settings)
        return pc, tmask

    pc_flat = jax.block_until_ready(warp_only(pts_w_flat, fidx)[0])
    print(f"a) warp only -> (N,3)                   : "
          f"{timeit(warp_only, pts_w_flat, fidx, iters=args.iters):8.2f} ms")

    code = jnp.zeros((8,), jnp.float32)
    pose_feat = jnp.zeros((16,), jnp.float32)

    @jax.jit
    def warp_pack(pw, fi):
        pc, tmask, _, _ = _warp_chunk(pw, fi, faces_wc, settings)
        pe = posenc(pc.astype(jnp.float32), 10)
        cp = jnp.concatenate(
            [jnp.broadcast_to(code, (N, 8)),
             jnp.broadcast_to(pose_feat, (N, 16))], axis=1)
        return pe, cp

    print(f"a2) warp+posenc+pack -> (N,87)          : "
          f"{timeit(warp_pack, pts_w_flat, fidx, iters=args.iters):8.2f} ms")

    @jax.jit
    def chain_fwd(p, pw, fi):
        pc, tmask, _, _ = _warp_chunk(pw, fi, faces_wc, settings)
        w = extract_nerf_weights(p["params"]["nerf"])
        pe = posenc(pc.astype(jnp.float32), 10)
        cp = jnp.concatenate(
            [jnp.broadcast_to(code, (N, 8)),
             jnp.broadcast_to(pose_feat, (N, 16))], axis=1)
        s_, e_, n_ = fused_sigma_essence_normal(w, pe, cp, block=512)
        return s_, e_, n_

    print(f"b) warp chain + fused kernel fwd        : "
          f"{timeit(chain_fwd, params, pts_w_flat, fidx, iters=args.iters):8.2f} ms")

    knn_c = jax.jit(
        lambda p: pruned_search_listed(p, cents_c, geom.tile_table))
    cidx = jax.block_until_ready(knn_c(pc_flat))
    print(f"c) canonical KNN (real warped points)   : "
          f"{timeit(knn_c, pc_flat, iters=args.iters):8.2f} ms")

    from dual_space_nerf_tpu.geometry.barycentric import (
        barycentric_map,
        project_point2mesh,
    )

    def full_fwd(p, pw, fi, ci):
        pc, tmask, _, _ = _warp_chunk(pw, fi, faces_wc, settings)
        w = extract_nerf_weights(p["params"]["nerf"])
        pe = posenc(pc.astype(jnp.float32), 10)
        cp = jnp.concatenate(
            [jnp.broadcast_to(code, (N, 8)),
             jnp.broadcast_to(pose_feat, (N, 16))], axis=1)
        sigma, essence, nloc = fused_sigma_essence_normal(
            w, pe, cp, block=512)
        tris_wc2 = faces_wc[ci]
        tw2 = tris_wc2[:, :9].reshape(-1, 3, 3)
        tc2 = tris_wc2[:, 9:].reshape(-1, 3, 3)
        uv, h = project_point2mesh(pc, tc2)
        start_w = barycentric_map(uv, h, tw2)
        uv2, h2 = project_point2mesh(pc + nloc, tc2)
        end_w = barycentric_map(uv2, h2, tw2)
        nrm = end_w - start_w
        normal_w = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        color = model.apply(p, normal_w, pw, pw, essence, method="lighting")
        return color, jnp.where(tmask, 0.0, sigma)

    jfull = jax.jit(full_fwd)
    print(f"d) full fused exact fwd (no KNNs)       : "
          f"{timeit(jfull, params, pts_w_flat, fidx, cidx, iters=args.iters):8.2f} ms")

    def loss_fn(p, pw, fi, ci):
        color, sigma = full_fwd(p, pw, fi, ci)
        return jnp.mean(color ** 2) + jnp.mean(sigma ** 2)

    jgrad = jax.jit(lambda p, pw, fi, ci: jax.grad(loss_fn)(p, pw, fi, ci))
    print(f"e) full fused exact fwd+bwd (no KNNs)   : "
          f"{timeit(jgrad, params, pts_w_flat, fidx, cidx, iters=args.iters):8.2f} ms")

    # the same composed region with the XLA (vjp) network instead
    def xla_fwd(p, pw, fi, ci):
        pc, tmask, _, _ = _warp_chunk(pw, fi, faces_wc, settings)

        def sigma_essence(xc):
            essence, density = model.apply(
                p, xc, None, jnp.broadcast_to(pose_feat, (N, 16)),
                jnp.float32(1.0), method="sigma_essence", code=code,
            )
            return essence, density

        (essence, density), pullback = jax.vjp(sigma_essence, pc)
        nloc = pullback((jnp.zeros_like(essence), jnp.ones_like(density)))[0]
        tris_wc2 = faces_wc[ci]
        tw2 = tris_wc2[:, :9].reshape(-1, 3, 3)
        tc2 = tris_wc2[:, 9:].reshape(-1, 3, 3)
        uv, h = project_point2mesh(pc, tc2)
        start_w = barycentric_map(uv, h, tw2)
        uv2, h2 = project_point2mesh(pc + nloc, tc2)
        end_w = barycentric_map(uv2, h2, tw2)
        nrm = end_w - start_w
        normal_w = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        color = model.apply(p, normal_w, pw, pw, essence, method="lighting")
        return color, jnp.where(tmask, 0.0, density[..., 0])

    def xla_loss(p, pw, fi, ci):
        color, sigma = xla_fwd(p, pw, fi, ci)
        return jnp.mean(color ** 2) + jnp.mean(sigma ** 2)

    jxgrad = jax.jit(lambda p, pw, fi, ci: jax.grad(xla_loss)(p, pw, fi, ci))
    print(f"f) same region, XLA vjp net fwd+bwd     : "
          f"{timeit(jxgrad, params, pts_w_flat, fidx, cidx, iters=args.iters):8.2f} ms")
