#!/usr/bin/env python3
"""Per-stage timing of the ZJU-313 train-step workload on the current device.

Prints ms for: full train step (remat on/off, f32/bf16), the two pruned
nearest-face searches, the GG near/far kernel, and an MLP-only step with the
warp precomputed — so the README's perf table is measured, not inferred.

Usage: python scripts/profile_step.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=20, warmup=3):
    # a device->host copy is the only reliable execution barrier on the
    # axon remote executor (block_until_ready does not flush it)
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
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from dual_space_nerf_tpu.config import get_cfg_defaults
    from dual_space_nerf_tpu.data.batching import item_to_mesh
    from dual_space_nerf_tpu.data.synthetic import make_scene
    from dual_space_nerf_tpu.models import DualSpaceNeRF
    from dual_space_nerf_tpu.ops import face_centroids
    from dual_space_nerf_tpu.ops.pruned_knn import pruned_search_presorted
    from dual_space_nerf_tpu.renderer import RayBatch, RenderSettings, resolve_mlp_chunk
    from dual_space_nerf_tpu.training import (
        TrainBatch,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    NRAYS, S = 5500, 64
    cfg = get_cfg_defaults()
    cfg.SOLVER.WEIGHT_DECAY = 0.0

    rng = np.random.default_rng(0)
    scene = make_scene()
    geom = item_to_mesh({"xyz": scene.verts_world}, scene.faces, scene.verts_cano)
    eye = (-scene.R.T @ scene.T).ravel()
    targets = scene.verts_world[rng.integers(0, len(scene.verts_world), NRAYS)]
    targets = targets + 0.03 * rng.standard_normal((NRAYS, 3))
    # floor, not astype(int): truncation toward zero would merge the
    # [-0.125, 0.125) band into one double-width bucket per axis, giving
    # the isolated KNN rows a layout real batches never produce
    b = np.floor(targets * 8).astype(np.int64)
    key = b[:, 0] * 4096 + b[:, 1] * 64 + b[:, 2]
    targets = targets[np.argsort(key)]
    d = (targets - eye).astype(np.float32)
    rays = RayBatch(
        ray_o=jnp.asarray(np.broadcast_to(eye, (NRAYS, 3)), jnp.float32),
        ray_d=jnp.asarray(d),
        near=jnp.full((NRAYS,), 0.5, jnp.float32),
        far=jnp.full((NRAYS,), 3.5, jnp.float32),
        frame=jnp.asarray(0, jnp.int32),
        body_pose=jnp.asarray(scene.poses[1:], jnp.float32),
    )
    batch = TrainBatch(
        rays=rays,
        rgb=jnp.asarray(rng.random((NRAYS, 3)), jnp.float32),
        occupancy=jnp.ones((NRAYS,), jnp.float32),
    )
    tx, _ = make_optimizer(cfg)
    rngk = jax.random.key(1)

    def step_ms(remat, dtype, **kw):
        model = DualSpaceNeRF(compute_dtype=dtype)
        settings = RenderSettings(
            n_samples=S, sample_mode="GG",
            mlp_chunk=resolve_mlp_chunk(
                cfg.MODEL.MLP_CHUNK, kw.get("shade_topk", 0)
            ),
            knn_impl="auto", remat=remat, **kw,
        )
        holder = {"s": create_train_state(model, tx, jax.random.key(0))}
        step = make_train_step(model, tx, settings, loss_type="L2")

        def run():
            # the step donates its state input; always feed the fresh one
            holder["s"], m = step(holder["s"], batch, geom, rngk)
            return m["loss"]

        return timeit(run, iters=args.iters)

    print(f"full step  remat=T f32 : {step_ms(True, None):8.2f} ms")
    print(f"full step  remat=F f32 : {step_ms(False, None):8.2f} ms")
    print(f"full step  remat=F bf16: {step_ms(False, jnp.bfloat16):8.2f} ms")
    print(f"gated step K=8 (bench config) : {step_ms(False, None, shade_topk=8):8.2f} ms")
    print(f"gated step K=8 + reuse faces  : "
          f"{step_ms(False, None, shade_topk=8, reuse_warp_faces=True):8.2f} ms")
    for blk in (256, 512, 1024, 2048):
        print(
            f"gated K=8 + reuse + FUSED_MLP block={blk:5d} : "
            f"{step_ms(False, None, shade_topk=8, reuse_warp_faces=True, fused_mlp=True, fused_block=blk):8.2f} ms"
        )

    # isolated pruned KNN (world + canonical workload shapes)
    n = NRAYS * S
    pts = jnp.asarray(
        np.repeat(targets, S, axis=0)
        + 0.02 * rng.standard_normal((n, 3)).astype(np.float32)
    )
    cents_w = face_centroids(geom.verts_world, geom.faces)
    cents_c = face_centroids(geom.verts_cano, geom.faces)

    # centroids are TRACED args, matching the pipeline — closing them over
    # the jit as constants adds ~8 ms/call (README KNN section)
    knn = jax.jit(
        lambda p, cw, cc: (
            pruned_search_presorted(p, cw, geom.face_perm),
            pruned_search_presorted(p, cc, geom.face_perm),
        )
    )
    print(f"2x pruned KNN ({n} pts) : "
          f"{timeit(knn, pts, cents_w, cents_c, iters=args.iters):8.2f} ms")
    knn1 = jax.jit(
        lambda p, cw: pruned_search_presorted(p, cw, geom.face_perm)
    )
    print(f"1x pruned KNN           : "
          f"{timeit(knn1, pts, cents_w, iters=args.iters):8.2f} ms")

    from dual_space_nerf_tpu.ops.gg_pallas import gg_near_far_pallas

    gg = jax.jit(
        lambda: gg_near_far_pallas(
            rays.ray_o, rays.ray_d, rays.near, rays.far, geom.verts_world,
            gamma=0.05,
        )
    )
    print(f"GG near/far kernel      : {timeit(gg, iters=args.iters):8.2f} ms")

    # ---- finer breakdown of the non-KNN portion ----
    from dual_space_nerf_tpu.renderer.pipeline import (
        _point_network,
        warp_world_to_canonical,
    )

    variants = [
        (None, False, 512, "f32"),
        (jnp.bfloat16, False, 512, "bf16"),
        (None, True, 512, "fused b=512"),
        (None, True, 1024, "fused b=1024"),
        (None, True, 2048, "fused b=2048"),
    ]
    for dtype, fused, blk, tag in variants:
        model = DualSpaceNeRF(compute_dtype=dtype)
        state = create_train_state(model, tx, jax.random.key(0))
        params = state.params
        pose_feat = jnp.zeros((n, 16), jnp.float32)
        code = jnp.zeros((8,), jnp.float32)  # precomputed-code path
        tris = jnp.zeros((n, 3, 3), jnp.float32)
        net_settings = RenderSettings(
            n_samples=S, fused_mlp=fused, fused_block=blk
        )

        def net_loss(params, pc):
            color, sigma = _point_network(
                params, model, pts, pc, pts, code, pose_feat,
                jnp.float32(1.0), tris + pc[:, None, :], tris + pc[:, None, :],
                net_settings,
            )
            return jnp.mean(color ** 2) + jnp.mean(sigma ** 2)

        netgrad = jax.jit(lambda p, pc: jax.grad(net_loss)(p, pc))
        ms = timeit(netgrad, params, pts, iters=args.iters)
        print(f"network fwd+bwd {tag} ({n} pts, unchunked): {ms:8.2f} ms")

    settings = RenderSettings(n_samples=S, sample_mode="GG", knn_impl="xla")
    warp = jax.jit(
        lambda p: warp_world_to_canonical(
            p, geom, cents_w, settings,
            fidx=jnp.zeros((n,), jnp.int32),
        )[0]
    )
    print(f"warp math (KNN excluded)   : {timeit(warp, pts, iters=args.iters):8.2f} ms")

    # ---- the "rest" bucket: compositing, selection, optimizer ----
    import optax

    from dual_space_nerf_tpu.geometry.compositing import composite

    raw_rgb = jnp.asarray(rng.random((NRAYS, S, 3)), jnp.float32)
    raw_sigma = jnp.asarray(rng.random((NRAYS, S)), jnp.float32)
    z_vals = jnp.broadcast_to(jnp.linspace(0.5, 3.5, S), (NRAYS, S))
    comp = jax.jit(
        lambda: composite(raw_rgb, raw_sigma, z_vals, rays.ray_d).rgb
    )
    print(f"alpha compositing ({NRAYS}x{S}) : {timeit(comp, iters=args.iters):8.2f} ms")

    topk = jax.jit(lambda w: jax.lax.top_k(w, 8))
    print(f"top-k8 selection ({NRAYS}x{S})  : "
          f"{timeit(topk, raw_sigma, iters=args.iters):8.2f} ms")

    model = DualSpaceNeRF()
    state = create_train_state(model, tx, jax.random.key(0))
    grads = jax.tree.map(jnp.ones_like, state.params)

    @jax.jit
    def adam_only(params, opt_state):
        upd, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_opt

    print(f"Adam update (params only)  : "
          f"{timeit(adam_only, state.params, state.opt_state, iters=args.iters):8.2f} ms")
