#!/usr/bin/env python3
"""Per-stage timing of the reference-EXACT train step (SHADE_TOPK=0).

The exact configuration shades every sample and re-searches canonical
space per point (reference `can_render.py:97-134`,
`model/spacenet.py:278-298`). This script breaks its cost down so the
optimization order is measured, not guessed:

- full exact step: fused on/off x reuse_warp_faces on/off x fused_block
- isolated fused sigma+essence+normal fwd+bwd at the step's N
- isolated lighting+transport fwd+bwd at the step's N
- the two listed KNNs

Usage: python scripts/profile_exact.py [--iters 10]
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
    from dual_space_nerf_tpu.models import DualSpaceNeRF
    from dual_space_nerf_tpu.ops import face_centroids
    from dual_space_nerf_tpu.ops.fused_mlp import (
        extract_nerf_weights,
        fused_sigma_essence_normal,
    )
    from dual_space_nerf_tpu.ops.posenc import posenc
    from dual_space_nerf_tpu.ops.pruned_knn import pruned_search_listed
    from dual_space_nerf_tpu.renderer import RenderSettings, resolve_mlp_chunk
    from dual_space_nerf_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    NRAYS, S = 5500, 64
    N = NRAYS * S
    cfg = get_cfg_defaults()
    cfg.SOLVER.WEIGHT_DECAY = 0.0

    dataset = SyntheticDataset(
        split="train", nrays=NRAYS, n_frames=1, n_views=1, h=512, w=512,
    )
    item = dataset[0]
    batch = item_to_train_batch(item, NRAYS)
    geom = item_to_mesh(item, np.asarray(dataset.faces),
                        dataset.canonical_vertex)
    tx, _ = make_optimizer(cfg)
    rngk = jax.random.key(1)

    def step_ms(**kw):
        model = DualSpaceNeRF()
        settings = RenderSettings(
            n_samples=S, sample_mode="GG", mlp_chunk=resolve_mlp_chunk(cfg.MODEL.MLP_CHUNK, 0),
            knn_impl="auto", remat=False, shade_topk=0, **kw,
        )
        holder = {"s": create_train_state(model, tx, jax.random.key(0))}
        step = make_train_step(model, tx, settings, loss_type="L2")

        def run():
            holder["s"], m = step(holder["s"], batch, geom, rngk)
            return m["loss"]

        return timeit(run, iters=args.iters)

    for blk in (512, 1024, 2048):
        print(f"exact step fused block={blk:5d} reuse=F : "
              f"{step_ms(fused_mlp=True, fused_block=blk):8.2f} ms")
    print(f"exact step fused block= 512 reuse=T : "
          f"{step_ms(fused_mlp=True, reuse_warp_faces=True):8.2f} ms")
    print(f"exact step fused b=512 fast reuse=F : "
          f"{step_ms(fused_mlp=True, fused_fast=True):8.2f} ms")
    print(f"exact step XLA            reuse=F : {step_ms():8.2f} ms")

    # ---- isolated stages at the step's N ----
    rng = np.random.default_rng(0)
    model = DualSpaceNeRF()
    state = create_train_state(model, tx, jax.random.key(0))
    params = state.params
    weights_tpl = extract_nerf_weights(params["params"]["nerf"])

    pts = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    cp = jnp.asarray(rng.standard_normal((N, 24)).astype(np.float32))

    def fused_loss(params, pc):
        w = extract_nerf_weights(params["params"]["nerf"])
        pe = posenc(pc, 10)
        s_, e_, n_ = fused_sigma_essence_normal(w, pe, cp, block=512)
        return jnp.mean(s_ ** 2) + jnp.mean(e_ ** 2) + jnp.mean(n_ ** 2)

    g = jax.jit(lambda p, pc: jax.grad(fused_loss)(p, pc))
    print(f"fused sigma+essence+normal fwd+bwd ({N} pts): "
          f"{timeit(g, params, pts, iters=args.iters):8.2f} ms")

    fwd = jax.jit(
        lambda p, pc: fused_sigma_essence_normal(
            extract_nerf_weights(p["params"]["nerf"]), posenc(pc, 10), cp,
            block=512,
        )[0]
    )
    print(f"fused sigma+essence+normal fwd only         : "
          f"{timeit(fwd, params, pts, iters=args.iters):8.2f} ms")

    # lighting + normal transport fwd+bwd (everything in _full_shading_fused
    # after the fused kernel, minus the canonical KNN)
    from dual_space_nerf_tpu.geometry.barycentric import (
        barycentric_map,
        project_point2mesh,
    )
    from dual_space_nerf_tpu.renderer.pipeline import _faces_table

    faces_wc = _faces_table(geom)
    cidx = jnp.asarray(
        rng.integers(0, geom.faces.shape[0], N).astype(np.int32))
    essence0 = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    nloc0 = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))

    def light_loss(params, essence, nloc):
        tris_wc2 = faces_wc[cidx]
        tw2 = tris_wc2[:, :9].reshape(-1, 3, 3)
        tc2 = tris_wc2[:, 9:].reshape(-1, 3, 3)
        uv, h = project_point2mesh(pts, tc2)
        start_w = barycentric_map(uv, h, tw2)
        uv2, h2 = project_point2mesh(pts + nloc, tc2)
        end_w = barycentric_map(uv2, h2, tw2)
        nrm = end_w - start_w
        normal_w = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        color = model.apply(
            params, normal_w, pts, pts, essence, method="lighting")
        return jnp.mean(color ** 2)

    gl = jax.jit(lambda p, e, nl: jax.grad(light_loss, argnums=(0, 1, 2))(
        p, e, nl))
    print(f"lighting+transport fwd+bwd ({N} pts)        : "
          f"{timeit(gl, params, essence0, nloc0, iters=args.iters):8.2f} ms")

    cents_w = face_centroids(geom.verts_world, geom.faces)
    knn = jax.jit(
        lambda p: pruned_search_listed(p, cents_w, geom.tile_table))
    print(f"1x listed KNN ({N} pts)                     : "
          f"{timeit(knn, pts, iters=args.iters):8.2f} ms")
