#!/usr/bin/env python3
"""On-device parity check of the fused SpaceNet kernels (no interpret mode).

CI proves the fused kernels exact in interpret mode on CPU
(tests/test_fused_mlp.py); this script re-runs the forward + full-gradient
comparison with the Mosaic-compiled kernels on the real accelerator, where
lowering bugs would hide. Prints max relative errors; exits nonzero above
tolerance.

Reading the result: the XLA reference is pinned to f32-HIGHEST matmuls, so
a genuine lowering bug shows up as rel ~ O(1) garbage; a UNIFORM ~1e-2
deviation across all outputs would instead mean Mosaic lowers the kernels'
f32 dots through single-pass bf16 — a precision configuration to fix (add
precision=HIGHEST to ops/fused_mlp._dot*), not a kernel bug.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # the XLA reference path must run at f32-exact matmul precision: TPU
    # DEFAULT runs Dense layers through one bf16 pass (~1e-2 deviations),
    # which would fail the 1e-4 gate with no lowering bug present
    jax.config.update("jax_default_matmul_precision", "highest")

    from dual_space_nerf_tpu.models import DualSpaceNeRF
    from dual_space_nerf_tpu.ops import fused_mlp as fm
    from dual_space_nerf_tpu.ops.posenc import posenc

    model = DualSpaceNeRF()
    n = 3000  # ragged vs block=512
    params = model.init(
        jax.random.key(0), jnp.zeros((4, 3)), jnp.zeros((4,), jnp.int32),
        jnp.zeros((4, 16)),
    )
    k = jax.random.split(jax.random.key(1), 6)
    pts = jax.random.normal(k[0], (n, 3)) * 0.5
    code = jax.random.normal(k[1], (8,))
    pose_feat = jax.random.normal(k[2], (16,)) * 0.3
    cs = jnp.asarray(0.7)
    ca = jax.random.normal(k[3], (n,))
    cb = jax.random.normal(k[4], (n, 3))
    cc = jax.random.normal(k[5], (n, 3))

    def ref_fn(params, pts):
        pf = jnp.broadcast_to(pose_feat, (n, 16))

        def se(xc):
            return model.apply(
                params, xc, None, pf, cs, method="sigma_essence", code=code
            )

        (essence, density), pullback = jax.vjp(se, pts)
        normal = pullback((jnp.zeros_like(essence), jnp.ones_like(density)))[0]
        return density[:, 0], essence, normal

    def fused_fn(params, pts):
        w = fm.extract_nerf_weights(params["params"]["nerf"])
        pe = posenc(pts, 10)
        cp = jnp.concatenate(
            [
                jnp.broadcast_to(code * cs, (n, 8)),
                jnp.broadcast_to(pose_feat, (n, 16)),
            ],
            axis=1,
        )
        return fm.fused_sigma_essence_normal(w, pe, cp, block=BLOCK)

    def loss(fn):
        def f(params, pts):
            s, e, nr = fn(params, pts)
            return jnp.sum(ca * s) + jnp.sum(cb * e) + jnp.sum(cc * nr)

        return f

    ok = True
    r0 = jax.jit(ref_fn)(params, pts)
    g0 = jax.jit(jax.grad(loss(ref_fn), (0, 1)))(params, pts)
    # parity-check every block size the battery may pick as the default —
    # a block-size-dependent Mosaic lowering bug must not pass the gate
    for blk in (512, 1024, 2048):
        BLOCK = blk  # module global read by fused_fn at trace time
        r1 = jax.jit(fused_fn)(params, pts)
        for name, a, b in zip(["sigma", "essence", "normal"], r0, r1):
            rel = float(
                jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12)
            )
            print(f"block={blk:4d} {name:8s} maxrel={rel:.3e}")
            ok &= rel < 1e-4
        g1 = jax.jit(jax.grad(loss(fused_fn), (0, 1)))(params, pts)
        worst = 0.0
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            rel = float(
                jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12)
            )
            worst = max(worst, rel)
        print(
            f"block={blk:4d} grads    maxrel={worst:.3e}  "
            f"({len(jax.tree.leaves(g0))} leaves)"
        )
        ok &= worst < 1e-3
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)
