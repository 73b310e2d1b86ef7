#!/usr/bin/env python3
"""On-DEVICE parity evidence: the compiled production kernels on a real TPU.

The CPU test tier proves (a) reference-torch == our-CPU to f32 tolerance
(tests/test_golden_reference.py) and (b) kernel exactness in Pallas
INTERPRET mode. This script closes the remaining link on real hardware:

1. compiled listed-KNN warp == XLA brute-force warp, bitwise, at the full
   production workload (352k points x 13776 faces, SMPL-sized mesh) — the
   real Pallas kernel, not interpret mode;
2. TPU render_rays vs CPU render_rays on bit-identical inputs/params for
   both exact and K=16-gated settings, at HIGHEST matmul precision and
   uniform (deterministic) sampling, with every above-band ray deviation
   attributed to a documented f32 near-tie face flip (cross-backend
   numerics; composes with the CPU golden chain to bound
   TPU-vs-reference). The DEFAULT-precision divergence (bf16 MXU feed) is
   recorded as an informational number.

Writes one JSON line (and bench/r5/tpu_parity.json when run from the repo
root). Requires the TPU backend; refuses to "pass" on CPU.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _render_legs(out_npz: str):
    """Render the deterministic small problem on WHATEVER backend this
    process runs (exact + K=16 legs) and save the outputs. The problem is
    rebuilt from literal seeds, so a JAX_PLATFORMS=cpu subprocess produces
    inputs bit-identical to the TPU parent's."""
    import jax
    import jax.numpy as jnp

    from dual_space_nerf_tpu.cli.common import build_model
    from dual_space_nerf_tpu.config import get_cfg_defaults
    from dual_space_nerf_tpu.data import SyntheticDataset
    from dual_space_nerf_tpu.data.batching import (
        item_to_mesh,
        item_to_train_batch,
    )
    from dual_space_nerf_tpu.renderer import (
        LightState,
        RenderSettings,
        render_rays,
        resolve_mlp_chunk,
    )

    cfg = get_cfg_defaults()
    cfg.MODEL.COARSE_RAY_SAMPLING = 64
    cfg.MODEL.MAX_FRAMES = 16  # matches the committed trained fixture
    model = build_model(cfg)
    nrays = 5500
    small = 1024  # keep the 1-core CPU leg tractable
    ds = SyntheticDataset(
        split="train", nrays=nrays, n_frames=1, n_views=1, h=512, w=512,
    )
    item = ds[0]
    batch = item_to_train_batch(item, nrays)
    geom = item_to_mesh(item, np.asarray(ds.faces), ds.canonical_vertex)
    params = model.init(
        jax.random.key(3),
        jnp.zeros((4, 3)),
        jnp.zeros((4,), jnp.int32),
        jnp.zeros((4, 16)),
    )
    # TRAINED weights (the committed hq-fleet exact checkpoint, 400 epochs
    # at 512^2): a converged density field makes the gated-vs-exact legs
    # genuinely different programs — at random init the density is so flat
    # that top-K selection reproduces exact to ~4e-9 and the gated leg
    # would be vacuous. Falls back to the random init when absent.
    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench", "r5", "abhq_exact_s233_params.npz",
    )
    if os.path.exists(fixture):
        data = np.load(fixture)

        def _restore(path, leaf):
            key = "/".join(str(pp.key) for pp in path)
            arr = jnp.asarray(data[key])
            assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
            return arr

        params = jax.tree_util.tree_map_with_path(_restore, params)
    rays_small = jax.tree.map(
        lambda x: x[:small] if getattr(x, "ndim", 0) and x.shape
        and x.shape[0] == nrays else x,
        batch.rays,
    )
    outs = {}
    # uniform sampling: z is a deterministic linspace of batch near/far,
    # so both backends render bit-identical points (GG would route through
    # the platform-split gg Pallas/XLA kernels and perturb z by ulps)
    from dual_space_nerf_tpu.geometry.sampling import (
        sample_along_rays,
        stratified_z,
    )
    from dual_space_nerf_tpu.ops import face_centroids
    from dual_space_nerf_tpu.ops.nearest_face import nearest_face

    for name, topk, reuse in (("exact", 0, False), ("gated_k16", 16, True)):
        settings = RenderSettings(
            n_samples=64, sample_mode="uniform",
            mlp_chunk=resolve_mlp_chunk(-1, topk),
            shade_topk=topk, reuse_warp_faces=reuse,
        )

        def render(p, r, g):
            return render_rays(
                p, model, r, g, settings, LightState.identity(), None,
                train=False,
            )

        with jax.default_matmul_precision("highest"):
            out = jax.device_get(jax.jit(render)(params, rays_small, geom))
        for k in ("color", "disp_map", "acc_map", "depth_map"):
            outs[f"{name}/highest/{k}"] = np.asarray(out[k])
        if jax.default_backend() != "cpu":
            # informational: the production DEFAULT precision (bf16 MXU
            # feed) — how far the fast path sits from the f32 reference
            out_d = jax.device_get(jax.jit(render)(params, rays_small, geom))
            for k in ("color", "disp_map", "acc_map", "depth_map"):
                outs[f"{name}/default/{k}"] = np.asarray(out_d[k])

    # this backend's nearest-face pick per sample (its auto impl), on the
    # SAME deterministic points — lets the parent attribute cross-backend
    # render deviations to documented f32 near-tie flips
    @jax.jit
    def fid_fn(rays, mesh):
        z = stratified_z(rays.near, rays.far, 64, None)
        pts = sample_along_rays(rays.ray_o, rays.ray_d, z).reshape(-1, 3)
        cents = face_centroids(mesh.verts_world, mesh.faces)
        return nearest_face(
            pts, cents, "auto", tile_table=mesh.tile_table,
            face_perm=mesh.face_perm,
        )

    outs["fid"] = np.asarray(fid_fn(rays_small, geom))

    @jax.jit
    def pts_fn(rays):
        z = stratified_z(rays.near, rays.far, 64, None)
        return sample_along_rays(rays.ray_o, rays.ray_d, z).reshape(-1, 3)

    outs["pts"] = np.asarray(pts_fn(rays_small))
    outs["cents"] = np.asarray(
        jax.jit(face_centroids)(geom.verts_world, geom.faces)
    )
    np.savez(out_npz, **outs)
    return outs


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    backend = jax.default_backend()
    assert backend != "cpu", (
        "tpu_parity_check must run on the TPU backend (got cpu)"
    )

    import jax.numpy as jnp

    from dual_space_nerf_tpu.cli.common import build_model
    from dual_space_nerf_tpu.config import get_cfg_defaults
    from dual_space_nerf_tpu.data import SyntheticDataset
    from dual_space_nerf_tpu.data.batching import (
        item_to_mesh,
        item_to_train_batch,
    )
    from dual_space_nerf_tpu.ops import face_centroids
    from dual_space_nerf_tpu.renderer import (
        LightState,
        RenderSettings,
        render_rays,
        resolve_mlp_chunk,
    )
    from dual_space_nerf_tpu.geometry.sampling import (
        sample_along_rays,
        stratified_z,
    )
    from dual_space_nerf_tpu.renderer.pipeline import warp_world_to_canonical

    cfg = get_cfg_defaults()
    cfg.MODEL.COARSE_RAY_SAMPLING = 64
    model = build_model(cfg)

    nrays = 5500
    ds = SyntheticDataset(
        split="train", nrays=nrays, n_frames=1, n_views=1, h=512, w=512,
    )
    item = ds[0]
    batch = item_to_train_batch(item, nrays)
    geom = item_to_mesh(item, np.asarray(ds.faces), ds.canonical_vertex)

    report = {"backend": backend, "checks": {}}

    # ---- 1. compiled listed-KNN vs HOST float64 ground truth ----
    # Bitwise-vs-on-device-brute is the WRONG oracle here: a first run
    # showed 150/352k near-tie disagreements where float64 ground truth
    # sided with the Pallas kernel 148-2 (the XLA brute path's TPU
    # distance arithmetic misranks d2 gaps ~1e-7 at d2 ~1e-5). So the
    # check is: every kernel pick must be the true f64 argmin, or — at an
    # f32-indistinguishable near-tie — within 1e-6 relative d2 of it.
    from dual_space_nerf_tpu.ops.nearest_face import nearest_face

    @jax.jit
    def pts_fn(rays):
        z = stratified_z(rays.near, rays.far, 64, None)
        return sample_along_rays(rays.ray_o, rays.ray_d, z).reshape(-1, 3)

    pts_dev = pts_fn(batch.rays)
    cents_dev = jax.jit(face_centroids)(geom.verts_world, geom.faces)
    fid = np.asarray(jax.jit(
        lambda p, c: nearest_face(p, c, "listed", tile_table=geom.tile_table)
    )(pts_dev, cents_dev))

    pts64 = np.asarray(pts_dev, np.float64)
    cents64 = np.asarray(cents_dev, np.float64)
    n = pts64.shape[0]
    true_min = np.empty(n)
    true_idx = np.empty(n, np.int64)
    for s0 in range(0, n, 4096):
        sl = slice(s0, min(s0 + 4096, n))
        d2 = ((pts64[sl, None, :] - cents64[None, :, :]) ** 2).sum(-1)
        true_min[sl] = d2.min(1)
        true_idx[sl] = d2.argmin(1)
    picked = ((pts64 - cents64[fid]) ** 2).sum(-1)
    rel_excess = (picked - true_min) / np.maximum(true_min, 1e-30)
    exact_hits = int((fid == true_idx).sum())
    worst = float(rel_excess.max())
    report["checks"]["knn_listed_vs_f64_truth"] = {
        "n_points": n,
        "exact_argmin_hits": exact_hits,
        "near_tie_picks": int(n - exact_hits),
        "worst_relative_d2_excess": worst,
    }
    assert worst < 1e-6, (
        f"compiled listed KNN picked a face {worst:.2e} relative-d2 worse "
        f"than the f64 ground-truth nearest - beyond f32 tie territory"
    )

    # ---- 2. TPU vs CPU render_rays, exact + gated ----
    # The CPU leg runs in a JAX_PLATFORMS=cpu SUBPROCESS (platform-keyed
    # dispatch — the gg Pallas kernel, the listed/auto KNN — reads
    # jax.default_backend(), which jax.default_device() does not change).
    # Both legs rebuild the identical problem from literal seeds.
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        tpu_out = _render_legs(os.path.join(td, "tpu.npz"))
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   DSNERF_PARITY_CPU_LEG=os.path.join(td, "cpu.npz"))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "cpu-leg"],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        assert proc.returncode == 0, (
            f"cpu leg failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}"
        )
        cpu_out = dict(np.load(os.path.join(td, "cpu.npz")))

    fid_tpu = tpu_out["fid"].reshape(-1, 64)
    fid_cpu = cpu_out["fid"].reshape(-1, 64)
    # the two legs must have rendered the same inputs to ulp level (TPU
    # fuses multiply-adds: measured max abs 3.7e-7 on these coordinates —
    # 1-2 f32 ulps; anything larger would invalidate the comparison)
    pts_gap = float(np.abs(tpu_out["pts"] - cpu_out["pts"]).max())
    report["checks"]["cross_backend_input_ulp_gap"] = pts_gap
    assert pts_gap < 1e-6, (
        f"cross-backend sampled points differ by {pts_gap} — beyond ulp "
        "territory, the parity comparison below would be meaningless"
    )
    flips = fid_tpu != fid_cpu
    flipped = flips.any(axis=1)                          # per-ray
    # every flipped sample must be a GENUINE f32 near-tie: evaluated in
    # f64 at the SAME points, both backends' picks must be within an
    # ABSOLUTE d2 gap attributable to the cross-backend ulp noise (points
    # shift <= ~3.8e-7, centroids <= ~1.2e-7, plus f32 d2 rounding).
    # Measured band on this workload: max 1.9e-7 over 53 flips, at d2
    # values 3e-5..1e-2 — a real kernel miss would gap >= 1e-4. (A
    # RELATIVE criterion misfires here: near-surface d2 is small, so an
    # ulp-level gap looks like 1e-3 relative.)
    worst_flip_gap = 0.0
    if flips.any():
        pts64 = tpu_out["pts"].astype(np.float64).reshape(-1, 64, 3)
        cents64 = tpu_out["cents"].astype(np.float64)
        pf = pts64[flips]
        d_t = ((pf - cents64[fid_tpu[flips]]) ** 2).sum(-1)
        d_c = ((pf - cents64[fid_cpu[flips]]) ** 2).sum(-1)
        worst_flip_gap = float(np.abs(d_t - d_c).max())
    report["checks"]["knn_tie_flips"] = {
        "flipped_samples": int(flips.sum()),
        "n_samples": int(flips.size),
        "flipped_rays": int(flipped.sum()),
        "n_rays": int(flipped.shape[0]),
        "worst_abs_d2_gap_between_picks": worst_flip_gap,
    }
    assert worst_flip_gap < 1e-6, (
        f"a cross-backend face disagreement has absolute d2 gap "
        f"{worst_flip_gap:.2e} — a real mismatch, not an f32 near-tie"
    )

    for name in ("exact", "gated_k16"):
        diffs, diffs_flip, diffs_default = {}, {}, {}
        for k in ("color", "disp_map", "acc_map", "depth_map"):
            a = tpu_out[f"{name}/highest/{k}"]
            b = cpu_out[f"{name}/highest/{k}"]
            # rays with zero accumulated weight have NaN disp on BOTH
            # backends (the reference's 1/max(1e-10, depth/acc) semantics,
            # nerf_net_utils.py:30) — the NaN patterns must agree and the
            # finite values are compared
            assert np.array_equal(np.isnan(a), np.isnan(b)), (
                f"{name}/{k}: cross-backend NaN patterns differ"
            )
            a = np.nan_to_num(a)
            b = np.nan_to_num(b)
            d = np.abs(a - b)
            if k == "disp_map":
                # disp = 1/max(1e-10, depth/acc) is ill-conditioned on
                # near-empty rays (acc ~ 1e-7 amplifies ulp noise ~1e7x);
                # compare it only where the ray accumulated real weight —
                # elsewhere its value is numerically meaningless on ANY
                # backend (the reference shares these semantics)
                cond = np.nan_to_num(
                    cpu_out[f"{name}/highest/acc_map"]
                ).reshape(-1) > 1e-3
                d = d * cond.reshape(d.shape[0], *([1] * (d.ndim - 1)))
            d_ray = d.reshape(d.shape[0], -1).max(axis=1)
            diffs[k] = float(d_ray[~flipped].max())
            diffs_flip[k] = float(d_ray[flipped].max()) if flipped.any() else 0.0
            dd = np.abs(
                np.nan_to_num(tpu_out[f"{name}/default/{k}"])
                - np.nan_to_num(cpu_out[f"{name}/highest/{k}"])
            )
            diffs_default[k] = float(dd.max())
        report["checks"][f"render_tpu_vs_cpu_{name}"] = {
            "highest_precision_max_abs_unflipped_rays": diffs,
            "tie_flipped_rays_max_abs": diffs_flip,
            "default_precision_max_abs_info": diffs_default,
        }
        # f32 cross-backend tolerance on rays with identical face picks:
        # reductions reorder between backends; the CPU golden suite pins
        # CPU-vs-torch at 2e-5..3e-4 — hold the TPU leg to the same band.
        # Rays with a documented near-tie face flip legitimately diverge
        # (a different-but-equidistant face is a different warp).
        for k, d in diffs.items():
            assert d < 5e-4, (
                f"{name}/{k}: TPU vs CPU max abs diff {d} on rays with "
                "identical face picks"
            )

    print(json.dumps(report))
    out_path = os.path.join("bench", "r5", "tpu_parity.json")
    if os.path.isdir(os.path.dirname(out_path)):
        with open(out_path, "w", encoding="utf-8") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    if sys.argv[1:] == ["cpu-leg"]:
        # the container's sitecustomize initializes the axon TPU backend at
        # interpreter startup regardless of JAX_PLATFORMS; repoint + clear
        # (the same dance as tests/conftest.py)
        import jax
        import jax.extend.backend

        jax.config.update("jax_platforms", "cpu")
        jax.extend.backend.clear_backends()
        assert jax.default_backend() == "cpu", jax.default_backend()
        _render_legs(os.environ["DSNERF_PARITY_CPU_LEG"])
    else:
        main()
