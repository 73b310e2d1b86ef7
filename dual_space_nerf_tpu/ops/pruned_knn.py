"""Tile-pruned nearest-face searches (Pallas), the production TPU KNNs.

Two generations live here; `knn_impl="auto"` on TPU picks the v3
list-driven search (`pruned_search_listed`, bottom of file) when the mesh
bundle carries a kd-leaf tile table, falling back to the v2 unrolled
kernel (`pruned_search_presorted`) otherwise. v2 measured 16-17 ms on the
ZJU-313 training workload; v3 measures ~15 ms isolated (whole-block plans,
v5e sweep 2026-08-19) and several ms less per train step (the plan
overlaps better in-graph).

The brute-force kernel (ops/nearest_face.py) is VPU-bound at ~36 ms for
352k x 13776 on v5e. The v2 variant skips part of that work:

1. Centroids are permuted into spatially-compact contiguous TILES (kd-median
   order, reusing ops/clustered_knn.build_face_clusters), with per-tile
   bounding spheres.
2. Query points arrive in a spatially-coherent order — the renderer's
   block layout groups adjacent rays' consecutive samples (host-side pixel
   sort, renderer/pipeline.py), so no device sort is needed; the
   `nearest_face_pruned` wrapper Morton-sorts arbitrary point sets.
3. Per block, the kernel computes the block's bounding sphere, seeds a
   per-lane running minimum from the closest tile, then visits remaining
   tiles under `pl.when(tile_lower_bound < threshold)` with the threshold
   (worst point's current best) tightened after every visit — for coherent
   blocks most tiles are skipped entirely; see `_pruned_kernel` for why
   the loop is a static unroll over VMEM scratch.

Exactness: the skip criterion is the true sphere-to-sphere lower bound, so
the result equals brute force bit-for-bit (ties aside).

`block_p`/`block_f`/`tighten` are exposed for benchmarking sweeps
(scripts/sweep_knn.py); the module defaults are the production
configuration and all callers in the renderer use them.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block sizes swept on the isolated production workload (scripts/sweep_knn.py,
# v5e, min of 3 interleaved passes, 352k blocked points x 13776 faces):
#   (128,1024)=21.4  (256,1024)=18.1  (512,1024)=18.3  (1024,512)=16.8
#   (1024,256)=18.9  (512,256)=21.8   (2048,256)=19.7  ms
# Large point blocks win despite looser bounding spheres: fewer grid steps
# amortize the per-block prologue (bounding sphere + tile lower bounds +
# seed argmin) and the per-tile branch overhead; 512-wide face tiles then
# claw back pruning granularity. (1024,1024)/(2048,512) exceed the 16 MB
# VMEM scoped allocation (2 x P x F x 4B scratch).
_BLOCK_P = 1024
_BLOCK_F = 512
# tighten the skip threshold after every visited tile (1); 0 = seed-only.
# Values >1 (tighten every k-th loop index) measure strictly worse: the
# reduction is cheaper than the extra tile visits a stale threshold admits.
_TIGHTEN = 1


def _pruned_kernel(
    pts_ref, cent_ref, tile_c_ref, tile_r_ref, idx_ref, best_ref, btile_ref,
    thresh_ref, *, n_tiles, block_f, tighten,
):
    """pts (P,3); cent (3,F_pad) transposed, padded cols at 1e15;
    tile_c (8, T_pad) transposed tile centers (rows 0..2 used);
    tile_r (8, T_pad) tile radii (row 0 used); idx out (P,1);
    best/btile: (P, BF) VMEM scratch.

    DEFERRED-ARGMIN, UNROLLED formulation: the per-LANE running minimum
    across tiles lives in VMEM scratch (one elementwise min + tile-id
    select + one threshold reduction per visited tile), the tile loop is
    unrolled over a static Python range (no lax.cond/fori carries, which
    Mosaic copies every iteration), tile skips are real `pl.when` branches
    on statically-indexed lower bounds with a progressively-tightened SMEM
    threshold, and ONE argmin decode runs at the end. vs the old
    reduction-per-tile + lax.cond formulation: +2.5%% train rays/s on
    block-coherent batches and ~3x faster on incoherent point layouts
    (whole-chord blocks)."""
    pts = pts_ref[:]
    px, py, pz = pts[:, 0:1], pts[:, 1:2], pts[:, 2:3]

    # block bounding sphere
    mx = jnp.mean(px)
    my = jnp.mean(py)
    mz = jnp.mean(pz)
    rho = jnp.sqrt(
        jnp.max((px - mx) ** 2 + (py - my) ** 2 + (pz - mz) ** 2)
    )

    # distance from block center to each tile sphere (lower bound)
    tcx = tile_c_ref[0:1, :]
    tcy = tile_c_ref[1:2, :]
    tcz = tile_c_ref[2:3, :]
    lb = (
        jnp.sqrt((tcx - mx) ** 2 + (tcy - my) ** 2 + (tcz - mz) ** 2)
        - tile_r_ref[0:1, :]
        - rho
    )                                                         # (1, T_pad)

    def tile_d2(t):
        start = t * block_f
        cx = cent_ref[0:1, pl.ds(start, block_f)]
        cy = cent_ref[1:2, pl.ds(start, block_f)]
        cz = cent_ref[2:3, pl.ds(start, block_f)]
        dx = px - cx
        dy = py - cy
        dz = pz - cz
        return dx * dx + dy * dy + dz * dz

    # the CLOSEST tile (dynamic, block_f-aligned slice) seeds the running
    # minimum and the skip threshold, so the threshold is tight immediately
    # (a stale threshold only admits extra tiles — exactness is preserved)
    tile_lane = jax.lax.broadcasted_iota(jnp.int32, lb.shape, 1)
    lb_masked = jnp.where(tile_lane < n_tiles, lb, jnp.inf)
    t0 = jnp.argmin(lb_masked, axis=1)[0]
    d2 = tile_d2(t0)
    best_ref[:] = d2
    btile_ref[:] = jnp.full(d2.shape, t0, jnp.int32)
    # worst point's current best; tightened after every visited tile
    thresh_ref[0] = jnp.sqrt(jnp.max(jnp.min(d2, axis=-1)))

    visit_count = 0
    for t in range(n_tiles):             # static unroll
        visit_count += 1
        do_tighten = tighten > 0 and (visit_count % max(tighten, 1) == 0)

        @pl.when(jnp.logical_and(t != t0, lb[0, t] < thresh_ref[0]))
        def _visit(t=t, do_tighten=do_tighten):
            d2t = tile_d2(t)
            m = d2t < best_ref[:]
            best_ref[:] = jnp.where(m, d2t, best_ref[:])
            btile_ref[:] = jnp.where(m, t, btile_ref[:])
            if do_tighten:
                thresh_ref[0] = jnp.sqrt(
                    jnp.max(jnp.min(best_ref[:], axis=-1))
                )

    # decode: per-point min distance, then the smallest id achieving it
    best = best_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, best.shape, 1)
    pmin = jnp.min(best, axis=-1, keepdims=True)
    gid = btile_ref[:] * block_f + lane
    cand = jnp.where(best <= pmin, gid, jnp.int32(2**30))
    idx_ref[:] = jnp.min(cand, axis=-1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("n_tiles", "interpret", "block_p", "block_f", "tighten"),
)
def _pruned_search_sorted(
    pts_sorted, cent_t, tile_c, tile_r, n_tiles, interpret=False,
    block_p=_BLOCK_P, block_f=_BLOCK_F, tighten=_TIGHTEN,
):
    n_pad = pts_sorted.shape[0]
    idx = pl.pallas_call(
        functools.partial(
            _pruned_kernel, n_tiles=n_tiles, block_f=block_f, tighten=tighten
        ),
        grid=(n_pad // block_p,),
        in_specs=[
            pl.BlockSpec((block_p, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cent_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tile_c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tile_r.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_p, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block_p, block_f), jnp.float32),
            pltpu.VMEM((block_p, block_f), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
        ],
        interpret=interpret,
    )(pts_sorted, cent_t, tile_c, tile_r)
    return idx[:, 0]


def pruned_tables(
    centroids: jnp.ndarray, face_perm: jnp.ndarray, block_f: int = _BLOCK_F
):
    """Precompute the kernel's inputs for one centroid set:
    (cent_t (3, F_pad), tile_c (8, T_pad), tile_r (8, T_pad), n_tiles)."""
    f = centroids.shape[0]
    f_pad = -(-f // block_f) * block_f
    n_tiles = f_pad // block_f

    cent_perm = centroids[face_perm].astype(jnp.float32)
    cent_t = jnp.full((3, f_pad), jnp.float32(1e15))
    cent_t = jax.lax.dynamic_update_slice(cent_t, cent_perm.T, (0, 0))

    pad_f = jnp.full((f_pad - f, 3), 1e15, jnp.float32)
    cent_full = jnp.concatenate([cent_perm, pad_f], axis=0).reshape(
        n_tiles, block_f, 3
    )
    t_valid = jnp.arange(f_pad).reshape(n_tiles, block_f) < f
    w = t_valid[..., None].astype(jnp.float32)
    counts = jnp.maximum(t_valid.sum(-1), 1)[:, None]
    centers = (jnp.where(w > 0, cent_full, 0.0) * w).sum(1) / counts
    r2 = jnp.sum((cent_full - centers[:, None]) ** 2, -1)
    radius = jnp.sqrt(jnp.max(jnp.where(t_valid, r2, 0.0), -1))
    any_valid = t_valid.any(-1)
    centers = jnp.where(any_valid[:, None], centers, 1e15)
    radius = jnp.where(any_valid, radius, 0.0)

    t_pad = -(-n_tiles // 128) * 128
    tile_c = jnp.full((8, t_pad), jnp.float32(1e15))
    tile_c = jax.lax.dynamic_update_slice(tile_c, centers.T, (0, 0))
    tile_r = jnp.zeros((8, t_pad), jnp.float32)
    tile_r = jax.lax.dynamic_update_slice(tile_r, radius[None], (0, 0))
    return cent_t, tile_c, tile_r, n_tiles


def pruned_search_presorted(
    pts_sorted: jnp.ndarray,
    centroids: jnp.ndarray,
    face_perm: jnp.ndarray,
    interpret: bool = False,
    block_p: int = _BLOCK_P,
    block_f: int = _BLOCK_F,
    tighten: int = _TIGHTEN,
) -> jnp.ndarray:
    """Search for ALREADY spatially-sorted points (N, 3) -> (N,) face ids.

    The caller owns the sort/unsort (so one sort can serve several searches
    and the un-permutation can be deferred to the end of a pipeline)."""
    n = pts_sorted.shape[0]
    n_pad = -(-n // block_p) * block_p
    cent_t, tile_c, tile_r, n_tiles = pruned_tables(
        centroids, face_perm, block_f=block_f
    )
    # edge padding keeps the tail block's bounding sphere tight — zero
    # padding would drag its centroid toward the origin and inflate rho,
    # degrading that block's tile pruning toward a full scan
    pts_p = jnp.pad(
        pts_sorted.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
        mode="edge",
    )
    idx_local = _pruned_search_sorted(
        pts_p, cent_t, tile_c, tile_r, n_tiles, interpret=interpret,
        block_p=block_p, block_f=block_f, tighten=tighten,
    )[:n]
    return face_perm[idx_local]


# ---------------------------------------------------------------------------
# v3: list-driven pruned search
# ---------------------------------------------------------------------------
# The unrolled kernel above must iterate every tile and pay a vector branch
# per tile, which forces LARGE face tiles (512) whose bounding spheres barely
# prune on this workload — measured visit rates approach full scan, because
# (a) 512-face ranges of the 54-face-leaf kd order straddle leaf boundaries
# (tile radius 0.26 m vs 0.12 m for true 128-face kd leaves on SMPL), and
# (b) the block bounding sphere (rho 0.2-0.7 m) swamps the point-to-surface
# distances (~0.1 m) in the lower bound.
#
# Here both leave the kernel:
# - Tiles ARE kd leaves: `build_face_clusters(n_clusters=T)` with T a power
#   of two sized so each leaf fits one BF-wide column range (padded slots
#   sit at 1e15 and never win).
# - The visit PLAN is per-point, sub-block-aggregated, built by plain XLA:
#   one MXU pass gives every point's distance to every tile's WITNESS
#   centroid (the member closest to the AABB midpoint); per point,
#   u_p = min_t d(p, w_t) is an EXACT upper bound on the nearest-centroid
#   distance (the witness is itself a centroid — strictly tighter than the
#   midpoint+radius bound by the triangle inequality), and tile t is
#   listed for a sub-block iff ANY of its points has
#   dist(p, aabb_t) <= u_p (kd leaves are boxy, so the AABB lower bound is
#   far tighter than any bounding sphere; measured 53 -> 31 visited tiles
#   per 2048-pt block on the bench workload vs sphere bounds, and 28 -> 14
#   per 256-pt sub-block with witness bounds).
#   Lists are sorted by the sub-block-min lower bound; the kernel walks
#   them from SMEM with a dynamic-trip fori_loop and tightens the true
#   per-sub-block threshold after every visit, so overshoot entries die on
#   one scalar compare. The kernel still supports TWO-LEVEL plans (plan_p <
#   block_p: one plan row per sub-block in the 8-row SMEM slab), but the
#   shipped default is WHOLE-BLOCK planning: although finer plans halve the
#   d2-evaluation work (3.73M vs 7.38M d2/superblock at plan_p 256 vs 2048,
#   scripts/knn_plan_stats.py), the kernel is per-visit/per-sub-block
#   OVERHEAD-bound, not d2-bound (~2 ms of VPU math inside ~15 ms), so
#   fewer, fatter visits win end to end. Full-train-step A/B on v5e
#   (2026-08-19, bench.py): plan_p 256 = 137.9k, 512 = 144.3k,
#   1024 = 148.3k, 2048 = 150.5k rays/s. An oracle simulation (perfect
#   per-point upper bounds; scripts/knn_plan_stats.py --oracle) showed only
#   12.5 -> 10.8 mean visits of headroom, so better bounds cannot buy this
#   back.
_BLOCK_F_LISTED = 128
_BLOCK_P_LISTED = 2048


def _env_override_int(name: str, default: int, must_divide: int) -> int:
    """Validated integer env override (sweep knob). The value must be a
    positive divisor of `must_divide` (the kernel asserts divisibility deep
    inside a jitted wrapper otherwise). Logs when active so a set-but-
    forgotten var cannot silently change production behavior."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        value = int(raw)
    except ValueError:
        raise ValueError(
            f"{name}={raw!r} is not an integer; expected a positive divisor "
            f"of {must_divide} (e.g. 256/512/1024/{must_divide})"
        ) from None
    if value < 1 or must_divide % value:
        raise ValueError(
            f"{name}={value} must be a positive divisor of {must_divide} "
            f"(kernel sub-blocks must evenly split a grid block)"
        )
    import logging

    logging.getLogger(__name__).warning(
        "%s=%d overrides the production default %d", name, value, default
    )
    return value


def _env_override_bool(name: str, default: bool) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    if raw not in ("0", "1"):
        raise ValueError(f"{name}={raw!r} must be '0' or '1'")
    value = raw == "1"
    if value != default:
        import logging

        logging.getLogger(__name__).warning(
            "%s=%s overrides the production default %s", name, raw, default
        )
    return value


# plan/threshold granularity INSIDE a grid block; = block_p means one
# whole-block plan (the measured-fastest default). Env override for sweeps.
_PLAN_P_LISTED = _env_override_int("DSNERF_KNN_PLAN_P", 2048, _BLOCK_P_LISTED)
# in-kernel threshold tightening for the listed kernel. At whole-block
# plans it skips only ~3 of 31 planned visits (the oracle simulation:
# scripts/knn_plan_stats.py --oracle) while its VPU-reduction ->
# SMEM-scalar -> branch dependency chain serializes the visit loop, so the
# default is OFF (visit every planned tile; exact either way -- the plan is
# conservative). Env override for A/Bs.
_TIGHTEN_LISTED = _env_override_bool("DSNERF_KNN_TIGHTEN", False)
# slim (P, 1) running state vs the wide (P, BF) per-lane minima — MEASURED
# NEGATIVE on v5e (2026-08-19, full bench step): gated 150.5k -> 67.2k
# rays/s, exact 81.7k -> 36.2k. The per-visit cross-lane min + tie-lane
# reductions and the (P, 1) stores (1 useful lane of each 128-wide vreg)
# cost far more than the wide kernel's 3x (P, BF) VMEM read-modify-write —
# the VPU is elementwise-cheap and reduction/narrow-store-expensive. Kept
# behind this knob (default OFF) as the recorded A/B.
_SLIM_LISTED = _env_override_bool("DSNERF_KNN_SLIM", False)


def build_face_tiles(centroids, block_f: int = _BLOCK_F_LISTED):
    """kd-leaf tile tables for the listed search (host-side, cache per mesh).

    Returns (T, cap<=block_f) int32 face-id table, -1 padded, T a power of
    two with every leaf <= block_f faces."""
    from .clustered_knn import _kd_partition

    pts = np.asarray(centroids)
    f = pts.shape[0]
    t = 1
    while -(-f // t) > block_f:
        t *= 2
    leaves = _kd_partition(np.arange(f), pts, t)
    table = np.full((len(leaves), block_f), -1, np.int64)
    for i, leaf in enumerate(leaves):
        assert len(leaf) <= block_f, (len(leaf), block_f)
        table[i, : len(leaf)] = leaf
    return jnp.asarray(table, jnp.int32)


def listed_tables(centroids: jnp.ndarray, tile_table: jnp.ndarray):
    """Kernel inputs for one centroid set under a kd-leaf tile table:
    (cent_t (3, T*BF) padded at 1e15,
     tile_c (8, T_pad) — rows 0:3 = member AABB lo, rows 3:6 = AABB hi
     (padded tiles sit at lo=hi=1e15),
     tile_r (8, T_pad) — rows 0:3 = the WITNESS centroid: the member
     closest to the AABB midpoint. d(p, witness) is an exact upper bound
     on p's nearest-centroid distance, strictly tighter than the midpoint
     + closest-member-radius bound it replaces (triangle inequality),
     perm_pad (T*BF,) local-slot -> face id, n_tiles).
    These feed only the XLA visit plan; the kernel reads cent_t alone."""
    t, bf = tile_table.shape
    valid = tile_table >= 0                                     # (T, BF)
    safe = jnp.maximum(tile_table, 0)
    cents = centroids[safe]                                     # (T, BF, 3)
    cents = jnp.where(valid[..., None], cents, 1e15)
    cent_t = cents.reshape(t * bf, 3).T.astype(jnp.float32)     # (3, T*BF)

    big = jnp.float32(1e15)
    lo = jnp.min(jnp.where(valid[..., None], cents, big), 1)    # (T, 3)
    hi = jnp.max(jnp.where(valid[..., None], cents, -big), 1)
    hi = jnp.where(hi <= -big, big, hi)  # all-padded tiles: lo=hi=1e15
    mid = 0.5 * (lo + hi)
    r2 = jnp.sum(
        (jnp.where(valid[..., None], cents, 0.0) - mid[:, None]) ** 2, -1
    )
    w_idx = jnp.argmin(jnp.where(valid, r2, jnp.inf), -1)       # (T,)
    witness = jnp.take_along_axis(
        cents, w_idx[:, None, None], axis=1
    )[:, 0]                                                     # (T, 3)

    t_pad = -(-t // 128) * 128
    tile_c = jnp.full((8, t_pad), big)
    tile_c = jax.lax.dynamic_update_slice(
        tile_c,
        jnp.concatenate([lo.T, hi.T], axis=0).astype(jnp.float32),
        (0, 0),
    )
    tile_r = jnp.full((8, t_pad), big)
    tile_r = jax.lax.dynamic_update_slice(
        tile_r, witness.T.astype(jnp.float32), (0, 0)
    )
    perm_pad = jnp.where(valid, safe, 0).reshape(t * bf).astype(jnp.int32)
    return cent_t, tile_c, tile_r, perm_pad, t


def listed_tables_np(centroids: np.ndarray, tile_table: np.ndarray):
    """Pure-numpy `listed_tables(...)[:4]` for HOST-side one-time builds.

    Bit-identity to the jnp derivation is pinned on the CPU/interpret
    backend (tests/test_pruned_knn.py): every op here is exact IEEE f32
    (min/max/mul/add/compare, 3-element sums, first-occurrence argmin)
    with the same associativity. On a real TPU, XLA's reduce/fusion
    ordering for the jnp sums/min/max is NOT covered by that test, so
    treat the on-device claim as unverified (benign in effect: the tables
    only steer the visit plan of an EXACT search — a mismatched table can
    cost speed, never correctness — and the DSNERF_CANO_TABLES knob that
    consumes this defaults OFF, a measured-negative A/B). Purpose: the
    hoisted canonical tables (data/batching.py) match what the step graph
    would have derived — without paying a jit compile (~60 s cold on the
    remote-compile relay) or ~40 eager op-by-op compiles (~18 s) at
    training start.
    """
    tile_table = np.asarray(tile_table)
    centroids = np.asarray(centroids, np.float32)
    t, bf = tile_table.shape
    valid = tile_table >= 0
    safe = np.maximum(tile_table, 0)
    cents = centroids[safe].astype(np.float32)                  # (T, BF, 3)
    big = np.float32(1e15)
    cents = np.where(valid[..., None], cents, big)
    cent_t = np.ascontiguousarray(cents.reshape(t * bf, 3).T)   # (3, T*BF)

    lo = np.min(np.where(valid[..., None], cents, big), 1)      # (T, 3)
    hi = np.max(np.where(valid[..., None], cents, -big), 1)
    hi = np.where(hi <= -big, big, hi)
    mid = np.float32(0.5) * (lo + hi)
    diff = np.where(valid[..., None], cents, np.float32(0.0)) - mid[:, None]
    d2 = diff * diff
    # 3-element sum with XLA reduce's associativity: (x + y) + z
    r2 = (d2[..., 0] + d2[..., 1]) + d2[..., 2]
    w_idx = np.argmin(np.where(valid, r2, np.inf), -1)          # (T,)
    witness = np.take_along_axis(cents, w_idx[:, None, None], axis=1)[:, 0]

    t_pad = -(-t // 128) * 128
    tile_c = np.full((8, t_pad), big, np.float32)
    tile_c[0:6, :t] = np.concatenate([lo.T, hi.T], axis=0)
    tile_r = np.full((8, t_pad), big, np.float32)
    tile_r[0:3, :t] = witness.T
    perm_pad = np.where(valid, safe, 0).reshape(t * bf).astype(np.int32)
    return cent_t, tile_c, tile_r, perm_pad


def _listed_kernel_slim(
    pts_ref, cent_ref, list_ref, cnt_ref, lbs_ref, idx_ref,
    best_ref, bgid_ref, *, block_f, n_sub, plan_p,
):
    """Slim running state: (P, 1) best distance + best GLOBAL slot id,
    reduced per visit, instead of the wide kernel's (P, BF) running
    minima. Each visit costs two extra cross-lane reductions (min +
    tie-lane pick) but drops the 3x (P, BF) VMEM read-modify-write — the
    wide kernel's visit loop is VMEM-traffic-bound, not d2-bound.

    Tie semantics: within this kernel, the smallest global slot among all
    slots achieving the min distance (masked-lane min within a visit,
    strict-< then min-on-equal across visits). On an exact cross-tile
    distance tie this can differ from the wide kernel, which keeps the
    FIRST-VISITED tile per lane (visit order = the plan's lower-bound
    sort, not slot order) — both return some nearest face, but slim A/Bs
    against the wide default are only tie-break-reproducible, not
    bit-reproducible."""

    def tile_d2(t, px, py, pz):
        start = t * block_f
        cx = cent_ref[0:1, pl.ds(start, block_f)]
        cy = cent_ref[1:2, pl.ds(start, block_f)]
        cz = cent_ref[2:3, pl.ds(start, block_f)]
        dx = px - cx
        dy = py - cy
        dz = pz - cz
        return dx * dx + dy * dy + dz * dz

    lane = jax.lax.broadcasted_iota(jnp.int32, (plan_p, block_f), 1)
    big_gid = jnp.int32(2 ** 30)

    for s in range(n_sub):             # static unroll over sub-blocks
        pts = pts_ref[s * plan_p:(s + 1) * plan_p, :]
        px, py, pz = pts[:, 0:1], pts[:, 1:2], pts[:, 2:3]
        rows = slice(s * plan_p, (s + 1) * plan_p)

        def visit_min(t, px=px, py=py, pz=pz):
            d2t = tile_d2(t, px, py, pz)
            vmin = jnp.min(d2t, axis=-1, keepdims=True)      # (P, 1)
            cand = jnp.where(d2t <= vmin, t * block_f + lane, big_gid)
            vgid = jnp.min(cand, axis=-1, keepdims=True)     # (P, 1)
            return vmin, vgid

        t0 = list_ref[s, 0]
        vmin, vgid = visit_min(t0)
        best_ref[rows, :] = vmin
        bgid_ref[rows, :] = vgid

        def body(i, carry, s=s, rows=rows, visit_min=visit_min):
            vmin, vgid = visit_min(list_ref[s, i])
            old = best_ref[rows, :]
            oldg = bgid_ref[rows, :]
            lt = vmin < old
            eq = vmin == old
            best_ref[rows, :] = jnp.where(lt, vmin, old)
            bgid_ref[rows, :] = jnp.where(
                lt, vgid, jnp.where(eq, jnp.minimum(vgid, oldg), oldg)
            )
            return carry

        jax.lax.fori_loop(1, cnt_ref[s, 0], body, 0)

    idx_ref[:] = bgid_ref[:]


def _listed_kernel(
    pts_ref, cent_ref, list_ref, cnt_ref, lbs_ref, idx_ref,
    best_ref, btile_ref, thresh_ref, *, block_f, n_sub, plan_p, tighten,
):
    """pts (P,3) VMEM; cent (3,F_pad) VMEM; list/cnt/lbs (8,T) SMEM visit
    plans — row s is the plan for the s-th PLAN SUB-BLOCK of plan_p points
    (tile ids sorted by lower bound, visit count, sorted SQUARED lower
    bounds); idx out (P,1); best/btile (P,BF) VMEM scratch; thresh (1,)
    SMEM squared-distance threshold, reused per sub-block.

    Two-level structure: the grid block stays P points (one Pallas
    prologue, one decode); with plan_p < P each plan_p-point sub-block
    walks its OWN visit list under its OWN threshold. Sub-block bounds
    halve the d2-evaluation work (scripts/knn_plan_stats.py), but the
    kernel is per-visit overhead-bound, so the shipped default is
    plan_p = P (whole-block plan, n_sub=1) — see the A/B at
    _PLAN_P_LISTED."""

    def tile_d2(t, px, py, pz):
        start = t * block_f
        cx = cent_ref[0:1, pl.ds(start, block_f)]
        cy = cent_ref[1:2, pl.ds(start, block_f)]
        cz = cent_ref[2:3, pl.ds(start, block_f)]
        dx = px - cx
        dy = py - cy
        dz = pz - cz
        return dx * dx + dy * dy + dz * dz

    for s in range(n_sub):             # static unroll over sub-blocks
        pts = pts_ref[s * plan_p:(s + 1) * plan_p, :]
        px, py, pz = pts[:, 0:1], pts[:, 1:2], pts[:, 2:3]
        rows = slice(s * plan_p, (s + 1) * plan_p)

        # seed: the closest tile (list entry 0). Everything — lbs,
        # threshold — stays in SQUARED distance space (monotonic, so skips
        # are identical and plan + per-visit updates save a sqrt).
        t0 = list_ref[s, 0]
        d2 = tile_d2(t0, px, py, pz)
        best_ref[rows, :] = d2
        btile_ref[rows, :] = jnp.full(d2.shape, t0, jnp.int32)

        if tighten:
            thresh_ref[0] = jnp.max(jnp.min(d2, axis=-1))

            def body(i, carry, s=s, px=px, py=py, pz=pz, rows=rows):
                @pl.when(lbs_ref[s, i] <= thresh_ref[0])
                def _visit():
                    t = list_ref[s, i]
                    d2t = tile_d2(t, px, py, pz)
                    m = d2t < best_ref[rows, :]
                    best_ref[rows, :] = jnp.where(m, d2t, best_ref[rows, :])
                    btile_ref[rows, :] = jnp.where(m, t, btile_ref[rows, :])
                    thresh_ref[0] = jnp.max(
                        jnp.min(best_ref[rows, :], axis=-1))
                return carry
        else:
            # no in-kernel threshold: visit EVERY planned tile. Exact — the
            # XLA plan is conservative (every tile that could hold some
            # point's nearest is listed); at whole-block granularity the
            # threshold skips only ~3 of 31 planned visits (simulated:
            # scripts/knn_plan_stats.py) while its SMEM-scalar dependency
            # chain (VPU reduction -> scalar branch) serializes the loop.
            # Dropping it also drops the per-visit (P, BF) min+max
            # reduction.
            def body(i, carry, s=s, px=px, py=py, pz=pz, rows=rows):
                t = list_ref[s, i]
                d2t = tile_d2(t, px, py, pz)
                m = d2t < best_ref[rows, :]
                best_ref[rows, :] = jnp.where(m, d2t, best_ref[rows, :])
                btile_ref[rows, :] = jnp.where(m, t, btile_ref[rows, :])
                return carry

        jax.lax.fori_loop(1, cnt_ref[s, 0], body, 0)

    # one whole-block decode: per-point min distance, then the smallest
    # global id achieving it (btile rows are already per-sub-block)
    best = best_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, best.shape, 1)
    pmin = jnp.min(best, axis=-1, keepdims=True)
    gid = btile_ref[:] * block_f + lane
    cand = jnp.where(best <= pmin, gid, jnp.int32(2**30))
    idx_ref[:] = jnp.min(cand, axis=-1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tiles", "interpret", "block_p", "block_f", "plan_p", "tighten",
        "slim",
    ),
)
def _listed_search_sorted(
    pts_sorted, cent_t, tile_c, tile_r, n_tiles, interpret=False,
    block_p=_BLOCK_P_LISTED, block_f=_BLOCK_F_LISTED,
    plan_p=_PLAN_P_LISTED, tighten=_TIGHTEN_LISTED, slim=_SLIM_LISTED,
):
    n_pad = pts_sorted.shape[0]
    b = n_pad // block_p
    t_pad = tile_c.shape[1]
    # at most 8 sub-plans fit the 8-row SMEM slab; clamp plan_p into range
    plan_p = min(max(plan_p, block_p // 8), block_p)
    n_sub = block_p // plan_p
    assert block_p % plan_p == 0, (block_p, plan_p)

    # ---- per-point visit plan, block-aggregated (plain XLA) ----
    # One MXU pass gives d(p, w_t) for every point x tile WITNESS centroid
    # (the member closest to the AABB midpoint); per point,
    # u_p = min_t d(p, w_t) is an exact upper bound on the nearest-centroid
    # distance (the witness IS a centroid) — strictly tighter than the
    # d(p, mid_t) + rmin_t bound by the triangle inequality, same cost.
    # Tile t must be visited for a block iff ANY member point has
    # dist(p, aabb_t) <= u_p — the AABB lower bound is exact for the boxy
    # kd leaves where a bounding sphere overshoots by ~the leaf radius.
    lo_t = tile_c[:3].T                                         # (T, 3)
    hi_t = tile_c[3:6].T                                        # (T, 3)
    wit = tile_r[:3].T                                          # (T, 3)
    d_pw2 = jnp.maximum(
        jnp.sum(pts_sorted * pts_sorted, -1, keepdims=True)
        - 2.0 * jnp.matmul(pts_sorted, wit.T,
                           precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(wit * wit, -1)[None],
        0.0,
    )                                                           # (N, T)
    # tiny inflation: the expanded-form d_pw2 can round BELOW the true
    # squared distance (cancellation), and lb2 can round above its true
    # value; without the old +rmin cushion, pad the bound past f32 noise
    # so the tile holding the true nearest is never planned away.
    u_p = jnp.sqrt(jnp.min(d_pw2, axis=1, keepdims=True))       # (N, 1)
    u_p = u_p * jnp.float32(1 + 1e-5) + jnp.float32(1e-6)
    # dist^2(p, AABB_t): summed per dimension to keep the working set
    # (N, T). Lower bounds stay SQUARED throughout — the kernel compares
    # them against a squared threshold, so no sqrt pass over (N, T).
    lb2 = jnp.zeros_like(d_pw2)
    for dim in range(3):
        x = pts_sorted[:, dim:dim + 1]                          # (N, 1)
        ex = (jnp.maximum(lo_t[None, :, dim] - x, 0.0)
              + jnp.maximum(x - hi_t[None, :, dim], 0.0))       # (N, T)
        lb2 = lb2 + ex * ex
    # plan PER SUB-BLOCK: row s of a grid block's 8-row SMEM slab carries
    # the visit list for points [s*plan_p, (s+1)*plan_p) — sub-block
    # aggregation tightens both the any() visit test and the min() sort
    # key vs whole-block plans (~2x fewer d2 evaluations measured,
    # scripts/knn_plan_stats.py)
    hit = (lb2 <= u_p * u_p).reshape(b, n_sub, plan_p, t_pad)
    visit = jnp.any(hit, axis=2)                                # (B, S, T)
    lbs = jnp.min(lb2.reshape(b, n_sub, plan_p, t_pad), axis=2)
    valid = jax.lax.broadcasted_iota(jnp.int32, lbs.shape, 2) < n_tiles
    lbs = jnp.where(valid, lbs, jnp.inf)
    visit = jnp.logical_and(visit, valid)
    key = jnp.where(visit, lbs, jnp.inf)
    order = jnp.argsort(key, axis=2).astype(jnp.int32)          # (B, S, T)
    lbs_sorted = jnp.take_along_axis(key, order, axis=2)
    counts = visit.sum(axis=2, dtype=jnp.int32)                 # (B, S)

    # Mosaic requires SMEM blocks to obey the (8, 128) tiling rule: each
    # grid block's plan is an 8-row slab, rows 0..n_sub-1 = sub-plans
    # (unused rows are never read by the kernel's static loop)
    def slab(x, fill):
        pad = jnp.full((b, 8 - n_sub, x.shape[-1]), fill, x.dtype)
        return jnp.concatenate([x, pad], axis=1).reshape(
            b * 8, x.shape[-1]
        )

    order_s = slab(order, 0)
    lbs_s = slab(lbs_sorted.astype(jnp.float32), jnp.float32(jnp.inf))
    cnt_s = slab(
        jnp.broadcast_to(counts[..., None], (b, n_sub, t_pad)).astype(
            jnp.int32
        ),
        1,
    )

    if slim:
        kernel = functools.partial(
            _listed_kernel_slim, block_f=block_f, n_sub=n_sub, plan_p=plan_p,
        )
        scratch = [
            pltpu.VMEM((block_p, 1), jnp.float32),
            pltpu.VMEM((block_p, 1), jnp.int32),
        ]
    else:
        kernel = functools.partial(
            _listed_kernel, block_f=block_f, n_sub=n_sub, plan_p=plan_p,
            tighten=tighten,
        )
        scratch = [
            pltpu.VMEM((block_p, block_f), jnp.float32),
            pltpu.VMEM((block_p, block_f), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
        ]
    idx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((block_p, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cent_t.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, t_pad), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, t_pad), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, t_pad), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_p, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(pts_sorted, cent_t, order_s, cnt_s, lbs_s)
    return idx[:, 0]


def pruned_search_listed(
    pts_sorted: jnp.ndarray,
    centroids: jnp.ndarray,
    tile_table: jnp.ndarray,
    interpret: bool = False,
    block_p: int = _BLOCK_P_LISTED,
    plan_p: int = _PLAN_P_LISTED,
    tighten: bool = _TIGHTEN_LISTED,
    slim: bool = _SLIM_LISTED,
    return_slots: bool = False,
    tables: tuple | None = None,
) -> jnp.ndarray:
    """List-driven exact nearest-face search for spatially-sorted points.

    Same contract as `pruned_search_presorted`, but candidate tiles are the
    kd leaves of `tile_table` (build_face_tiles) and visits are planned per
    plan_p-point sub-block outside the kernel (see module comment above).

    return_slots=True skips the final slot->face-id translation gather and
    returns TILE-SLOT ids (tile * BF + lane, < tile_table.size). Callers
    that only ever use the result to gather per-face rows can pre-permute
    their tables by `slot_perm_from_tiles(tile_table)` once instead of
    paying a 352k-row gather per search (~2.3 ms/step each on v5e). Ties
    are identical either way: the kernel already breaks distance ties by
    smallest SLOT id.

    tables: optional precomputed `listed_tables(centroids, tile_table)[:4]`
    (the four ARRAYS: cent_t, tile_c, tile_r, perm_pad — n_tiles is always
    re-derived from tile_table.shape so it stays a static Python int). The
    CANONICAL mesh never changes across a run, so its tables are computed
    once per mesh on the host (data/batching.py) instead of being
    re-derived inside every step's graph (~2.3 ms of small-op overhead per
    search isolated). Must be exactly `listed_tables`' output for the same
    (centroids, tile_table) — results are then bit-identical.
    """
    n = pts_sorted.shape[0]
    n_pad = -(-n // block_p) * block_p
    block_f = tile_table.shape[1]
    if tables is None:
        tables = listed_tables(centroids, tile_table)[:4]
    cent_t, tile_c, tile_r, perm_pad = tables
    n_tiles = tile_table.shape[0]
    pts_p = jnp.pad(
        pts_sorted.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
        mode="edge",
    )
    idx_local = _listed_search_sorted(
        pts_p, cent_t, tile_c, tile_r, n_tiles, interpret=interpret,
        block_p=block_p, block_f=block_f, plan_p=plan_p, tighten=tighten,
        slim=slim,
    )[:n]
    if return_slots:
        return idx_local
    return perm_pad[idx_local]


def slot_perm_from_tiles(tile_table: jnp.ndarray) -> jnp.ndarray:
    """(T*BF,) slot -> face-id map matching `return_slots=True` results.

    Identical to listed_tables' perm_pad: padded (-1) slots clamp to face 0
    (they can never be returned — padded centroids sit at 1e15)."""
    return jnp.maximum(tile_table, 0).reshape(-1).astype(jnp.int32)


def morton_order(pts: jnp.ndarray) -> jnp.ndarray:
    return _morton_order(pts)


def _morton_order(pts: jnp.ndarray) -> jnp.ndarray:
    mn = pts.min(0)
    span = jnp.maximum(pts.max(0) - mn, 1e-9)
    q = jnp.clip(((pts - mn) / span * 1023.0), 0, 1023).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x30000FF)
        x = (x | (x << 8)) & jnp.uint32(0x300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x9249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return jnp.argsort(code)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_face_pruned(
    pts: jnp.ndarray,
    centroids: jnp.ndarray,
    face_perm: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """pts (N, 3), centroids (F, 3), face_perm (F,) spatial face order
    (flattened valid entries of build_face_clusters().table) -> (N,) int32.
    """
    n = pts.shape[0]
    order = _morton_order(pts)
    face_ids = pruned_search_presorted(
        pts[order], centroids, face_perm, interpret=interpret
    )
    return jnp.zeros((n,), jnp.int32).at[order].set(face_ids)
