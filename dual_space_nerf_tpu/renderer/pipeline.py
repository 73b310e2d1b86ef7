"""The jitted dual-space volume-rendering pipeline.

Functional equivalent of the reference's `can_render.py` Renderer (train path
`render()` :137-168, eval path `render_view()`/`batchify_rays_view` :172-278,
warp `w2l`/`w2l_without_lbs` :298-379) plus the model-internal orchestration
of `model/spacenet.py:210-298` (autodiff normals, normal re-mapping,
light-space transforms) — re-designed as one pure function per train/eval
step that XLA compiles end-to-end:

  sample -> GG near/far -> warp(world->canonical) -> SpaceNet (+vjp normal)
  -> normal(canonical->world) -> LightingMLP -> transparent mask -> composite

TPU design choices:
- Static shapes throughout; rays per call is fixed (train nrays / eval chunk).
- Memory is controlled with `lax.map` microbatching over points plus
  `jax.checkpoint` (the reference instead chunks 32768-point Python loops,
  `can_render.py:65-95`). Under remat, the second-order normal graph never
  materializes more than one chunk of activations.
- Surface normals: the reference double-backprops through torch autograd
  (`spacenet.py:301-311`); here one `jax.vjp` pullback per chunk yields
  d(density)/d(xyz_cano) for all points in a single batched backward pass.
- The canonical-space ray direction the reference computes in `w2l`
  (`can_render.py:367-376`) is DEAD COMPUTE: `SpaceNet.use_dir` is hardcoded
  False (`spacenet.py:22`) so it is never consumed. The render path skips
  it; `warp_world_to_canonical(ray_d_w=...)` implements it for callers that
  want canonical-space directions.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import (
    barycentric_map,
    composite,
    gg_near_far,
    project_point2mesh,
    sample_along_rays,
    stratified_z,
    transparent_mask,
)
from ..geometry.sampling import sample_pdf
from ..ops import face_centroids, nearest_face
from ..ops.clustered_knn import nearest_face_grouped
from ..ops.fused_mlp import (
    extract_nerf_weights,
    fused_sigma,
    fused_sigma_essence_normal,
)
from ..ops.posenc import posenc
from ..ops.pruned_knn import (
    pruned_search_listed,
    pruned_search_presorted,
    slot_perm_from_tiles,
)


class MeshBundle(NamedTuple):
    """Per-frame posed mesh + per-sequence canonical mesh.

    faces: (F, 3) int32; verts_world: (V, 3); verts_cano: (V, 3).
    cluster_table: optional (C, cap) int32 balanced face partition
    (ops/clustered_knn.py) enabling the pruned nearest-face search.
    Equivalent of the reference's `canonical_model` + per-batch `xyz`
    (`can_render.py:382-406`).
    """

    faces: jnp.ndarray
    verts_world: jnp.ndarray
    verts_cano: jnp.ndarray
    cluster_table: jnp.ndarray | None = None
    face_perm: jnp.ndarray | None = None  # (F,) kd-spatial face order
    # (T, BF) kd-leaf face tiles for the list-driven search (ops/pruned_knn
    # build_face_tiles); -1 padded. None disables the "listed" impl.
    tile_table: jnp.ndarray | None = None
    # precomputed `listed_tables(centroids_cano, tile_table)[:4]` for the
    # CANONICAL mesh (static across a whole run) — hoists the per-step
    # table derivation out of the graph; see pruned_search_listed(tables=).
    cano_tables: tuple | None = None
    # same for the POSED mesh: static per frame, so the host workers build
    # it once per frame (data/batching.py, numpy) instead of the graph
    # re-deriving it every step.
    world_tables: tuple | None = None


class RayBatch(NamedTuple):
    """One step's rays (train: sampled pixels; eval: one image chunk)."""

    ray_o: jnp.ndarray      # (R, 3)
    ray_d: jnp.ndarray      # (R, 3) un-normalized
    near: jnp.ndarray       # (R,)
    far: jnp.ndarray        # (R,)
    frame: jnp.ndarray      # () int32 frame-embedding index
    body_pose: jnp.ndarray  # (23, 3) joint rotation vectors (poses[1:])


class LightState(NamedTuple):
    """Inference-time lighting manipulation, all traced (identity defaults).

    rot: (2, 2) rotation applied to world xy about rot_center
    (`spacenet.py:254-258`); light_bias: translation
    (light_center - mean(Th), `spacenet.py:260-263`); code_scale: scales the
    frame embedding (0.0 == the reference's `net.nerf.w = 0`).
    """

    rot: jnp.ndarray
    rot_center: jnp.ndarray
    light_bias: jnp.ndarray
    code_scale: jnp.ndarray

    @staticmethod
    def identity(dtype=jnp.float32) -> "LightState":
        return LightState(
            rot=jnp.eye(2, dtype=dtype),
            rot_center=jnp.zeros((3,), dtype),
            light_bias=jnp.zeros((3,), dtype),
            code_scale=jnp.ones((), dtype),
        )


def resolve_mlp_chunk(cfg_value: int, shade_topk: int) -> int:
    """MODEL.MLP_CHUNK policy. <= 0 = auto: 16384 only for LIGHTLY gated
    configs (v5e sweep at SHADE_TOPK=8: 16384 = 51.9, 8192 = 52.8,
    32768 = 56.4 ms/step); 8192 for full shading (exact+remat sweep, v5e
    2026-08-19: 8192 = 64.9, 16384 = 69.5, 32768 = 78.8, unchunked =
    117.5 ms/step) AND for heavier gating (K=16 sweep, v5e 2026-08-20:
    with remat 8192 = 174.9k rays/s, 16384 = 156.9k; without remat
    16384 = 166.7k, 8192 = 165.4k, 32768 = 155.3k — the winning
    remat+8192 combo pipelines at the finer grain like full shading)."""
    if cfg_value and int(cfg_value) > 0:
        return int(cfg_value)
    return 16384 if 0 < shade_topk <= 8 else 8192


def _resolve_remat(cfg_value, shade_topk: int) -> bool:
    """MODEL.REMAT policy. "auto" remats the HEAVY color-graph configs:
    full shading (shade_topk off — its second-order graph over all 352k
    samples is HBM-bound and measures ~5% faster under remat on v5e) and
    K > 8 gating (K=16 sweep, v5e 2026-08-20: remat+8192 = 174.9k rays/s
    vs 166.7k at the r3 no-remat policy, +4.9%). Lightly gated configs
    (0 < K <= 8) pay ~1 ms for remat and stay off (solo A/B,
    2026-08-19)."""
    if isinstance(cfg_value, str):
        v = cfg_value.lower()
        if v == "auto":
            return shade_topk <= 0 or shade_topk > 8
        if v in ("on", "true", "1"):
            return True
        if v in ("off", "false", "0"):
            return False
        raise ValueError(f"MODEL.REMAT={cfg_value!r}: expected auto/on/off")
    return bool(cfg_value)


def _resolve_fused(cfg_value, shade_topk: int) -> bool:
    """MODEL.FUSED_MLP policy. "auto" resolves to OFF everywhere as of r3:
    step-level v5e A/Bs measured the fused kernel pair losing in every
    composed configuration once the XLA paths adopted the face-id dataflow
    (exact train 61.7k vs 81.3k rays/s, eval render 80.0k vs 132.2k —
    bench/r3/bench_runs.jsonl). "on" forces the kernels for A/Bs."""
    if isinstance(cfg_value, str):
        v = cfg_value.lower()
        if v == "auto":
            return False
        if v in ("on", "true", "1"):
            return True
        if v in ("off", "false", "0"):
            return False
        raise ValueError(
            f"MODEL.FUSED_MLP={cfg_value!r}: expected auto/on/off"
        )
    return bool(cfg_value)


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (compile-time) pipeline configuration."""

    n_samples: int = 64
    sample_mode: str = "GG"          # "GG" | "uniform"
    gg_gamma: float = 0.05
    perturb: float = 1.0
    raw_noise_std: float = 1.0
    n_fine: int = 0                  # hierarchical samples (FINE_RAY_SAMPLING)
    mlp_chunk: int = 16384
    knn_impl: str = "auto"
    # Importance-gated shading: density is evaluated at every sample, but the
    # expensive color path (canonical KNN + transport + vjp normal + lighting)
    # runs only on the top-K samples per ray by compositing weight; the
    # remaining samples' colors are exactly the weights' tail (~0). 0 = off
    # (reference-exact shading of all samples).
    shade_topk: int = 0
    # Reuse the world-space warp's face id for the canonical->world normal
    # transport instead of re-running the nearest-face search in canonical
    # space (the reference re-searches, `spacenet.py:278-298`). The warped
    # point lies ON that face's canonical triangle (|h| <= 0.1 after the
    # transparent mask), so the re-search returns the same face for almost
    # every sample; enabling this skips one KNN per step. Approximation —
    # off by default; quality-gated like shade_topk (see README).
    reuse_warp_faces: bool = False
    # Run the SpaceNet density/essence/normal chain as one fused Pallas
    # kernel pair (ops/fused_mlp.py): forward + hand-derived second-order
    # backward, weights + one activation block resident in VMEM. Exact
    # (matches the jax.vjp formulation to f32 roundoff); requires the
    # default architecture (code_dim 8, backbone 256, essence 3, PE L=10)
    # and falls back to the XLA path otherwise.
    fused_mlp: bool = False
    fused_block: int = 512           # points per fused-kernel grid block
    # one-pass bf16 MXU feeds inside the fused kernels — the numerics XLA's
    # DEFAULT precision applies to the f32 Dense layers they replace.
    # Measured perf-NEUTRAL on v5e (108.4k rays/s both ways at the gated
    # bench config): the kernels are bound by HBM streaming + grid overhead,
    # not MXU passes. Off by default — exact f32 dots for free.
    fused_fast: bool = False
    # v5e's 16 GB fits the full second-order graph at SMPL scale; remat
    # costs ~5% step time and is only needed for much larger scenes
    remat: bool = False
    # FULL-shading (shade_topk=0) dataflow: "faceid" exchanges world points
    # + int32 face ids between stages and replays the barycentric transport
    # fused inside each chunk body (the gated path's trick — avoids
    # ~14 ms/step of gather-rooted HBM writes on v5e); "materialized" keeps
    # the reference-structured top-level warp + triangle gathers (the
    # CPU/golden route — XLA:CPU's LLVM pipeline blows up compiling fused
    # gathers inside lax.map at large chunks). "auto" = faceid on TPU.
    full_dataflow: str = "auto"
    # consecutive samples per ray kept adjacent in the block-coherent point
    # layout (the kernel block is then block_p/block_sc adjacent rays x
    # block_sc samples); swept end-to-end on v5e at the ZJU-313 workload
    # (1024-pt kernel blocks, chunk 16384): 4 = 55.1 ms/step, 8 = 52.4,
    # 16 = 51.9, 32 = 51.6, 64 = 52.1
    block_sc: int = 32
    uv_floor: float = -4.0
    uv_ceil: float = 5.0
    max_surface_dist: float = 0.1
    white_bkgd: bool = False

    def __post_init__(self):
        # cfg.MODEL.MLP_CHUNK <= 0 is the "auto" sentinel and must be
        # resolved (resolve_mlp_chunk / from_cfg) BEFORE constructing
        # settings — otherwise it would surface later as a cryptic
        # negative-reshape error inside the jitted pipeline.
        if self.mlp_chunk < 1:
            raise ValueError(
                f"RenderSettings.mlp_chunk={self.mlp_chunk}: pass a "
                "positive chunk, or resolve the config's auto sentinel "
                "with renderer.resolve_mlp_chunk(cfg.MODEL.MLP_CHUNK, "
                "shade_topk)"
            )

    @classmethod
    def from_cfg(cls, cfg) -> "RenderSettings":
        shade_topk = max(getattr(cfg.MODEL, "SHADE_TOPK", 0), 0)
        return cls(
            n_samples=cfg.MODEL.COARSE_RAY_SAMPLING,
            n_fine=max(cfg.MODEL.FINE_RAY_SAMPLING, 0),
            reuse_warp_faces=bool(
                getattr(cfg.MODEL, "REUSE_WARP_FACES", False)
            ),
            sample_mode=cfg.MODEL.sample_points_mode,
            perturb=cfg.MODEL.perturb,
            raw_noise_std=cfg.MODEL.raw_noise_std,
            mlp_chunk=resolve_mlp_chunk(cfg.MODEL.MLP_CHUNK, shade_topk),
            knn_impl=cfg.MODEL.KNN_IMPL,
            remat=_resolve_remat(cfg.MODEL.REMAT, shade_topk),
            shade_topk=shade_topk,
            fused_mlp=_resolve_fused(
                getattr(cfg.MODEL, "FUSED_MLP", "auto"), shade_topk
            ),
            fused_block=int(getattr(cfg.MODEL, "FUSED_BLOCK", 512)),
            fused_fast=bool(getattr(cfg.MODEL, "FUSED_FAST", False)),
        )


def _safe_unit(v: jnp.ndarray) -> jnp.ndarray:
    """Gradient-safe unit vectors: v / sqrt(sum v^2 + 1e-24).

    Numerically identical in f32 to the old `v / maximum(norm(v), 1e-12)`
    for healthy magnitudes (1e-24 sits far below one ulp of any real
    sum-of-squares; at ||v|| << 1e-12 both denominators are ~1e-12), but
    the BACKWARD at v == 0 is 0 instead of NaN. The max-guard formulation
    still evaluates d(norm)/dv = v/||v|| = 0/0 on the dead branch and
    0 * NaN poisons the whole step's gradients — observed in vivo: the r4
    quality probe trained healthily for 162 epochs (PSNR 27.2) and went
    permanently NaN the step a converged empty-space sample's density
    gradient underflowed to exactly zero in f32 (the normal-transport
    input `end_w - start_w` then vanishes).
    """
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-24)


# ---------------------------------------------------------------------------
# Warp: world space -> canonical space
# ---------------------------------------------------------------------------
def warp_world_to_canonical(
    pts_w: jnp.ndarray,
    mesh: MeshBundle,
    centroids_w: jnp.ndarray,
    settings: RenderSettings,
    ray_d_w: jnp.ndarray | None = None,
    fidx: jnp.ndarray | None = None,
    slot_perm: jnp.ndarray | None = None,
):
    """Barycentric-project points onto the posed mesh, rebuild on canonical.

    pts_w: (N, 3). Returns (pts_cano (N, 3), tmask (N,), face_idx (N,),
    ray_d_cano (N, 3) | None). Reference: `can_render.py:333-379`.
    fidx: optional precomputed nearest-face indices (the renderer supplies
    the ray-grouped search's result).
    """
    if fidx is None:
        fidx = nearest_face(
            pts_w, centroids_w, settings.knn_impl, mesh.cluster_table,
            tile_table=mesh.tile_table, face_perm=mesh.face_perm,
        )                                                           # (N,)
    # gather per-face triangle ROWS: the (F, 18) table turns the per-point
    # lookup into a single contiguous row gather instead of six scattered
    # vertex reads
    # slot_perm: set iff fidx carries tile-slot ids (see _faces_table)
    faces_wc = _faces_table(mesh, slot_perm)                        # (F, 18)
    tris_wc = faces_wc[fidx]                                        # (N, 18)
    tris_w = tris_wc[:, :9].reshape(-1, 3, 3)
    tris_c = tris_wc[:, 9:].reshape(-1, 3, 3)

    uv, h = project_point2mesh(pts_w, tris_w)
    tmask = transparent_mask(
        uv, h, settings.uv_floor, settings.uv_ceil, settings.max_surface_dist
    )
    pts_c = barycentric_map(uv, h, tris_c)

    ray_d_c = None
    if ray_d_w is not None:
        uv2, h2 = project_point2mesh(pts_w + ray_d_w, tris_w)
        end_c = barycentric_map(uv2, h2, tris_c)
        d = end_c - pts_c
        ray_d_c = _safe_unit(d)
    return pts_c, tmask, fidx, ray_d_c


def normal_canonical_to_world(
    pts_c: jnp.ndarray,
    normal_local: jnp.ndarray,
    mesh: MeshBundle,
    centroids_c: jnp.ndarray,
    settings: RenderSettings,
) -> jnp.ndarray:
    """Map canonical-space density gradients to world-space unit normals.

    A second nearest-face search in CANONICAL space (the reference re-runs
    KNN against the canonical mesh rather than reusing the warp's face ids,
    `spacenet.py:278-298`), then transports both the point and its offset
    along the gradient through the same triangle on the posed mesh.
    """
    cidx = nearest_face(
        pts_c, centroids_c, settings.knn_impl, mesh.cluster_table,
        tile_table=mesh.tile_table, face_perm=mesh.face_perm,
    )
    tri_vidx = mesh.faces[cidx]
    tris_c = mesh.verts_cano[tri_vidx]
    tris_w = mesh.verts_world[tri_vidx]

    uv, h = project_point2mesh(pts_c, tris_c)
    start_w = barycentric_map(uv, h, tris_w)
    uv2, h2 = project_point2mesh(pts_c + normal_local, tris_c)
    end_w = barycentric_map(uv2, h2, tris_w)

    n = end_w - start_w
    return _safe_unit(n)


def _faces_table(mesh: MeshBundle, slot_perm=None) -> jnp.ndarray:
    """(F, 18) rows of [world tri (9) | canonical tri (9)] per face.

    One contiguous row gather per point serves both triangle spaces.
    slot_perm: optional (T*BF,) tile-slot -> face-id map — the returned
    table is then SLOT-ordered, matching the listed searches'
    `return_slots=True` ids; the one small (T*BF, 18) permute here replaces
    a 352k-row translation gather per search (~2.3 ms/step on v5e)."""
    table = jnp.concatenate(
        [
            mesh.verts_world[mesh.faces].reshape(-1, 9),
            mesh.verts_cano[mesh.faces].reshape(-1, 9),
        ],
        axis=-1,
    )
    if slot_perm is not None:
        table = table[slot_perm]
    return table


def _warp_chunk(pts_w, fidx, faces_wc, settings: RenderSettings):
    """Fused gather + barycentric transport for one chunk of points.

    Returns (pts_c, tmask, tris_w, tris_c). MUST run inside a lax.map chunk
    body (or another fused consumer): XLA emits gather-rooted HBM writes at
    ~0.6 GB/s (a materialized (352k, 18) row gather costs ~44 ms on v5e),
    but the same gather fused into elementwise consumers is ~free. The
    renderer therefore passes int32 face ids between stages and replays
    this cheap transport math wherever canonical coordinates are needed.
    """
    tris_wc = faces_wc[fidx]                                    # (n, 18)
    tris_w = tris_wc[:, :9].reshape(-1, 3, 3)
    tris_c = tris_wc[:, 9:].reshape(-1, 3, 3)
    uv, h = project_point2mesh(pts_w, tris_w)
    tmask = transparent_mask(
        uv, h, settings.uv_floor, settings.uv_ceil, settings.max_surface_dist
    )
    pts_c = barycentric_map(uv, h, tris_c)
    return pts_c, tmask, tris_w, tris_c


# ---------------------------------------------------------------------------
# Per-point network evaluation (chunked, rematerialized)
# ---------------------------------------------------------------------------
def _use_fused(settings: RenderSettings, model, code) -> bool:
    """The fused Pallas MLP serves exactly the default architecture."""
    return (
        settings.fused_mlp
        and code.dtype != jnp.int32
        and getattr(model, "code_dim", 0) == 8
        and getattr(model, "backbone_dim", 0) == 256
        and getattr(model, "essence_dim", 0) == 3
    )


def _point_network(
    params,
    model,
    pts_w,          # (n, 3) world points (light transforms already applied)
    pts_c,          # (n, 3) canonical points
    dir_w,          # (n, 3) world view dirs
    code,           # (code_dim,) precomputed frame code (or (n,) frame ids)
    pose_feat,      # (n, 16)
    code_scale,     # ()
    tris_c2,        # (n, 3, 3) canonical tris nearest to pts_c (precomputed)
    tris_w2,        # (n, 3, 3) the same faces on the posed mesh
    settings: RenderSettings,
):
    """color (n, 3), sigma (n,) for one chunk of points.

    The nearest-face searches are NOT here: they are parameter-independent
    (pure functions of the batch + mesh) and are hoisted out of the
    differentiated/rematerialized region by the caller, so the backward pass
    and remat never recompute a KNN.
    """
    is_code = code.dtype != jnp.int32

    if _use_fused(settings, model, code):
        n = pts_c.shape[0]
        weights = extract_nerf_weights(params["params"]["nerf"])
        pe = posenc(pts_c.astype(jnp.float32), 10)
        cp = jnp.concatenate(
            [
                jnp.broadcast_to(code * code_scale, (n, 8)),
                pose_feat.astype(jnp.float32),
            ],
            axis=1,
        )
        sigma, essence, normal_local = fused_sigma_essence_normal(
            weights, pe, cp, block=settings.fused_block,
            interpret=jax.default_backend() != "tpu",
            fast=settings.fused_fast,
        )
        density = sigma[:, None]
    else:
        def sigma_essence(xc):
            essence, density = model.apply(
                params,
                xc,
                None if is_code else code,
                pose_feat,
                code_scale,
                method="sigma_essence",
                code=code if is_code else None,
            )
            return essence, density

        (essence, density), pullback = jax.vjp(sigma_essence, pts_c)
        # d(sum sigma)/d(xyz_cano): cotangent 1 on density, 0 on essence —
        # one batched backward pass == torch grad with grad_outputs=ones
        # (reference `spacenet.py:301-311`).
        normal_local = pullback(
            (jnp.zeros_like(essence), jnp.ones_like(density))
        )[0]

    # canonical -> world normal transport on the precomputed face pairing
    uv, h = project_point2mesh(pts_c, tris_c2)
    start_w = barycentric_map(uv, h, tris_w2)
    uv2, h2 = project_point2mesh(pts_c + normal_local, tris_c2)
    end_w = barycentric_map(uv2, h2, tris_w2)
    # _safe_unit, NOT max(norm, eps): this normalize sits under the
    # SECOND-ORDER vjp, and a converged field's empty-space samples hit
    # nrm == 0 exactly (see _safe_unit) — one such sample NaNs the step
    normal_w = _safe_unit(end_w - start_w)

    color = model.apply(
        params, normal_w, pts_w, dir_w, essence, method="lighting"
    )
    return color, density[..., 0]


def _chunked_points(fn, n_points: int, chunk: int, args: tuple):
    """Run fn over point-chunks with lax.map; pads N up to a chunk multiple.

    args are pytrees whose leaves have leading dim n_points.
    """
    n_chunks = -(-n_points // chunk)
    n_pad = n_chunks * chunk - n_points
    if n_chunks == 1:
        # single chunk: skip the scan entirely (no stacking, no carry)
        out = fn(jax.tree.map(
            lambda x: jnp.pad(
                x, [(0, n_pad)] + [(0, 0)] * (x.ndim - 1), mode="edge"
            ) if n_pad else x,
            args,
        ))
        return jax.tree.map(lambda x: x[:n_points], out)

    def pad(x):
        if n_pad == 0:
            return x
        widths = [(0, n_pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, mode="edge")

    stacked = jax.tree.map(
        lambda x: pad(x).reshape(n_chunks, chunk, *x.shape[1:]), args
    )
    # DSNERF_CHUNK_UNROLL > 1: run the chunk loop as lax.scan(unroll=k) so
    # XLA sees k chunk bodies per iteration and can software-pipeline the
    # staging copies of chunk i+1 under chunk i's compute (double
    # buffering). A/B knob for the exact path's chunked-network-loop
    # overhead (bench/r4/NOTES.md); default 1 == the plain lax.map.
    unroll = int(os.environ.get("DSNERF_CHUNK_UNROLL", "1"))
    if unroll > 1:
        logging.getLogger(__name__).info(
            "DSNERF_CHUNK_UNROLL=%d: chunk loop via lax.scan(unroll)", unroll
        )
        _, out = jax.lax.scan(
            lambda carry, x: (carry, fn(x)), (), stacked, unroll=unroll
        )
    else:
        out = jax.lax.map(fn, stacked)
    return jax.tree.map(
        lambda x: x.reshape(n_chunks * chunk, *x.shape[2:])[:n_points], out
    )


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------
def render_rays(
    params,
    model,
    batch: RayBatch,
    mesh: MeshBundle,
    settings: RenderSettings,
    light: LightState,
    rng: jax.Array | None,
    train: bool,
) -> dict[str, jnp.ndarray]:
    """Render a batch of rays. Everything in here jit-compiles as one graph.

    Returns dict with color (R,3), disp/acc/depth (R,), weights/z_vals (R,S).
    """
    r = batch.ray_o.shape[0]
    s = settings.n_samples

    rng_z = rng_noise = None
    if train and rng is not None:
        rng_z, rng_noise = jax.random.split(rng)

    near, far = batch.near, batch.far
    if settings.sample_mode == "GG":
        if jax.default_backend() == "tpu":
            from ..ops.gg_pallas import gg_near_far_pallas

            near, far = gg_near_far_pallas(
                batch.ray_o, batch.ray_d, near, far, mesh.verts_world,
                gamma=settings.gg_gamma,
            )
        else:
            near, far = gg_near_far(
                batch.ray_o, batch.ray_d, near, far, mesh.verts_world,
                settings.gg_gamma,
            )

    z_vals = stratified_z(
        near, far, s, rng_z if (train and settings.perturb > 0) else None
    )
    out = _render_with_z(
        params, model, batch, mesh, settings, light, rng_noise, train, z_vals
    )

    # Hierarchical (fine) pass — the reference's FINE_RAY_SAMPLING knob.
    # (Its own fine path calls an undefined `self.resampling`,
    # `can_render.py:213`; this is the working equivalent.)
    if settings.n_fine > 0:
        rng_fine = None
        if train and rng is not None:
            rng_fine = jax.random.fold_in(rng, 1)
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_fine = sample_pdf(
            mids, out["weights"][..., 1:-1], settings.n_fine, rng_fine
        )
        z_all = jnp.sort(
            jnp.concatenate([z_vals, jax.lax.stop_gradient(z_fine)], -1), -1
        )
        fine = _render_with_z(
            params, model, batch, mesh, settings, light, rng_noise, train,
            z_all,
        )
        out.update({f"fine_{k}": v for k, v in fine.items()})
    return out


def _render_with_z(
    params,
    model,
    batch: RayBatch,
    mesh: MeshBundle,
    settings: RenderSettings,
    light: LightState,
    rng_noise,
    train: bool,
    z_vals: jnp.ndarray,
) -> dict[str, jnp.ndarray]:
    """warp + networks + composite for given per-ray z values (R, S)."""
    r, s = z_vals.shape
    pts_w = sample_along_rays(batch.ray_o, batch.ray_d, z_vals)  # (R, S, 3)

    n = r * s
    pts_w_flat = pts_w.reshape(n, 3)
    dir_w_flat = jnp.broadcast_to(batch.ray_d[:, None, :], (r, s, 3)).reshape(n, 3)

    centroids_w = face_centroids(mesh.verts_world, mesh.faces)
    centroids_c = face_centroids(mesh.verts_cano, mesh.faces)

    # ---- parameter-independent stage: the nearest-face searches ----
    # Nothing here depends on params, so it sits outside the loss gradient
    # and outside remat: each KNN runs exactly once per step. The
    # barycentric warp itself is NOT hoisted: stages exchange int32 face
    # ids and the cheap transport math replays fused inside each chunk
    # body (_warp_chunk) — materializing gather-rooted warp outputs costs
    # ~14 ms/step on v5e.
    #
    # On TPU with a spatial face order available, the whole per-point stage
    # runs in BLOCK-COHERENT point order: one layout serves both tile-pruned
    # searches (coherent blocks skip most centroid tiles) and the network
    # itself is order-agnostic, so the inverse permutation is applied only
    # to the final per-point (color, sigma).
    # "auto" picks the list-driven Pallas search only on real TPUs (falling
    # back to the unrolled tile-pruned kernel when no tile table is built);
    # explicitly requesting "listed"/"pruned" uses them anywhere (interpret
    # mode off-TPU) so CI exercises the production kernels inside the
    # sharded train jit
    on_tpu = jax.default_backend() == "tpu"
    use_listed = mesh.tile_table is not None and (
        settings.knn_impl == "listed"
        or (settings.knn_impl == "auto" and on_tpu)
    )
    use_pruned = not use_listed and mesh.face_perm is not None and (
        settings.knn_impl == "pruned"
        or (settings.knn_impl == "auto" and on_tpu)
    )
    pruned_interp = not on_tpu
    # SLOT-space face ids: the listed searches return tile-slot ids
    # (return_slots) and every per-face table is pre-permuted ONCE into
    # slot order (_faces_table), dropping the per-search slot->face
    # translation gather (~2.3 ms each at 352k points on v5e). Ids stay
    # internally consistent across the world search, the canonical search,
    # and reuse_warp_faces; nothing outside this function sees them.
    slot_perm = slot_perm_from_tiles(mesh.tile_table) if use_listed else None
    use_grouped = (
        settings.knn_impl == "grouped" and mesh.cluster_table is not None
    )
    # sub-groups of consecutive samples share one candidate set; 4 keeps the
    # group tight enough that near-surface results match brute force exactly
    # (see tests/test_clustered_knn.py)
    gsz = s
    for cand in (4, 2, 1):
        if s % cand == 0:
            gsz = cand
            break

    # Block-coherent point layout WITHOUT a device sort: reorder to
    # (sample-chunk, ray, sample-within) so each kernel block sees ~64
    # adjacent rays x 8 consecutive samples — spatially tight when the host
    # sorts the sampled pixels (data/batching.py does; eval chunks are
    # scanline-ordered already). A transpose costs <1 ms vs ~28 ms for a
    # Morton argsort + scatter at this N.
    assert settings.block_sc >= 1, (
        f"block_sc must be a positive power of two, got {settings.block_sc}"
    )
    sc = settings.block_sc
    while s % sc:
        sc //= 2
    n_sc = s // sc

    def to_blocked(x):  # (R, S, ...) -> (N, ...)
        y = x.reshape(r, n_sc, sc, *x.shape[2:])
        y = jnp.swapaxes(y, 0, 1)
        return y.reshape(n, *x.shape[2:])

    def from_blocked(x):  # (N, ...) -> flat (N, ...) in original order
        y = x.reshape(n_sc, r, sc, *x.shape[1:])
        y = jnp.swapaxes(y, 0, 1)
        return y.reshape(n, *x.shape[1:])

    blocked = False
    if use_listed or use_pruned:
        blocked = True
        pts_w_flat = to_blocked(pts_w)
        dir_w_flat = to_blocked(
            jnp.broadcast_to(batch.ray_d[:, None, :], (r, s, 3))
        )
        if use_listed:
            fidx_w = pruned_search_listed(
                pts_w_flat, centroids_w, mesh.tile_table,
                interpret=pruned_interp, return_slots=True,
                tables=mesh.world_tables,
            )
        else:
            fidx_w = pruned_search_presorted(
                pts_w_flat, centroids_w, mesh.face_perm,
                interpret=pruned_interp,
            )
    elif use_grouped:
        fidx_w = nearest_face_grouped(
            pts_w.reshape(n // gsz, gsz, 3), centroids_w, mesh.cluster_table
        ).reshape(n)
    else:
        fidx_w = nearest_face(
            pts_w_flat, centroids_w, settings.knn_impl, mesh.cluster_table
        )

    pose_feat = model.apply(
        params, batch.body_pose, method="pose_feature"
    )  # (16,)
    # one embedding lookup per step; its gradient is a reduction over the
    # broadcast instead of an n-row scatter into the embedding table
    if getattr(model, "code_dim", 0) > 0:
        code = model.apply(params, jnp.asarray(batch.frame), method="frame_code")
    else:
        code = jnp.full((n,), batch.frame, jnp.int32)

    if 0 < settings.shade_topk < s:
        return _gated_shading(
            params, model, batch, mesh, settings, light, rng_noise, train,
            z_vals, pts_w, pts_w_flat, fidx_w, centroids_c, code,
            pose_feat, from_blocked if blocked else None,
            slot_perm=slot_perm,
        )

    if _use_fused(settings, model, code):
        # Reference-EXACT shading of every sample, on the gated path's
        # face-id dataflow: the fused kernel never materializes backbone
        # activations, so the whole warp -> posenc -> network -> transport
        # -> lighting chain runs as ONE top-level XLA expression (no
        # lax.map) with every face-row gather fused into its elementwise
        # consumers. Forced-ON A/B path only (FUSED_MLP "auto" resolves OFF
        # everywhere — the kernel pair lost every composed r3 A/B, see
        # defaults.py); production full shading is the XLA face-id
        # dataflow below. Kept exactness-pinned for kernel regression
        # coverage (tests/test_fused_mlp.py).
        return _full_shading_fused(
            params, model, batch, mesh, settings, light, rng_noise, train,
            z_vals, pts_w_flat, dir_w_flat, fidx_w, centroids_c, code,
            pose_feat, from_blocked if blocked else None,
            slot_perm=slot_perm,
        )

    # FULL-shading path. Two dataflows behind identical per-point math:
    #
    # - TPU: the gated path's FACE-ID dataflow — stages exchange world
    #   points + int32 face ids, and each chunk body replays the cheap
    #   barycentric transport (_warp_chunk) + gathers its own triangle rows,
    #   where XLA fuses them into elementwise consumers. Materializing the
    #   (N, 18) triangle rows at top level instead costs ~14 ms/step of
    #   gather-rooted HBM writes on v5e (measured round 2; re-measured for
    #   the exact config in round 3: 69.6 -> ~57 ms/step). Only the (N, 3)
    #   warped points materialize — the canonical KNN needs them as input.
    #
    # - CPU: warp + triangle gathers materialize at the top level, exactly
    #   like the reference's structure. The fused-gather-inside-lax.map
    #   graph makes XLA:CPU's LLVM pipeline blow up at large chunk sizes
    #   (minutes-long compiles), so the CPU/golden-test route keeps the
    #   materialized dataflow.
    faces_wc2 = _faces_table(mesh, slot_perm)
    use_faceid = settings.full_dataflow == "faceid" or (
        settings.full_dataflow == "auto" and on_tpu
    )

    if use_faceid:
        # The (N, 3) canonical points exist ONLY as the canonical KNN's
        # input (skipped entirely under reuse_warp_faces), and they
        # materialize chunk-by-chunk from inside lax.map — the per-chunk
        # output is a sequential dynamic-update-slice with the face-row
        # gather fused inside the body, never a top-level gather-rooted
        # HBM write.
        pts_c_flat = None
        if not settings.reuse_warp_faces:
            pts_c_flat = _chunked_points(
                lambda a: _warp_chunk(a[0], a[1], faces_wc2, settings)[0],
                n, min(settings.mlp_chunk, n), (pts_w_flat, fidx_w),
            )
        tmask_flat = None  # recomputed fused inside every chunk body
    else:
        pts_c_flat, tmask_flat, _, _ = warp_world_to_canonical(
            pts_w_flat, mesh, centroids_w, settings, fidx=fidx_w,
            slot_perm=slot_perm,
        )

    if settings.reuse_warp_faces:
        cidx = fidx_w
    elif use_listed:
        # warped points inherit the world sort's block coherence
        cidx = pruned_search_listed(
            pts_c_flat, centroids_c, mesh.tile_table,
            interpret=pruned_interp, return_slots=True,
            tables=mesh.cano_tables,
        )
    elif use_pruned:
        cidx = pruned_search_presorted(
            pts_c_flat, centroids_c, mesh.face_perm,
            interpret=pruned_interp,
        )
    elif use_grouped:
        cidx = nearest_face_grouped(
            pts_c_flat.reshape(n // gsz, gsz, 3), centroids_c,
            mesh.cluster_table,
        ).reshape(n)
    else:
        cidx = nearest_face(
            pts_c_flat, centroids_c, settings.knn_impl, mesh.cluster_table
        )

    # ---- parameter-dependent stage: the networks (chunked + remat) ----
    if use_faceid:
        def chunk_fn(chunk_args):
            pw, dw, fi, ci = chunk_args
            # replay the warp from face ids (elementwise after a fused
            # gather — bit-identical to the materialized pts_c)
            pc, tmask, _, _ = _warp_chunk(pw, fi, faces_wc2, settings)
            tris_wc2 = faces_wc2[ci]                         # fused gather
            tw2 = tris_wc2[:, :9].reshape(-1, 3, 3)
            tc2 = tris_wc2[:, 9:].reshape(-1, 3, 3)
            xy = (pw[:, :2] - light.rot_center[:2]) @ light.rot \
                + light.rot_center[:2]
            pw_light = jnp.concatenate(
                [xy, pw[:, 2:]], axis=-1
            ) + light.light_bias
            pf = jnp.broadcast_to(pose_feat, (pw.shape[0], pose_feat.shape[-1]))
            color, sigma = _point_network(
                params, model, pw_light, pc, dw, code, pf, light.code_scale,
                tc2, tw2, settings,
            )
            sigma = jnp.where(tmask, 0.0, sigma)
            return color, sigma

        chunk_args = (pts_w_flat, dir_w_flat, fidx_w, cidx)
    else:
        tris_wc2 = faces_wc2[cidx]                                  # (N, 18)
        tris_w2_flat = tris_wc2[:, :9].reshape(-1, 3, 3)
        tris_c2_flat = tris_wc2[:, 9:].reshape(-1, 3, 3)

        def chunk_fn(chunk_args):
            pw, dw, pc, tmask, tc2, tw2 = chunk_args
            # Inference-time light-space manipulation of the *world* coords
            # seen by the LightingMLP (`spacenet.py:254-263`).
            xy = (pw[:, :2] - light.rot_center[:2]) @ light.rot \
                + light.rot_center[:2]
            pw_light = jnp.concatenate(
                [xy, pw[:, 2:]], axis=-1
            ) + light.light_bias
            pf = jnp.broadcast_to(pose_feat, (pw.shape[0], pose_feat.shape[-1]))
            color, sigma = _point_network(
                params, model, pw_light, pc, dw, code, pf, light.code_scale,
                tc2, tw2, settings,
            )
            sigma = jnp.where(tmask, 0.0, sigma)
            return color, sigma

        chunk_args = (pts_w_flat, dir_w_flat, pts_c_flat, tmask_flat,
                      tris_c2_flat, tris_w2_flat)

    if settings.remat:
        chunk_fn = jax.checkpoint(chunk_fn)

    color_flat, sigma_flat = _chunked_points(
        chunk_fn, n, min(settings.mlp_chunk, n), chunk_args,
    )

    if blocked:
        # undo the block layout on the only per-point outputs that survive
        color_flat = from_blocked(color_flat)
        sigma_flat = from_blocked(sigma_flat)

    color = color_flat.reshape(r, s, 3)
    sigma = sigma_flat.reshape(r, s)

    out = composite(
        color,
        sigma,
        z_vals,
        batch.ray_d,
        noise_std=settings.raw_noise_std if train else 0.0,
        rng=rng_noise,
        white_bkgd=settings.white_bkgd,
    )
    return {
        "color": out.rgb,
        "disp_map": out.disp,
        "acc_map": out.acc,
        "depth_map": out.depth,
        "weights": out.weights,
        "z_vals": z_vals,
    }


def _gated_shading(
    params,
    model,
    batch: RayBatch,
    mesh: MeshBundle,
    settings: RenderSettings,
    light: LightState,
    rng_noise,
    train: bool,
    z_vals: jnp.ndarray,      # (R, S)
    pts_w: jnp.ndarray,       # (R, S, 3) world samples
    pts_w_flat: jnp.ndarray,  # (N, 3) world points (possibly blocked order)
    fidx_flat: jnp.ndarray,   # (N,) nearest world-face ids (same order)
    centroids_c: jnp.ndarray,
    code,
    pose_feat: jnp.ndarray,   # (16,)
    from_blocked,             # None, or the blocked->original reorder fn
    slot_perm: jnp.ndarray | None = None,  # set iff fidx_flat is slot ids
) -> dict[str, jnp.ndarray]:
    """Importance-gated shading: density everywhere, color on top-K samples.

    Exactness: per-ray rgb = sum_i w_i c_i; samples outside the top-K by
    weight contribute at most their (near-zero) weight times a bounded
    color, so with K covering the weight mass the output matches full
    shading to the weights' tail. Density (hence weights, acc, depth, the
    mask loss, and all sigma gradients) is computed at EVERY sample —
    gating only skips dead color work (canonical KNN + barycentric
    transport + vjp normal + LightingMLP on ~75% of samples).

    Dataflow: stages exchange only world points + int32 face ids; the
    barycentric transport (_warp_chunk) is replayed inside each chunk body
    where its face-row gather fuses for free, instead of materializing
    (N, 3)/(N, 18) gather-rooted tensors to HBM (~14 ms/step on v5e).
    """
    r, s = z_vals.shape
    n = r * s
    k = settings.shade_topk
    is_code = code.dtype != jnp.int32
    faces_wc = _faces_table(mesh, slot_perm)

    # ---- density-only pass over ALL samples (warp fused into the chunk) ----
    if _use_fused(settings, model, code):
        # The fused kernel never materializes backbone activations, so the
        # lax.map microbatching (a memory measure) is unnecessary: the whole
        # warp -> posenc -> pack chain fuses into ONE XLA expression rooted
        # at the kernel's (N, 128) input (the face-row gather fuses into its
        # elementwise consumers — no gather-rooted HBM writes), the weights
        # are packed once per step, and there are no chunk-boundary bubbles.
        pc, tmask_f, _, _ = _warp_chunk(
            pts_w_flat, fidx_flat, faces_wc, settings
        )
        weights = extract_nerf_weights(params["params"]["nerf"])
        pe = posenc(pc.astype(jnp.float32), 10)
        cp = jnp.concatenate(
            [
                jnp.broadcast_to(code * light.code_scale, (n, 8)),
                jnp.broadcast_to(
                    pose_feat, (n, pose_feat.shape[-1])
                ).astype(jnp.float32),
            ],
            axis=1,
        )
        density = fused_sigma(
            weights, pe, cp, block=settings.fused_block,
            interpret=jax.default_backend() != "tpu",
            fast=settings.fused_fast,
        )
        sigma_flat = jnp.where(tmask_f, 0.0, density)
    else:
        def dens_chunk(chunk_args):
            pw, fi = chunk_args
            pc, tmask, _, _ = _warp_chunk(pw, fi, faces_wc, settings)
            _, density = model.apply(
                params,
                pc,
                None if is_code else code[: pc.shape[0]],
                jnp.broadcast_to(pose_feat, (pc.shape[0], pose_feat.shape[-1])),
                light.code_scale,
                True,
                method="sigma_essence",
                code=code if is_code else None,
            )
            return jnp.where(tmask, 0.0, density[..., 0])

        if settings.remat:
            dens_chunk = jax.checkpoint(dens_chunk)
        sigma_flat = _chunked_points(
            dens_chunk, n, min(settings.mlp_chunk, n), (pts_w_flat, fidx_flat)
        )
    if from_blocked is not None:
        sigma_flat = from_blocked(sigma_flat)
        fidx_flat = from_blocked(fidx_flat)
    sigma = sigma_flat.reshape(r, s)

    # ---- select the K samples per ray that carry the weight mass ----
    # selection must see the SAME noisy weights the final composite applies
    # (same rng): with noise-free selection, the training noise (std 1.0)
    # randomly promotes unselected samples to meaningful weights each step
    # and their approximated colors bias the renders (~1.3 dB of converged
    # PSNR on the synthetic S=64/K=16 A/B)
    w_sel = composite(
        jnp.zeros((r, s, 3), sigma.dtype), sigma, z_vals, batch.ray_d,
        noise_std=settings.raw_noise_std if train else 0.0, rng=rng_noise,
    ).weights
    w_sel = jax.lax.stop_gradient(w_sel)
    _, top_idx = jax.lax.top_k(w_sel, k)                      # (R, K)

    # selection rides the MXU as a one-hot batched matmul instead of a flat
    # 352k-row gather: exact (a single nonzero term per output row; zeros
    # add exactly), and the in-step gather fusion this replaces traced at
    # ~4.6 ms/step vs ~0.6 ms for the einsum pair (v5e, 2026-08-19). The
    # face ids go through f32 exactly (13776 < 2^24) under HIGHEST.
    oh_sel = jax.nn.one_hot(top_idx, s, dtype=jnp.float32)    # (R, K, S)
    pw_sel = jnp.einsum(
        "rks,rsc->rkc", oh_sel, pts_w,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(r * k, 3)
    fi_sel = jnp.einsum(
        "rks,rs->rk", oh_sel, fidx_flat.reshape(r, s).astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32).reshape(r * k)
    dw_sel = jnp.broadcast_to(
        batch.ray_d[:, None, :], (r, k, 3)
    ).reshape(r * k, 3)
    # (Gathering pw/dw/fi inside the color chunk bodies instead —
    # the face-table trick applied to ray data — measures 4 ms/step SLOWER
    # than materialized selection: the index-driven gathers from
    # full arrays inside lax.map defeat XLA's chunk pipelining.)

    # canonical coordinates of the selected points, recomputed from the
    # face ids (identical per-point math to the density pass — elementwise,
    # so bit-equal); this small (R*K, 3) tensor is the canonical search's
    # input and the only materialized warp output in the gated path
    pc_sel, _, _, _ = _warp_chunk(pw_sel, fi_sel, faces_wc, settings)

    # ---- canonical-space nearest face, selected points only ----
    on_tpu = jax.default_backend() == "tpu"
    if settings.reuse_warp_faces:
        cidx = fi_sel
    elif mesh.tile_table is not None and (
        settings.knn_impl == "listed"
        or (settings.knn_impl == "auto" and on_tpu)
    ):
        # ray-major selected points are surface-concentrated and locally
        # coherent; the listed search uses them as presorted blocks
        cidx = pruned_search_listed(
            pc_sel, centroids_c, mesh.tile_table, interpret=not on_tpu,
            return_slots=slot_perm is not None,
            tables=mesh.cano_tables,
        )
    elif mesh.face_perm is not None and (
        settings.knn_impl == "pruned"
        or (settings.knn_impl == "auto" and on_tpu)
    ):
        cidx = pruned_search_presorted(
            pc_sel, centroids_c, mesh.face_perm, interpret=not on_tpu
        )
    elif settings.knn_impl == "grouped" and mesh.cluster_table is not None:
        # groups of 1: the selected samples arrive in WEIGHT order, so
        # consecutive entries can straddle surfaces several cm apart (a ray
        # grazing two body parts) — the grouped search's shared-candidate
        # assumption only holds for spatially adjacent members
        cidx = nearest_face_grouped(
            pc_sel.reshape(-1, 1, 3), centroids_c, mesh.cluster_table
        ).reshape(r * k)
    else:
        cidx = nearest_face(
            pc_sel, centroids_c, settings.knn_impl, mesh.cluster_table
        )

    # ---- full color path on the selected samples (chunked) ----
    def chunk_fn(chunk_args):
        pw, dw, fi, ci = chunk_args
        pc, _, _, _ = _warp_chunk(pw, fi, faces_wc, settings)
        tris_wc2 = faces_wc[ci]                                 # fused gather
        tw2 = tris_wc2[:, :9].reshape(-1, 3, 3)
        tc2 = tris_wc2[:, 9:].reshape(-1, 3, 3)
        xy = (pw[:, :2] - light.rot_center[:2]) @ light.rot + light.rot_center[:2]
        pw_light = jnp.concatenate([xy, pw[:, 2:]], axis=-1) + light.light_bias
        pf = jnp.broadcast_to(pose_feat, (pw.shape[0], pose_feat.shape[-1]))
        color, _ = _point_network(
            params, model, pw_light, pc, dw, code, pf, light.code_scale,
            tc2, tw2, settings,
        )
        return color

    if settings.remat:
        chunk_fn = jax.checkpoint(chunk_fn)
    # under the fused kernel the big activations never leave VMEM, so the
    # (R*K)-point color pass runs as one call: weights pack once, and the
    # face-row gathers still fuse into their elementwise consumers
    color_chunk = (
        r * k if _use_fused(settings, model, code)
        else min(settings.mlp_chunk, r * k)
    )
    color_sel = _chunked_points(
        chunk_fn, r * k, color_chunk, (pw_sel, dw_sel, fi_sel, cidx),
    )

    # tail completion: every unselected sample takes the color of the
    # NEAREST selected sample on its ray (colors vary smoothly along a ray,
    # so the weight tail contributes ~its true color instead of black —
    # without this, early-training diffuse weights bias renders dark and
    # cost ~2 dB of converged PSNR, measured on the synthetic A/B)
    color_k = color_sel.reshape(r, k, 3)
    samples = jnp.arange(s)[None, :, None]                    # (1, S, 1)
    dist_k = jnp.abs(samples - top_idx[:, None, :])           # (R, S, K)
    nearest = jnp.argmin(dist_k, axis=-1)                     # (R, S)
    # one-hot matmul instead of take_along_axis: exact (single nonzero
    # term), rides the MXU, and its transpose (d/d color_k) is another
    # einsum rather than a scatter-add
    oh_near = jax.nn.one_hot(nearest, k, dtype=jnp.float32)   # (R, S, K)
    color = jnp.einsum(
        "rsk,rkc->rsc", oh_near, color_k,
        precision=jax.lax.Precision.HIGHEST,
    )

    out = composite(
        color,
        sigma,
        z_vals,
        batch.ray_d,
        noise_std=settings.raw_noise_std if train else 0.0,
        rng=rng_noise,
        white_bkgd=settings.white_bkgd,
    )
    return {
        "color": out.rgb,
        "disp_map": out.disp,
        "acc_map": out.acc,
        "depth_map": out.depth,
        "weights": out.weights,
        "z_vals": z_vals,
    }


def _search_canonical(
    pc: jnp.ndarray,
    centroids_c: jnp.ndarray,
    mesh: MeshBundle,
    settings: RenderSettings,
    group: int = 1,
    return_slots: bool = False,
) -> jnp.ndarray:
    """Canonical-space nearest-face search with the settings' impl choice.

    pc must be spatially coherent for the listed/pruned kernels (warped
    points inherit the world layout's block coherence). group: sub-group
    size for the "grouped" impl (spatially adjacent members only).
    """
    on_tpu = jax.default_backend() == "tpu"
    if mesh.tile_table is not None and (
        settings.knn_impl == "listed"
        or (settings.knn_impl == "auto" and on_tpu)
    ):
        return pruned_search_listed(
            pc, centroids_c, mesh.tile_table, interpret=not on_tpu,
            return_slots=return_slots, tables=mesh.cano_tables,
        )
    if mesh.face_perm is not None and (
        settings.knn_impl == "pruned"
        or (settings.knn_impl == "auto" and on_tpu)
    ):
        return pruned_search_presorted(
            pc, centroids_c, mesh.face_perm, interpret=not on_tpu
        )
    if settings.knn_impl == "grouped" and mesh.cluster_table is not None:
        n = pc.shape[0]
        return nearest_face_grouped(
            pc.reshape(n // group, group, 3), centroids_c, mesh.cluster_table
        ).reshape(n)
    return nearest_face(
        pc, centroids_c, settings.knn_impl, mesh.cluster_table
    )


def _full_shading_fused(
    params,
    model,
    batch: RayBatch,
    mesh: MeshBundle,
    settings: RenderSettings,
    light: LightState,
    rng_noise,
    train: bool,
    z_vals: jnp.ndarray,      # (R, S)
    pts_w_flat: jnp.ndarray,  # (N, 3) world points (possibly blocked order)
    dir_w_flat: jnp.ndarray,  # (N, 3) world view dirs (same order)
    fidx_flat: jnp.ndarray,   # (N,) nearest world-face ids (same order)
    centroids_c: jnp.ndarray,
    code,
    pose_feat: jnp.ndarray,   # (16,)
    from_blocked,             # None, or the blocked->original reorder fn
    slot_perm: jnp.ndarray | None = None,  # set iff fidx_flat is slot ids
) -> dict[str, jnp.ndarray]:
    """Reference-exact full shading via the fused SpaceNet kernels.

    Semantics match the reference exactly (`can_render.py:97-134`,
    `model/spacenet.py:210-298`): density, essence, vjp normal, and
    lighting are evaluated at EVERY sample; the canonical nearest-face
    search re-runs on the warped points (unless reuse_warp_faces).

    Dataflow matches _gated_shading, not the materialized full path: the
    fused kernel pair (ops/fused_mlp.py) keeps all (N, 256) backbone
    activations in VMEM, so nothing here needs lax.map microbatching —
    the transport/lighting tensors that remain are (N, small) and their
    face-row gathers fuse into elementwise consumers.

    Forced-ON (FUSED_MLP "on") A/B path, not production: once the XLA
    paths adopted the same face-id dataflow, the fused pair measured
    SLOWER in every composed v5e config (exact train 61.7k vs 81.3k
    rays/s, bench/r3) — "auto" resolves OFF and the XLA face-id full
    path below is what ships. Kept exactness-pinned (test_fused_mlp.py).
    """
    r, s = z_vals.shape
    n = r * s
    faces_wc = _faces_table(mesh, slot_perm)

    # warp: only (N, 3) canonical points + (N,) mask materialize
    pc_flat, tmask_flat, _, _ = _warp_chunk(
        pts_w_flat, fidx_flat, faces_wc, settings
    )

    # canonical re-search (the reference's, `spacenet.py:278-298`)
    if settings.reuse_warp_faces:
        cidx = fidx_flat
    else:
        cidx = _search_canonical(
            pc_flat, centroids_c, mesh, settings,
            return_slots=slot_perm is not None,
        )

    # fused density + essence + d(sigma)/d(pos) over ALL samples
    weights = extract_nerf_weights(params["params"]["nerf"])
    pe = posenc(pc_flat.astype(jnp.float32), 10)
    cp = jnp.concatenate(
        [
            jnp.broadcast_to(code * light.code_scale, (n, 8)),
            jnp.broadcast_to(
                pose_feat, (n, pose_feat.shape[-1])
            ).astype(jnp.float32),
        ],
        axis=1,
    )
    sigma_flat, essence, normal_local = fused_sigma_essence_normal(
        weights, pe, cp, block=settings.fused_block,
        interpret=jax.default_backend() != "tpu",
        fast=settings.fused_fast,
    )
    sigma_flat = jnp.where(tmask_flat, 0.0, sigma_flat)

    # canonical -> world normal transport (gathers fuse into the transport)
    tris_wc2 = faces_wc[cidx]                                   # (N, 18)
    tw2 = tris_wc2[:, :9].reshape(-1, 3, 3)
    tc2 = tris_wc2[:, 9:].reshape(-1, 3, 3)
    uv, h = project_point2mesh(pc_flat, tc2)
    start_w = barycentric_map(uv, h, tw2)
    uv2, h2 = project_point2mesh(pc_flat + normal_local, tc2)
    end_w = barycentric_map(uv2, h2, tw2)
    normal_w = _safe_unit(end_w - start_w)   # grad-safe at nrm == 0

    # light-space manipulation + LightingMLP (`spacenet.py:254-265`)
    xy = (
        pts_w_flat[:, :2] - light.rot_center[:2]
    ) @ light.rot + light.rot_center[:2]
    pw_light = jnp.concatenate(
        [xy, pts_w_flat[:, 2:]], axis=-1
    ) + light.light_bias
    color_flat = model.apply(
        params, normal_w, pw_light, dir_w_flat, essence, method="lighting"
    )

    if from_blocked is not None:
        color_flat = from_blocked(color_flat)
        sigma_flat = from_blocked(sigma_flat)
    color = color_flat.reshape(r, s, 3)
    sigma = sigma_flat.reshape(r, s)

    out = composite(
        color,
        sigma,
        z_vals,
        batch.ray_d,
        noise_std=settings.raw_noise_std if train else 0.0,
        rng=rng_noise,
        white_bkgd=settings.white_bkgd,
    )
    return {
        "color": out.rgb,
        "disp_map": out.disp,
        "acc_map": out.acc,
        "depth_map": out.depth,
        "weights": out.weights,
        "z_vals": z_vals,
    }


def density_grid(
    params,
    model,
    pts_c: jnp.ndarray,
    frame: jnp.ndarray,
    body_pose: jnp.ndarray,
    settings: RenderSettings,
    code_scale: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Density-only query of canonical points (marching-cubes / dev path).

    Equivalent of `can_render.py:280-296` (`query_volume`) with
    `density_only=True`. pts_c: (N, 3) -> (N,).
    """
    pose_feat = model.apply(params, body_pose, method="pose_feature")

    def chunk_fn(chunk_args):
        (pc,) = chunk_args
        n = pc.shape[0]
        _, density = model.apply(
            params,
            pc,
            jnp.full((n,), frame, jnp.int32),
            jnp.broadcast_to(pose_feat, (n, pose_feat.shape[-1])),
            jnp.asarray(code_scale, pc.dtype),
            True,
            method="sigma_essence",
        )
        return density[..., 0]

    return _chunked_points(
        chunk_fn, pts_c.shape[0], min(settings.mlp_chunk, pts_c.shape[0]), (pts_c,)
    )
