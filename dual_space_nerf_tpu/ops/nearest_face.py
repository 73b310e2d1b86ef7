"""Nearest-face (K=1 KNN over triangle centroids) — TPU-native.

This replaces the single native-code dependency of the reference: pytorch3d's
CUDA ``knn_points``/``knn_gather`` used in `utils/render_utils.py:84-99`
(`get_closest_mesh`). There, every sample point finds the nearest of 13,776
SMPL face centroids; the 3x3 triangle vertices are then gathered.

Design (TPU-first, not a translation):
- The centroid set is tiny (13776 x 3 = 165 KB) and fits in VMEM whole, so
  the problem is a dense (N x F) distance argmin — MXU/VPU-friendly,
  nothing like a CUDA scatter KNN.
- ``nearest_face_xla``: squared distances via one matmul
  (|p|^2 - 2 p.c + |c|^2) and an argmin. XLA tiles and fuses this fine; it is
  the CPU-test and fallback path.
- ``nearest_face_pallas``: Pallas kernel; grid over point blocks, centroids
  resident in VMEM, fori_loop over centroid tiles with a running
  (min-dist, argmin) pair. Avoids materializing the (N x F) matrix in HBM.

Both share the numerics convention dist^2 = |p|^2 - 2 p.c + |c|^2 in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes bound VMEM: the live set per grid step is the (P, F-tile)
# distance matrix + an equally-shaped iota + carries, x compiler double
# buffering. (512, 1024) keeps the scoped allocation well under the 16 MB
# VMEM budget with headroom for the pipelined point blocks.
_BLOCK_P = 512    # points per grid step
_BLOCK_F = 1024   # centroid tile inside the kernel


def face_centroids(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Triangle centroids: verts (V, 3), faces (F, 3) int -> (F, 3).

    Reference: `render_utils.py:94` (meshes.mean(dim=-2)).
    """
    return verts[faces].mean(axis=-2)


# --------------------------------------------------------------------------
# XLA reference/fallback implementation
# --------------------------------------------------------------------------
def nearest_face_xla(pts: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Argmin_f ||pts - centroids_f||^2. pts (N, 3), centroids (F, 3) -> (N,) int32."""
    p2 = jnp.sum(pts * pts, axis=-1, keepdims=True)              # (N, 1)
    c2 = jnp.sum(centroids * centroids, axis=-1)[None, :]        # (1, F)
    # HIGHEST: default TPU matmul precision is bf16-ish, which mis-ranks
    # near-ties by ~1e-2 — far above the warp's tolerance.
    cross = jnp.matmul(
        pts, centroids.T, precision=jax.lax.Precision.HIGHEST
    )                                                            # (N, F) MXU
    d2 = p2 - 2.0 * cross + c2
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------
def _nearest_kernel(pts_ref, cent_norm_ref, idx_ref, *, n_f_tiles):
    """One grid step: BLOCK_P points vs all centroid tiles.

    pts_ref:       (BLOCK_P, 3)   VMEM
    cent_norm_ref: (3, F_pad)     VMEM transposed centroids, resident across
                                  grid steps; padded columns = 1e15 so they
                                  never win the argmin
    idx_ref:       (BLOCK_P, 1)   VMEM int32 output
    """
    pts = pts_ref[:]                                            # (P, 3)
    # per-coordinate columns, kept 2-D for the VPU
    px = pts[:, 0:1]
    py = pts[:, 1:2]
    pz = pts[:, 2:3]

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (pts.shape[0], _BLOCK_F), 1)

    def body(t, carry):
        best_d, best_i = carry
        start = t * _BLOCK_F
        # centroids transposed to (3, BF) so each coordinate is a full
        # lane-aligned row; d^2 via VPU broadcast (exact f32) instead of a
        # K=3 MXU dot, which is output-rate bound (~40ms for 4.8G outputs)
        cx = cent_norm_ref[0:1, pl.ds(start, _BLOCK_F)]         # (1, BF)
        cy = cent_norm_ref[1:2, pl.ds(start, _BLOCK_F)]
        cz = cent_norm_ref[2:3, pl.ds(start, _BLOCK_F)]
        dx = px - cx
        dy = py - cy
        dz = pz - cz
        d2 = dx * dx + dy * dy + dz * dz                        # (P, BF)
        tile_min = jnp.min(d2, axis=-1, keepdims=True)          # (P, 1)
        # first-match argmin via iota-select (robust on Mosaic)
        cand = jnp.where(d2 <= tile_min, lane_ids, _BLOCK_F)
        tile_arg = jnp.min(cand, axis=-1, keepdims=True) + start
        take = tile_min < best_d
        return jnp.where(take, tile_min, best_d), jnp.where(take, tile_arg, best_i)

    init = (
        jnp.full((pts.shape[0], 1), jnp.inf, jnp.float32),
        jnp.zeros((pts.shape[0], 1), jnp.int32),
    )
    _, best_i = jax.lax.fori_loop(0, n_f_tiles, body, init)
    idx_ref[:] = best_i


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_face_pallas(
    pts: jnp.ndarray, centroids: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Pallas nearest-centroid argmin. pts (N, 3), centroids (F, 3) -> (N,) int32."""
    n = pts.shape[0]
    f = centroids.shape[0]
    n_pad = -(-n // _BLOCK_P) * _BLOCK_P
    f_pad = -(-f // _BLOCK_F) * _BLOCK_F

    pts_p = jnp.pad(pts.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    # (3, F_pad) transposed layout: each coordinate is one lane-aligned row;
    # padded centroids sit at 1e15 so they never win the argmin
    cent_t = jnp.full((3, f_pad), jnp.float32(1e15))
    cent_t = jax.lax.dynamic_update_slice(
        cent_t, centroids.astype(jnp.float32).T, (0, 0)
    )

    n_f_tiles = f_pad // _BLOCK_F
    grid = (n_pad // _BLOCK_P,)

    idx = pl.pallas_call(
        functools.partial(_nearest_kernel, n_f_tiles=n_f_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_P, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_P, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
    )(pts_p, cent_t)
    return idx[:n, 0]


# --------------------------------------------------------------------------
# Dispatch
# --------------------------------------------------------------------------
_KNN_IMPLS = ("auto", "listed", "pruned", "grouped", "clustered", "pallas", "xla")


def nearest_face(
    pts: jnp.ndarray,
    centroids: jnp.ndarray,
    impl: str = "auto",
    cluster_table: jnp.ndarray | None = None,
    *,
    tile_table=None,
    face_perm: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Nearest-centroid index per point.

    impl: auto | listed | pruned | grouped | clustered | pallas | xla.
    Unknown strings raise instead of silently running the 10-30x slower
    XLA brute force. "listed"/"pruned" need their precomputed plans
    (MeshBundle.tile_table / .face_perm); without them — and for "auto"
    off-TPU — this falls back to the brute-force kernels ("auto" on TPU
    picks the fastest exact search the supplied tables allow).
    """
    if impl not in _KNN_IMPLS:
        raise ValueError(
            f"unknown knn_impl {impl!r}; expected one of {_KNN_IMPLS}"
        )
    from .clustered_knn import nearest_face_clustered, nearest_face_grouped
    from .pruned_knn import pruned_search_listed, pruned_search_presorted

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    if tile_table is not None and (
        impl == "listed" or (impl == "auto" and on_tpu)
    ):
        return pruned_search_listed(pts, centroids, tile_table, interpret=interp)
    if face_perm is not None and (
        impl == "pruned" or (impl == "auto" and on_tpu)
    ):
        return pruned_search_presorted(pts, centroids, face_perm, interpret=interp)
    if impl == "grouped" and cluster_table is not None:
        return nearest_face_grouped(
            pts.reshape(-1, 1, 3), centroids, cluster_table
        ).reshape(-1)
    if impl == "clustered":
        assert cluster_table is not None, "clustered impl needs a cluster table"
        return nearest_face_clustered(pts, centroids, cluster_table)
    if impl == "pallas" or (impl != "xla" and on_tpu):
        return nearest_face_pallas(pts, centroids)
    return nearest_face_xla(pts, centroids)
