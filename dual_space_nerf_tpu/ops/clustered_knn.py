"""Cluster-pruned nearest-face search.

The brute-force all-pairs argmin (ops/nearest_face.py) is output-rate bound
on TPU: N x F = 352k x 13776 distances cost ~40-50 ms/search no matter the
precision, because the MXU/VPU must materialize 4.8G values. This module
prunes the candidate set with a two-stage search that is exact in practice
(verified against brute force in tests):

1. Faces are partitioned ONCE per sequence into C spatially-compact,
   perfectly balanced clusters by a k-d median split of their canonical
   centroids (`build_face_clusters`, host-side numpy). The same face
   partition serves both spaces — cluster geometry (centers/radii) is
   recomputed per step from whichever centroid set is being searched, so
   posed-mesh deformation is captured.
2. Per query point: distances to C cluster centers, keep the K clusters with
   the smallest LOWER BOUND max(0, |p - center| - radius)  — any cluster
   that could contain the nearest face ranks by this bound — then exact
   argmin over the K x cap gathered candidates.

Cost: N x C center distances (~2% of brute force) + N x K x cap exact
distances with contiguous row gathers. For SMPL (F=13776, C=256, cap=54,
K=24): ~10% of the brute-force work. Exactness at these defaults is checked
against brute force over near-surface/in-box/far query mixes in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class FaceClusters(NamedTuple):
    """Padded cluster->face table: (C, cap) int32, -1 where padded."""

    table: jnp.ndarray


def _kd_partition(ids: np.ndarray, pts: np.ndarray, n_leaves: int) -> list:
    """Balanced k-d median split: recursively halve along the widest axis
    until n_leaves compact, equal-size (+-1) leaves remain."""
    if n_leaves <= 1 or len(ids) <= 1:
        return [ids]
    p = pts[ids]
    axis = int(np.argmax(p.max(0) - p.min(0)))
    order = ids[np.argsort(p[:, axis], kind="stable")]
    half = len(order) // 2
    left_leaves = n_leaves // 2
    return _kd_partition(order[:half], pts, left_leaves) + _kd_partition(
        order[half:], pts, n_leaves - left_leaves
    )


def build_face_clusters(
    centroids_cano: np.ndarray, n_clusters: int = 256
) -> FaceClusters:
    """Balanced spatial partition of faces from canonical centroids (host).

    A k-d median split gives compact leaves (small radii -> tight pruning
    bounds) with perfectly balanced sizes (+-1), deterministically.
    """
    pts = np.asarray(centroids_cano)
    f = pts.shape[0]
    # keep clusters >= 8 faces: tiny clusters make the K-of-C selection too
    # selective on small meshes without improving pruning
    c = max(1, min(n_clusters, f // 8 if f >= 8 else 1))
    leaves = _kd_partition(np.arange(f), pts, c)
    cap = max(len(l) for l in leaves)
    table = np.full((len(leaves), cap), -1, np.int32)
    for i, leaf in enumerate(leaves):
        table[i, : len(leaf)] = leaf
    return FaceClusters(table=jnp.asarray(table))


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def nearest_face_clustered(
    pts: jnp.ndarray,
    centroids: jnp.ndarray,
    table: jnp.ndarray,
    k: int = 24,
    chunk: int = 32768,
) -> jnp.ndarray:
    """pts (N, 3), centroids (F, 3), table (C, cap) -> (N,) int32."""
    c, cap = table.shape
    k = min(k, c)
    centers, radius, cent_table, valid, safe_table = _cluster_geometry(
        centroids, table
    )

    n = pts.shape[0]
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk - n
    pts_p = jnp.pad(pts, ((0, n_pad), (0, 0))).reshape(n_chunks, chunk, 3)

    def one_chunk(p):  # (chunk, 3)
        d_center = jnp.sqrt(
            jnp.maximum(
                jnp.sum(p * p, -1, keepdims=True)
                - 2.0 * jnp.matmul(p, centers.T,
                                   precision=jax.lax.Precision.HIGHEST)
                + jnp.sum(centers * centers, -1)[None],
                0.0,
            )
        )                                                     # (chunk, C)
        # UNclamped signed bound, like nearest_face_grouped below: a clamp
        # to 0 would tie every cluster whose bounding sphere contains the
        # query, letting top_k rank the true nearest face's cluster out by
        # index order when > K spheres overlap the point.
        lower_bound = d_center - radius[None]
        _, top = jax.lax.top_k(-lower_bound, k)               # (chunk, K)

        def body(j, carry):
            best_d, best_i = carry
            cluster = top[:, j]                               # (chunk,)
            cand_c = cent_table[cluster]                      # (chunk, cap, 3)
            cand_v = valid[cluster]                           # (chunk, cap)
            cand_i = safe_table[cluster]                      # (chunk, cap)
            d2 = jnp.sum((p[:, None] - cand_c) ** 2, -1)      # (chunk, cap)
            d2 = jnp.where(cand_v, d2, jnp.inf)
            jbest = jnp.argmin(d2, -1)
            jdist = jnp.take_along_axis(d2, jbest[:, None], 1)[:, 0]
            jidx = jnp.take_along_axis(cand_i, jbest[:, None], 1)[:, 0]
            take = jdist < best_d
            return (
                jnp.where(take, jdist, best_d),
                jnp.where(take, jidx, best_i),
            )

        init = (jnp.full((p.shape[0],), jnp.inf), jnp.zeros((p.shape[0],), jnp.int32))
        _, best = jax.lax.fori_loop(0, k, body, init)
        return best

    idx = jax.lax.map(one_chunk, pts_p).reshape(-1)
    return idx[:n]


def _cluster_geometry(centroids: jnp.ndarray, table: jnp.ndarray):
    """Per-cluster (centers (C,3), radii (C,), cent_table (C,cap,3),
    valid (C,cap), ids (C,cap)) from the current centroid positions."""
    valid = table >= 0
    safe_table = jnp.maximum(table, 0)
    cent_table = centroids[safe_table]
    w = valid[..., None].astype(centroids.dtype)
    counts = jnp.maximum(valid.sum(-1), 1)[:, None]
    centers = (cent_table * w).sum(1) / counts
    r2 = jnp.sum((cent_table - centers[:, None]) ** 2, -1)
    radius = jnp.sqrt(jnp.max(jnp.where(valid, r2, 0.0), axis=-1))
    return centers, radius, cent_table, valid, safe_table


@functools.partial(jax.jit, static_argnames=("k", "group_chunk"))
def nearest_face_grouped(
    pts: jnp.ndarray,
    centroids: jnp.ndarray,
    table: jnp.ndarray,
    k: int = 32,
    group_chunk: int = 256,
) -> jnp.ndarray:
    """Nearest face for GROUPED points (G, S, 3) -> (G, S) int32.

    The renderer's points come S-samples-per-ray; all samples of a ray are
    spatially coherent, so ONE candidate-cluster set per ray serves all its
    samples. Candidate clusters are the K with the smallest lower bound
    max(0, |m_g - center_c| - radius_c - rho_g) where (m_g, rho_g) is the
    group's bounding sphere — the exact-superset criterion relaxed to top-K
    (exactness vs brute force is covered by tests at the shipped K).

    This turns the N x F all-pairs problem (output-rate bound, ~40 ms at
    352k x 13776) into G x F bounds + N x (K*cap) exact distances: ~15x less
    work for S=64, C=256, K=16.
    """
    g, s, _ = pts.shape
    c, cap = table.shape
    k = min(k, c)
    centers, radius, cent_table, valid, safe_table = _cluster_geometry(
        centroids, table
    )

    # Per-POINT lower bounds |p - center_c| - radius_c, min-aggregated over
    # the group: a cluster that could contain ANY group member's nearest
    # face ranks by its best member bound. Far sharper than a
    # group-bounding-sphere bound, at the cost of an N x C distance pass
    # (~2% of the N x F brute force).
    flat = pts.reshape(g * s, 3)
    d_pc = jnp.sqrt(
        jnp.maximum(
            jnp.sum(flat * flat, -1, keepdims=True)
            - 2.0
            * jnp.matmul(flat, centers.T, precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(centers * centers, -1)[None],
            0.0,
        )
    )                                                        # (G*S, C)
    # UNclamped signed bound keeps the proximity ordering between
    # overlapping clusters (a clamp to 0 would tie them).
    lb = d_pc - radius[None]
    lower_bound = lb.reshape(g, s, c).min(axis=1)            # (G, C)
    _, top = jax.lax.top_k(-lower_bound, k)                  # (G, K)

    n_chunks = -(-g // group_chunk)
    g_pad = n_chunks * group_chunk - g
    pts_p = jnp.pad(pts, ((0, g_pad), (0, 0), (0, 0)))
    top_p = jnp.pad(top, ((0, g_pad), (0, 0)))

    def one_chunk(args):
        p, t = args                                          # (gc,S,3), (gc,K)
        cand_c = cent_table[t].reshape(p.shape[0], k * cap, 3)
        cand_v = valid[t].reshape(p.shape[0], k * cap)
        cand_i = safe_table[t].reshape(p.shape[0], k * cap)
        d2 = jnp.sum(
            (p[:, :, None, :] - cand_c[:, None, :, :]) ** 2, -1
        )                                                    # (gc, S, K*cap)
        d2 = jnp.where(cand_v[:, None, :], d2, jnp.inf)
        best = jnp.argmin(d2, -1)                            # (gc, S)
        return jnp.take_along_axis(cand_i, best, axis=1)     # (gc, S)

    stacked = (
        pts_p.reshape(n_chunks, group_chunk, s, 3),
        top_p.reshape(n_chunks, group_chunk, k),
    )
    idx = jax.lax.map(one_chunk, stacked).reshape(-1, s)
    return idx[:g]
