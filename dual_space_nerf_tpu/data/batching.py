"""Host item dict -> fixed-shape device batches.

The device side is compiled for a single static ray count, so host items
shorter than `nrays` are padded by WRAPPING (repeating rays from the start
of the batch). Wrapped rays are real rays drawn by the same sampler, so the
mean loss stays a mean over genuine supervision; ZJU/H36M items always
arrive at exactly `nrays` (`sample_rays` asserts it), so this path only
fires for ad-hoc callers.

Eval images are rendered in fixed-size chunks: `iter_ray_chunks` pads the
tail chunk by repeating its last ray and the caller slices the valid
prefix.
"""

from __future__ import annotations

from typing import Iterator

import jax.numpy as jnp
import numpy as np

from ..renderer import MeshBundle, RayBatch
from ..training import TrainBatch


def _wrap_pad(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    reps = -(-n // x.shape[0])
    return np.concatenate([x] * reps, axis=0)[:n]


def _spatial_ray_order(item: dict) -> np.ndarray:
    """Sort sampled rays by pixel locality (row-major 16x16 tile order).

    The renderer's tile-pruned nearest-face search blocks consecutive rays
    together; spatially-sorted rays make those blocks tight. Host-side and
    O(R log R) on 5500 rays — free."""
    coord = np.asarray(item["coord"])
    # tile-row stride derived from the actual image width: a fixed 4096
    # would alias pixel columns >= 4096 into later tile-row bands on wide
    # images, quietly breaking the locality the KNN kernels block on
    n_tile_cols = int(coord[:, 1].max()) // 16 + 1
    key = (coord[:, 0] // 16) * (n_tile_cols * 16) + (
        coord[:, 1] // 16
    ) * 16 + (coord[:, 0] % 16)
    return np.argsort(key, kind="stable")


def item_to_train_batch(item: dict, nrays: int) -> TrainBatch:
    if "coord" in item and len(item["coord"]) == len(item["ray_o"]):
        order = _spatial_ray_order(item)
        item = dict(item)
        for k in ("ray_o", "ray_d", "near", "far", "rgb", "occupancy", "coord"):
            if k in item:
                item[k] = np.asarray(item[k])[order]
    rays = RayBatch(
        ray_o=jnp.asarray(_wrap_pad(item["ray_o"], nrays), jnp.float32),
        ray_d=jnp.asarray(_wrap_pad(item["ray_d"], nrays), jnp.float32),
        near=jnp.asarray(_wrap_pad(item["near"], nrays), jnp.float32),
        far=jnp.asarray(_wrap_pad(item["far"], nrays), jnp.float32),
        frame=jnp.asarray(int(item["frame"]), jnp.int32),
        body_pose=jnp.asarray(item["poses"][1:24], jnp.float32),
    )
    return TrainBatch(
        rays=rays,
        rgb=jnp.asarray(_wrap_pad(item["rgb"], nrays), jnp.float32),
        occupancy=jnp.asarray(_wrap_pad(item["occupancy"], nrays), jnp.float32),
    )


#: (cluster table, face permutation, kd tile table, device faces,
#: device canonical verts, hoisted canonical listed-search tables)
#: per canonical mesh
_CLUSTER_CACHE: dict[tuple, tuple] = {}


def _mesh_cache_key(faces: np.ndarray, verts_cano: np.ndarray) -> tuple:
    """Content-derived key: `id()` of a garbage-collected array can be
    recycled, which would silently serve another mesh's face permutation to
    the pruned search. Hashing ~6890x3 floats once per (mesh, process) is
    microseconds."""
    f = np.ascontiguousarray(faces)
    v = np.ascontiguousarray(verts_cano)
    return (
        f.shape, v.shape,
        hash(f.tobytes()), hash(v.tobytes()),
    )


def _spatial_tables_for(faces: np.ndarray, verts_cano: np.ndarray):
    """Build (and cache per canonical mesh) the balanced face partition,
    the flattened kd-spatial face order, the kd tile table of the listed
    search, and the device copies of the constant faces/canonical-verts
    arrays (re-uploading them per item would churn H2D transfers)."""
    key = _mesh_cache_key(faces, verts_cano)
    if key not in _CLUSTER_CACHE:
        from ..ops import build_face_clusters
        from ..ops.pruned_knn import build_face_tiles

        # the whole build is plain numpy — a device round-trip here costs
        # ~20 s of backend-init + gather-compile on a 1-core virtual-CPU
        # host (the dryrun environment) for work numpy does in milliseconds
        faces_np = np.asarray(faces, np.int64)
        cents = np.asarray(verts_cano, np.float32)[faces_np].mean(axis=1)
        table = np.asarray(build_face_clusters(cents).table)
        face_perm = jnp.asarray(table[table >= 0].ravel(), jnp.int32)
        tile_table = build_face_tiles(cents)
        faces_dev = jnp.asarray(faces, jnp.int32)
        cano_dev = jnp.asarray(verts_cano, jnp.float32)
        # the CANONICAL mesh is constant for the whole run, so the listed
        # search's derived tables are computed once here instead of being
        # re-derived inside every step's graph. Pure numpy, bit-identical
        # to the in-graph `face_centroids -> listed_tables` derivation
        # (listed_tables_np docstring + tests pin it); device versions of
        # the build cost ~18-60 s of compiles at training start.
        from ..ops.pruned_knn import listed_tables_np

        # XLA's mean lowers to sum * (1/n) with a left-to-right 3-element
        # sum; np.mean uses a divide and differs in ulps — replicate the
        # device formula so cent_t matches face_centroids bit for bit
        tris = np.asarray(verts_cano, np.float32)[faces_np]
        cents_f32 = ((tris[:, 0] + tris[:, 1]) + tris[:, 2]) * np.float32(
            1.0 / 3.0
        )
        cano_tables = tuple(
            jnp.asarray(x) for x in listed_tables_np(
                cents_f32, np.asarray(tile_table)
            )
        )
        _CLUSTER_CACHE[key] = (
            jnp.asarray(table), face_perm, tile_table,
            faces_dev, cano_dev, cano_tables,
        )
    return _CLUSTER_CACHE[key]


#: posed-mesh listed-search tables keyed by (mesh key, xyz bytes hash) —
#: ZJU reuses each frame's posed mesh every epoch, so this hits after
#: epoch 1 exactly like the decoded-frame caches
_WORLD_TABLE_CACHE: dict[tuple, tuple] = {}


#: entries hold device (HBM) arrays ~1 MB each; bound the cache well below
#: HBM scale and evict oldest-first (dict preserves insertion order)
_WORLD_TABLE_CACHE_MAX = 1024


def _world_tables_for(xyz: np.ndarray, faces_np: np.ndarray, mesh_key):
    import hashlib

    from ..ops.pruned_knn import listed_tables_np

    xyz32 = np.ascontiguousarray(xyz, np.float32)
    # full digest + length: a truncated Python hash() collision would
    # silently serve another frame's tables to an exact search
    digest = hashlib.sha1(xyz32.tobytes()).hexdigest()
    key = (mesh_key, xyz32.nbytes, digest)
    hit = _WORLD_TABLE_CACHE.get(key)
    if hit is None:
        tile_table = np.asarray(_CLUSTER_CACHE[mesh_key][2])
        tris = xyz32[faces_np]
        cents = ((tris[:, 0] + tris[:, 1]) + tris[:, 2]) * np.float32(
            1.0 / 3.0
        )
        hit = tuple(
            jnp.asarray(x) for x in listed_tables_np(cents, tile_table)
        )
        while len(_WORLD_TABLE_CACHE) >= _WORLD_TABLE_CACHE_MAX:
            _WORLD_TABLE_CACHE.pop(next(iter(_WORLD_TABLE_CACHE)))
        _WORLD_TABLE_CACHE[key] = hit
    return hit


def item_to_mesh(item: dict, faces: np.ndarray, verts_cano: np.ndarray) -> MeshBundle:
    (table, face_perm, tile_table, faces_dev, cano_dev,
     cano_tables) = _spatial_tables_for(faces, verts_cano)
    # A/B knobs, both MEASURED NEGATIVE and default OFF (v5e 2026-08-20,
    # bench.py back-to-back): hoisting the canonical tables out of the step
    # graph cost exact 103.0k -> 98.5k rays/s and gated 182.0k -> 179.9k —
    # XLA already overlaps the in-graph derivation to ~free, and feeding
    # the tables as jit inputs perturbs its schedule/layout for the worse.
    # Kept behind env knobs as the recorded A/B (bench/r4/NOTES.md).
    import os

    if os.environ.get("DSNERF_CANO_TABLES", "0") == "0":
        cano_tables = None
    world_tables = None
    if os.environ.get("DSNERF_WORLD_TABLES", "0") == "1":
        world_tables = _world_tables_for(
            np.asarray(item["xyz"]),
            np.asarray(faces, np.int64),
            _mesh_cache_key(faces, verts_cano),
        )
    return MeshBundle(
        faces=faces_dev,
        verts_world=jnp.asarray(item["xyz"], jnp.float32),
        verts_cano=cano_dev,
        cluster_table=table,
        face_perm=face_perm,
        tile_table=tile_table,
        cano_tables=cano_tables,
        world_tables=world_tables,
    )


def iter_ray_chunks(
    item: dict, chunk: int, frame_override: int | None = None
) -> Iterator[tuple[RayBatch, int]]:
    """Yield (RayBatch, n_valid) fixed-size chunks covering all image rays."""
    n = item["ray_o"].shape[0]
    frame = int(item["frame"]) if frame_override is None else frame_override
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        sl = slice(start, end)
        valid = end - start

        def pad(x):
            x = x[sl]
            if valid < chunk:
                x = np.concatenate(
                    [x, np.repeat(x[-1:], chunk - valid, axis=0)], axis=0
                )
            return x

        yield (
            RayBatch(
                ray_o=jnp.asarray(pad(item["ray_o"]), jnp.float32),
                ray_d=jnp.asarray(pad(item["ray_d"]), jnp.float32),
                near=jnp.asarray(pad(item["near"]), jnp.float32),
                far=jnp.asarray(pad(item["far"]), jnp.float32),
                frame=jnp.asarray(frame, jnp.int32),
                body_pose=jnp.asarray(item["poses"][1:24], jnp.float32),
            ),
            valid,
        )
