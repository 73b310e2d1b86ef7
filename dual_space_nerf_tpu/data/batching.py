"""Host item dict -> fixed-shape device batches.

The device side is compiled for a single static ray count, so host items are
padded (rays replicated from the front of the batch, which is harmless for
training because losses are means over real rays only when pad_weight is
applied — for simplicity we pad by WRAPPING, which keeps the loss unbiased in
expectation since wrapped rays are real rays drawn by the same sampler).

Eval images are rendered in fixed-size chunks: `iter_ray_chunks` pads the
tail chunk by wrapping and the caller slices the valid prefix.
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
    key = (coord[:, 0] // 16) * 4096 + (coord[:, 1] // 16) * 16 + (
        coord[:, 0] % 16
    )
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


_CLUSTER_CACHE: dict[tuple, tuple[jnp.ndarray, jnp.ndarray]] = {}


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
    """Build (and cache per canonical mesh) the balanced face partition and
    the flattened kd-spatial face order used by the pruned search."""
    key = _mesh_cache_key(faces, verts_cano)
    if key not in _CLUSTER_CACHE:
        from ..ops import build_face_clusters, face_centroids
        from ..ops.pruned_knn import build_face_tiles

        cano = jnp.asarray(verts_cano, jnp.float32)
        cents = np.asarray(face_centroids(cano, jnp.asarray(faces, jnp.int32)))
        table = np.asarray(build_face_clusters(cents).table)
        face_perm = jnp.asarray(table[table >= 0].ravel(), jnp.int32)
        tile_table = build_face_tiles(jnp.asarray(cents))
        _CLUSTER_CACHE[key] = (jnp.asarray(table), face_perm, tile_table)
    return _CLUSTER_CACHE[key]


def item_to_mesh(item: dict, faces: np.ndarray, verts_cano: np.ndarray) -> MeshBundle:
    table, face_perm, tile_table = _spatial_tables_for(faces, verts_cano)
    return MeshBundle(
        faces=jnp.asarray(faces, jnp.int32),
        verts_world=jnp.asarray(item["xyz"], jnp.float32),
        verts_cano=jnp.asarray(verts_cano, jnp.float32),
        cluster_table=table,
        face_perm=face_perm,
        tile_table=tile_table,
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
