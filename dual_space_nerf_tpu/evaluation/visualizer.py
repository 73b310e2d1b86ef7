"""Density-field mesh extraction (dev utility).

Behavioral reference: `utils/visualizer.py:11-251` (`Visualizer3D`): build a
world-space grid over the subject bounds, warp it to canonical space
(`render.w2l_without_lbs`, no ray dirs), query density in chunks
(`render.query_volume`, density_only), extract an iso-surface, export. The
reference renders with pyrender; headless here, so the mesh is written as a
Wavefront .obj instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import face_centroids
from ..renderer import MeshBundle, RenderSettings, density_grid, warp_world_to_canonical
from ..utils.mesh_extract import marching_tetrahedra, save_obj


class Visualizer3D:
    def __init__(
        self,
        model,
        params,
        settings: RenderSettings,
        resolution: int = 128,
        level: float = 5.0,
        chunk: int = 100_000,
    ):
        self.model = model
        self.params = params
        self.settings = settings
        self.resolution = resolution
        self.level = level
        self.chunk = chunk

    def density_volume(
        self, mesh: MeshBundle, bounds: np.ndarray, frame: int,
        body_pose: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (grid (R,R,R), origin (3,), spacing (3,))."""
        r = self.resolution
        axes = [np.linspace(bounds[0][a], bounds[1][a], r) for a in range(3)]
        pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
        spacing = (bounds[1] - bounds[0]) / (r - 1)

        centroids_w = face_centroids(mesh.verts_world, mesh.faces)
        densities = []
        for start in range(0, len(pts), self.chunk):
            chunk_pts = jnp.asarray(pts[start : start + self.chunk], jnp.float32)
            pts_c, tmask, _, _ = warp_world_to_canonical(
                chunk_pts, mesh, centroids_w, self.settings
            )
            d = density_grid(
                self.params, self.model, pts_c,
                jnp.asarray(frame, jnp.int32),
                jnp.asarray(body_pose[1:24], jnp.float32),
                self.settings,
            )
            d = jnp.where(tmask, 0.0, d)
            densities.append(np.asarray(d))
        grid = np.concatenate(densities).reshape(r, r, r)
        return grid, bounds[0], spacing

    def extract_mesh(
        self, mesh: MeshBundle, bounds: np.ndarray, frame: int,
        body_pose: np.ndarray, out_path: str | None = None,
    ):
        grid, origin, spacing = self.density_volume(mesh, bounds, frame, body_pose)
        verts, faces = marching_tetrahedra(grid, self.level, origin, spacing)
        if out_path:
            save_obj(out_path, verts, faces)
        return verts, faces
