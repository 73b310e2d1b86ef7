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

    def render_turntable(
        self, mesh: MeshBundle, bounds: np.ndarray, frame: int,
        body_pose: np.ndarray, out_dir: str | None = None,
        n_views: int = 10, size: int = 512,
    ) -> list[np.ndarray]:
        """Rendered-mesh turntable, the reference Visualizer3D's pyrender
        output (`utils/visualizer.py:112-142`) — here via the dependency-
        free software rasterizer (no GL on a TPU host). Returns the frames;
        optionally writes mesh_###.png to out_dir."""
        verts, faces = self.extract_mesh(mesh, bounds, frame, body_pose)
        frames = []
        for i in range(n_views):
            img = render_mesh_image(
                verts, faces, angle=2 * np.pi * i / n_views, size=size
            )
            frames.append(img)
            if out_dir:
                import os

                import cv2

                os.makedirs(out_dir, exist_ok=True)
                cv2.imwrite(
                    os.path.join(out_dir, f"mesh_{i:03d}.png"), img[..., ::-1]
                )
        return frames


def render_mesh_image(
    verts: np.ndarray,
    faces: np.ndarray,
    angle: float = 0.0,
    size: int = 512,
    light_dir=(0.3, 0.5, 0.8),
) -> np.ndarray:
    """Flat-shaded z-buffer rasterization of a triangle mesh -> (H, W, 3)
    uint8. Pure numpy (barycentric coverage per triangle over its pixel
    bbox), replacing the reference's pyrender dependency for headless
    hosts."""
    if len(faces) == 0:
        return np.zeros((size, size, 3), np.uint8)
    v = np.asarray(verts, np.float64)
    center = 0.5 * (v.min(0) + v.max(0))
    scale = float(np.max(v.max(0) - v.min(0))) or 1.0
    v = (v - center) / scale  # fit in unit box
    ca, sa = np.cos(angle), np.sin(angle)
    rot = np.array([[ca, -sa, 0.0], [sa, ca, 0.0], [0.0, 0.0, 1.0]])
    v = v @ rot.T
    # orthographic: x right, z up, y = depth (smaller y closer)
    px = ((v[:, 0] * 0.9 + 1.0) * 0.5 * (size - 1))
    py = ((-v[:, 2] * 0.9 + 1.0) * 0.5 * (size - 1))
    depth = v[:, 1]

    tri = np.asarray(faces, np.int64)
    p0, p1, p2 = (np.stack([px[tri[:, k]], py[tri[:, k]]], -1)
                  for k in range(3))
    w0, w1, w2 = (v[tri[:, k]] for k in range(3))
    n = np.cross(w1 - w0, w2 - w0)
    nn = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    ld = np.asarray(light_dir, np.float64)
    ld = ld / np.linalg.norm(ld)
    shade = 0.25 + 0.75 * np.abs(nn @ ld)                      # (F,)

    img = np.zeros((size, size), np.float64)
    zbuf = np.full((size, size), np.inf)
    order = np.argsort(
        (depth[tri[:, 0]] + depth[tri[:, 1]] + depth[tri[:, 2]]) / 3.0
    )[::-1]  # far-to-near; z-test still guards per pixel
    for f in order:
        a, b, c = p0[f], p1[f], p2[f]
        lo = np.floor(np.minimum(np.minimum(a, b), c)).astype(int)
        hi = np.ceil(np.maximum(np.maximum(a, b), c)).astype(int)
        lo = np.maximum(lo, 0)
        hi = np.minimum(hi, size - 1)
        if (hi < lo).any():
            continue
        xs = np.arange(lo[0], hi[0] + 1)
        ys = np.arange(lo[1], hi[1] + 1)
        gx, gy = np.meshgrid(xs, ys)
        d = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(d) < 1e-12:
            continue
        u = ((gx - a[0]) * (c[1] - a[1]) - (gy - a[1]) * (c[0] - a[0])) / d
        w = ((b[0] - a[0]) * (gy - a[1]) - (b[1] - a[1]) * (gx - a[0])) / d
        inside = (u >= 0) & (w >= 0) & (u + w <= 1)
        if not inside.any():
            continue
        zd = (depth[tri[f, 0]] * (1 - u - w) + depth[tri[f, 1]] * u
              + depth[tri[f, 2]] * w)
        yy, xx = gy[inside], gx[inside]
        zz = zd[inside]
        closer = zz < zbuf[yy, xx]
        img[yy[closer], xx[closer]] = shade[f]
        zbuf[yy[closer], xx[closer]] = zz[closer]
    rgb = (np.clip(img, 0, 1)[..., None] * np.array([0.85, 0.85, 0.95])
           * 255).astype(np.uint8)
    return rgb
