"""Host-side ray generation and importance pixel sampling (numpy/cv2).

Behavioral reference: `utils/rays_utils.py` (ZJU conventions) and
`utils/h36m_utils.py:14-157` (H36M conventions). The two differ subtly and
both are preserved:

- ZJU `get_rays` keeps ray_d UN-normalized (`rays_utils.py:16-30`); H36M
  normalizes it (`h36m_utils.py:26`).
- ZJU `get_near_far` is the slab test over intersection points with an AABB
  inflated by 1cm, keeping rays hitting exactly twice (`rays_utils.py:63-97`);
  H36M uses the standard tmin/tmax slab test (`h36m_utils.py:61-78`).

This is host pipeline code: per-image, dynamic shapes are fine here; the
device side receives fixed-size batches (see batching.py).
"""

from __future__ import annotations

import cv2
import numpy as np


def project(xyz: np.ndarray, K: np.ndarray, RT: np.ndarray) -> np.ndarray:
    """World points (N, 3) -> pixel coords (N, 2)."""
    cam = xyz @ RT[:, :3].T + RT[:, 3:].T
    pix = cam @ K.T
    return pix[:, :2] / pix[:, 2:]


def get_rays(H, W, K, R, T, normalize: bool = False):
    """Per-pixel camera rays in world space: returns (ray_o, ray_d) (H, W, 3)."""
    rays_o = -(R.T @ T).ravel()
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
        indexing="xy",
    )
    xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
    pixel_camera = xy1 @ np.linalg.inv(K).T
    pixel_world = (pixel_camera - T.ravel()) @ R
    rays_d = pixel_world - rays_o[None, None]
    if normalize:
        rays_d = rays_d / np.linalg.norm(rays_d, axis=2, keepdims=True)
    rays_o = np.broadcast_to(rays_o, rays_d.shape)
    return rays_o, rays_d


def get_rays_at(coords, K, R, T, normalize: bool = False):
    """Camera rays for (N, 2) pixel coords in (row, col) order.

    Identical math (and op order, hence bit-identical values) to
    `get_rays`, evaluated only at the sampled pixels — the training sampler
    draws ~6k pixels per 512x512 image, so building all 262k rays first
    (the reference's `rays_utils.py:104-121` approach) is ~40x wasted host
    work per item."""
    rays_o = -(R.T @ T).ravel()
    xy1 = np.stack(
        [
            coords[:, 1].astype(np.float32),
            coords[:, 0].astype(np.float32),
            np.ones(len(coords), np.float32),
        ],
        axis=1,
    )
    pixel_camera = xy1 @ np.linalg.inv(K).T
    pixel_world = (pixel_camera - T.ravel()) @ R
    rays_d = pixel_world - rays_o[None]
    if normalize:
        rays_d = rays_d / np.linalg.norm(rays_d, axis=1, keepdims=True)
    return np.broadcast_to(rays_o, rays_d.shape), rays_d


def get_bound_corners(bounds: np.ndarray) -> np.ndarray:
    mn, mx = bounds[0], bounds[1]
    return np.array(
        [
            [mn[0], mn[1], mn[2]], [mn[0], mn[1], mx[2]],
            [mn[0], mx[1], mn[2]], [mn[0], mx[1], mx[2]],
            [mx[0], mn[1], mn[2]], [mx[0], mn[1], mx[2]],
            [mx[0], mx[1], mn[2]], [mx[0], mx[1], mx[2]],
        ]
    )


def get_bound_2d_mask(bounds, K, pose, H, W) -> np.ndarray:
    """Rasterized screen-space hull of the 3D AABB (`rays_utils.py:49-60`)."""
    corners_2d = np.round(project(get_bound_corners(bounds), K, pose)).astype(int)
    mask = np.zeros((H, W), dtype=np.uint8)
    for quad in (
        [0, 1, 3, 2, 0], [4, 5, 7, 6, 5], [0, 1, 5, 4, 0],
        [2, 3, 7, 6, 2], [0, 2, 6, 4, 0], [1, 3, 7, 5, 1],
    ):
        cv2.fillPoly(mask, [corners_2d[quad]], 1)
    return mask


def get_near_far_zju(bounds, ray_o, ray_d):
    """AABB intersection, ZJU flavor (`rays_utils.py:63-97`).

    Returns (near, far, mask_at_box); near/far only for rays in mask."""
    bounds = bounds + np.array([-0.01, 0.01])[:, None]
    nominator = bounds[None] - ray_o[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        # axis-parallel rays yield inf/nan planes that the box test rejects
        d_intersect = (nominator / ray_d[:, None]).reshape(-1, 6)
        p_intersect = d_intersect[..., None] * ray_d[:, None] + ray_o[:, None]
    mn = bounds.ravel()[:3]
    mx = bounds.ravel()[3:]
    eps = 1e-6
    ok = np.ones(p_intersect.shape[:2], dtype=bool)
    for a in range(3):
        ok &= (p_intersect[..., a] >= mn[a] - eps) & (
            p_intersect[..., a] <= mx[a] + eps
        )
    mask_at_box = ok.sum(-1) == 2
    p_intervals = p_intersect[mask_at_box][ok[mask_at_box]].reshape(-1, 2, 3)
    ro = ray_o[mask_at_box]
    rd = ray_d[mask_at_box]
    norm_ray = np.linalg.norm(rd, axis=1)
    d0 = np.linalg.norm(p_intervals[:, 0] - ro, axis=1) / norm_ray
    d1 = np.linalg.norm(p_intervals[:, 1] - ro, axis=1) / norm_ray
    return np.minimum(d0, d1), np.maximum(d0, d1), mask_at_box


def get_near_far_h36m(bounds, ray_o, ray_d):
    """Slab-test AABB intersection, H36M flavor (`h36m_utils.py:61-78`)."""
    norm_d = np.linalg.norm(ray_d, axis=-1, keepdims=True)
    viewdir = ray_d / norm_d
    viewdir[(viewdir < 1e-5) & (viewdir > -1e-10)] = 1e-5
    viewdir[(viewdir > -1e-5) & (viewdir < 1e-10)] = -1e-5
    tmin = (bounds[:1] - ray_o[:1]) / viewdir
    tmax = (bounds[1:2] - ray_o[:1]) / viewdir
    t1 = np.minimum(tmin, tmax)
    t2 = np.maximum(tmin, tmax)
    near = np.max(t1, axis=-1)
    far = np.min(t2, axis=-1)
    mask_at_box = near < far
    near = near[mask_at_box] / norm_d[mask_at_box, 0]
    far = far[mask_at_box] / norm_d[mask_at_box, 0]
    return near, far, mask_at_box


class SamplePools:
    """Per-frame static inputs of `sample_rays`, cacheable across epochs.

    The projected-AABB mask and the body/face/in-bbox pixel-coordinate
    pools depend only on (mask, face_mask, camera, bounds) — all constant
    per frame — yet rebuilding them (`np.argwhere` over the full image +
    `fillPoly`) measured ~10 ms of the ~28 ms/item host cost on the bench
    workload. Datasets cache one of these per frame alongside the decoded
    images; `sample_rays(pools=...)` then draws from the cached pools with
    BIT-IDENTICAL results (the pools are exactly the arrays it would have
    recomputed). Coords are stored int32 to bound the cache footprint.
    """

    __slots__ = ("bound_mask", "coord_body", "coord_face", "coord_bound")

    def __init__(self, bound_mask, coord_body, coord_face, coord_bound):
        self.bound_mask = bound_mask
        self.coord_body = coord_body
        self.coord_face = coord_face
        self.coord_bound = coord_bound


def build_sample_pools(H, W, K, R, T, bounds, mask=None, face_mask=None,
                       coords=True):
    """Precompute `SamplePools` for one frame (see class docstring).

    coords=False skips the argwhere coordinate pools (only `bound_mask` is
    populated) — the full-image nrays<=0 eval path never reads them.
    """
    pose = np.concatenate([R, T], axis=1)
    bound_mask = get_bound_2d_mask(bounds, K, pose, H, W)
    if not coords:
        return SamplePools(bound_mask, None, None, None)
    coord_body = (
        np.argwhere(mask != 0).astype(np.int32) if mask is not None else None
    )
    coord_face = (
        np.argwhere(face_mask == 2).astype(np.int32)
        if face_mask is not None else np.zeros((0, 2), np.int32)
    )
    coord_bound = np.argwhere(bound_mask == 1).astype(np.int32)
    return SamplePools(bound_mask, coord_body, coord_face, coord_bound)


def sample_rays(
    img, K, R, T, bounds, mask=None, nrays=500, *,
    face_mask=None, rng: np.random.Generator | None = None,
    body_ratio=0.6, face_ratio=0.05, normalize_dirs=False,
    near_far=get_near_far_zju, pools: SamplePools | None = None,
):
    """Importance-sample nrays pixels: body/face/in-bbox mix.

    Reference: `rays_utils.py:104-191` (`my_sample_ray`). With nrays > 0,
    loops until exactly nrays AABB-hitting rays are collected (60% body / 5%
    face / rest inside the projected bbox). With nrays <= 0 (full image),
    returns every ray inside the AABB.

    face_mask: pixels == 2 in the cihp labeling count as face
    (`rays_utils.py:133`); `mask` nonzero counts as body.
    pools: optional cached `build_sample_pools(...)` for this frame (must
    match mask/face_mask/camera/bounds — results are then bit-identical).
    Returns (rgb, ray_o, ray_d, near, far, coord, mask_at_box, bound_mask).
    """
    rng = rng or np.random.default_rng()
    H, W = img.shape[:2]
    if pools is None:
        pools = build_sample_pools(
            H, W, K, R, T, bounds, mask=mask, face_mask=face_mask,
            coords=nrays > 0,
        )
    bound_mask = pools.bound_mask
    if nrays <= 0:
        ray_o_all, ray_d_all = get_rays(H, W, K, R, T, normalize=normalize_dirs)

    if nrays > 0:
        nsampled = 0
        outs = {k: [] for k in
                ("ray_o", "ray_d", "rgb", "near", "far", "coord", "mab")}
        coord_body_all = pools.coord_body
        coord_face_all = pools.coord_face
        coord_bound_all = pools.coord_bound
        while nsampled < nrays:
            n_body = int((nrays - nsampled) * body_ratio)
            n_face = int((nrays - nsampled) * face_ratio)
            n_rand = (nrays - nsampled) - n_body - n_face
            parts = []
            if coord_body_all is not None and len(coord_body_all):
                parts.append(
                    coord_body_all[rng.integers(0, len(coord_body_all), n_body)]
                )
            if len(coord_face_all) > 0:
                parts.append(
                    coord_face_all[rng.integers(0, len(coord_face_all), n_face)]
                )
            parts.append(
                coord_bound_all[rng.integers(0, len(coord_bound_all), n_rand)]
            )
            coord = np.concatenate(parts, axis=0)

            ro, rd = get_rays_at(coord, K, R, T, normalize=normalize_dirs)
            rgb = img[coord[:, 0], coord[:, 1]]
            near, far, mab = near_far(bounds, ro, rd)

            outs["ray_o"].append(ro[mab])
            outs["ray_d"].append(rd[mab])
            outs["rgb"].append(rgb[mab])
            outs["near"].append(near)
            outs["far"].append(far)
            outs["coord"].append(coord[mab])
            outs["mab"].append(mab[mab])
            nsampled += len(near)

        ray_o = np.concatenate(outs["ray_o"]).astype(np.float32)
        ray_d = np.concatenate(outs["ray_d"]).astype(np.float32)
        rgb = np.concatenate(outs["rgb"]).astype(np.float32)
        near = np.concatenate(outs["near"]).astype(np.float32)
        far = np.concatenate(outs["far"]).astype(np.float32)
        coord = np.concatenate(outs["coord"])
        mask_at_box = np.concatenate(outs["mab"])
        assert ray_o.shape[0] == nrays
    else:
        rgb = img.reshape(-1, 3).astype(np.float32)
        ray_o = ray_o_all.reshape(-1, 3).astype(np.float32)
        ray_d = ray_d_all.reshape(-1, 3).astype(np.float32)
        near, far, mask_at_box = near_far(bounds, ray_o, ray_d)
        near = near.astype(np.float32)
        far = far.astype(np.float32)
        rgb = rgb[mask_at_box]
        ray_o = ray_o[mask_at_box]
        ray_d = ray_d[mask_at_box]
        coord = np.argwhere(mask_at_box.reshape(H, W))

    return rgb, ray_o, ray_d, near, far, coord, mask_at_box, bound_mask
