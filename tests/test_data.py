"""Host data pipeline tests: ray sampling, synthetic dataset, batching,
prefetch, rigid transforms."""

import numpy as np
import pytest

from dual_space_nerf_tpu.data import (
    PrefetchLoader,
    SyntheticDataset,
    item_to_mesh,
    item_to_train_batch,
    iter_ray_chunks,
    make_scene,
)
from dual_space_nerf_tpu.data.h36m import (
    batch_rodrigues,
    get_rigid_transformation,
)
from dual_space_nerf_tpu.data.rays import (
    get_near_far_h36m,
    get_near_far_zju,
    get_rays,
    sample_rays,
)


def test_get_rays_geometry():
    scene = make_scene(n_theta=6, n_phi=6, h=32, w=32)
    ray_o, ray_d = get_rays(32, 32, scene.K, scene.R, scene.T)
    eye = (-scene.R.T @ scene.T).ravel()
    np.testing.assert_allclose(ray_o[0, 0], eye, atol=1e-6)
    # center pixel ray ~ camera forward axis
    fwd = scene.R[2]
    c = ray_d[16, 16] / np.linalg.norm(ray_d[16, 16])
    assert np.dot(c, fwd) > 0.99


def test_near_far_zju_matches_h36m_on_hits(rng_np):
    bounds = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    ray_o = np.tile(np.array([[0.0, 0.0, -5.0]]), (64, 1))
    dirs = rng_np.normal(size=(64, 3)) * 0.1 + np.array([0, 0, 1.0])
    near_z, far_z, mask_z = get_near_far_zju(bounds, ray_o, dirs)
    # feed H36M the ZJU-inflated box (+-1cm) so the two are comparable
    inflated = bounds + np.array([-0.01, 0.01])[:, None]
    near_h, far_h, mask_h = get_near_far_h36m(inflated, ray_o, dirs.copy())
    common = mask_z & mask_h
    iz = np.cumsum(mask_z) - 1
    ih = np.cumsum(mask_h) - 1
    for i in np.where(common)[0]:
        np.testing.assert_allclose(near_z[iz[i]], near_h[ih[i]], atol=1e-3)
        np.testing.assert_allclose(far_z[iz[i]], far_h[ih[i]], atol=1e-3)


def test_sample_rays_exact_count_and_sources():
    scene = make_scene(n_theta=14, n_phi=12, h=96, w=96)
    from dual_space_nerf_tpu.data.synthetic_dataset import splat_image

    img, mask = splat_image(scene, 96, 96)
    rgb, ray_o, ray_d, near, far, coord, mab, bound_mask = sample_rays(
        img, scene.K, scene.R, scene.T, scene.bounds, mask=mask,
        nrays=256, rng=np.random.default_rng(0),
    )
    assert rgb.shape == (256, 3)
    assert ray_o.shape == (256, 3)
    assert (near < far).all()
    assert mab.all()
    # sampled coords must lie in the projected bbox or body mask
    inside = bound_mask[coord[:, 0], coord[:, 1]] | mask[coord[:, 0], coord[:, 1]]
    assert inside.mean() > 0.99


def test_sample_rays_full_image_mode():
    scene = make_scene(n_theta=14, n_phi=12, h=64, w=64)
    from dual_space_nerf_tpu.data.synthetic_dataset import splat_image

    img, mask = splat_image(scene, 64, 64)
    rgb, ray_o, ray_d, near, far, coord, mab, _ = sample_rays(
        img, scene.K, scene.R, scene.T, scene.bounds, mask=mask, nrays=-1,
    )
    assert mab.shape == (64 * 64,)
    assert rgb.shape[0] == mab.sum()
    assert rgb.shape[0] > 100  # the capsule is visible


def test_synthetic_dataset_item_schema():
    ds = SyntheticDataset(split="train", nrays=128, n_frames=2, n_views=2)
    assert len(ds) == 4
    item = ds[1]
    for key in ("img", "rgb", "ray_o", "ray_d", "near", "far", "occupancy",
                "poses", "xyz", "frame", "mask_at_box", "save_name"):
        assert key in item, key
    assert item["rgb"].shape == (128, 3)
    assert item["poses"].shape == (24, 3)
    assert item["xyz"].shape[1] == 3


def test_item_to_train_batch_pads_by_wrapping():
    from dual_space_nerf_tpu.data.batching import _spatial_ray_order

    ds = SyntheticDataset(split="train", nrays=100, n_frames=1, n_views=1)
    item = ds[0]
    batch = item_to_train_batch(item, nrays=256)
    assert batch.rays.ray_o.shape == (256, 3)
    assert batch.rgb.shape == (256, 3)
    # rays are spatially reordered, then padding wraps the reordered array
    sorted_rd = item["ray_d"][_spatial_ray_order(item)]
    np.testing.assert_array_equal(
        np.asarray(batch.rays.ray_d[:100]), sorted_rd
    )
    np.testing.assert_array_equal(
        np.asarray(batch.rays.ray_d[100:200]), sorted_rd
    )


def test_iter_ray_chunks_covers_image():
    ds = SyntheticDataset(split="val", n_frames=1, n_views=1, h=64, w=64)
    item = ds[0]
    n = item["ray_o"].shape[0]
    total = 0
    for rays, valid in iter_ray_chunks(item, chunk=500):
        assert rays.ray_o.shape == (500, 3)
        total += valid
    assert total == n


def test_prefetch_loader_yields_all_items():
    ds = SyntheticDataset(split="train", nrays=32, n_frames=2, n_views=3)
    loader = PrefetchLoader(ds, shuffle=True, num_workers=3, seed=0)
    items = list(loader)
    assert len(items) == len(ds)
    names = sorted(i["save_name"] for i in items)
    assert names == sorted(ds[i]["save_name"] for i in range(len(ds)))


def test_batch_rodrigues_identity_and_known():
    R = batch_rodrigues(np.zeros((1, 3)))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    R = batch_rodrigues(np.array([[0.0, 0.0, np.pi / 2]]))
    np.testing.assert_allclose(
        R[0], [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
    )


def test_rigid_transformation_rest_pose_is_identity():
    joints = np.random.default_rng(0).normal(size=(24, 3))
    parents = np.concatenate([[-1], np.zeros(23, int)])
    A = get_rigid_transformation(np.zeros((24, 3)), joints, parents)
    assert A.shape == (24, 4, 4)
    for j in range(24):
        np.testing.assert_allclose(A[j, :3, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(A[j, :3, 3], 0.0, atol=1e-6)


def test_cluster_cache_keyed_by_content_not_id():
    """Two different canonical meshes must never share spatial tables, even
    when one array is garbage-collected and its id() is recycled."""
    import gc

    from dual_space_nerf_tpu.data.batching import (
        _CLUSTER_CACHE,
        _spatial_tables_for,
    )

    rng = np.random.default_rng(0)
    faces = rng.integers(0, 30, (40, 3)).astype(np.int32)

    v1 = rng.standard_normal((30, 3)).astype(np.float32)
    _, perm1, *_ = _spatial_tables_for(faces, v1)
    perm1 = np.asarray(perm1).copy()
    key1 = id(v1)
    del v1
    gc.collect()

    # a distinct mesh; also explicitly poison the old id-keyed slot to prove
    # the cache no longer consults id()
    v2 = rng.standard_normal((30, 3)).astype(np.float32) * 3.0 + 5.0
    assert key1 not in _CLUSTER_CACHE  # keys are content tuples, not ids
    _, perm2, *_ = _spatial_tables_for(faces, v2)
    assert not np.array_equal(perm1, np.asarray(perm2))

    # same content in a fresh array object hits the cache
    v2_copy = v2.copy()
    _, perm3, *_ = _spatial_tables_for(faces, v2_copy)
    assert np.array_equal(np.asarray(perm2), np.asarray(perm3))


def test_get_rays_at_matches_full_grid():
    from dual_space_nerf_tpu.data.rays import get_rays, get_rays_at

    rng = np.random.default_rng(4)
    K = np.array([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
    R, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    T = rng.standard_normal((3, 1))
    ro_all, rd_all = get_rays(48, 64, K, R, T)
    coords = np.stack(
        [rng.integers(0, 48, 50), rng.integers(0, 64, 50)], axis=1
    )
    ro, rd = get_rays_at(coords, K, R, T)
    np.testing.assert_array_equal(ro, ro_all[coords[:, 0], coords[:, 1]])
    np.testing.assert_array_equal(rd, rd_all[coords[:, 0], coords[:, 1]])
    # normalized flavor (H36M)
    _, rd_all_n = get_rays(48, 64, K, R, T, normalize=True)
    _, rd_n = get_rays_at(coords, K, R, T, normalize=True)
    np.testing.assert_array_equal(rd_n, rd_all_n[coords[:, 0], coords[:, 1]])


def test_prefetch_abandoned_iterator_stops_workers():
    """Breaking out of an epoch must stop the worker threads (they used to
    keep loading into a dead queue, racing cv2 and outliving tempdirs)."""
    import threading
    import time

    from dual_space_nerf_tpu.data.prefetch import PrefetchLoader

    reads = []

    class SlowDS:
        def __len__(self):
            return 200

        def __getitem__(self, i):
            reads.append(i)
            time.sleep(0.005)
            return i

    loader = PrefetchLoader(SlowDS(), shuffle=False, num_workers=4, prefetch=2)
    it = iter(loader)
    for _ in range(3):
        next(it)
    it.close()  # abandon the epoch
    time.sleep(0.1)
    n_after_close = len(reads)
    time.sleep(0.4)
    # workers may finish their in-flight item but must not keep going
    assert len(reads) <= n_after_close + 4, (len(reads), n_after_close)
    assert threading.active_count() < 20


def test_undistorter_bitwise():
    """cameras.undistort (cached CV_16SC2 maps + remap) must be bitwise
    identical to per-frame `cv2.undistort` (the reference's call,
    `zju_mocap_dataset.py:120`) for every dtype the loaders feed it."""
    import cv2

    from dual_space_nerf_tpu.data.cameras import Undistorter

    rng = np.random.default_rng(7)
    h, w = 256, 320
    K = np.array([[300.0, 0, 160.0], [0, 300.0, 128.0], [0, 0, 1]])
    D = np.array([-0.3, 0.15, 1e-3, -2e-3, 0.05])
    ud = Undistorter()

    img_u8 = rng.integers(0, 256, (h, w, 3), np.uint8)
    msk_u8 = (rng.random((h, w)) > 0.5).astype(np.uint8)
    img_f32 = rng.random((h, w, 3)).astype(np.float32)
    for img in (img_u8, msk_u8, img_f32):
        ref = cv2.undistort(img, K, D)
        got = ud(img, K, D)
        assert got.dtype == ref.dtype
        np.testing.assert_array_equal(got, ref)
        # second call hits the map cache and must still match
        np.testing.assert_array_equal(ud(img, K, D), ref)

    # all-zero distortion is an exact no-op (and returns the input as-is)
    assert ud(img_u8, K, np.zeros(5)) is img_u8
    np.testing.assert_array_equal(
        cv2.undistort(img_u8, K, np.zeros(5)), img_u8
    )

    # a second camera must get its own maps, not the cached ones
    K2 = np.array([[280.0, 0, 150.0], [0, 290.0, 120.0], [0, 0, 1]])
    D2 = np.array([0.2, -0.1, 0.0, 0.0, 0.0])
    np.testing.assert_array_equal(
        ud(img_u8, K2, D2), cv2.undistort(img_u8, K2, D2)
    )
    # and (1, 5)-shaped dist vectors (annots.npy cameras) are accepted
    np.testing.assert_array_equal(
        ud(img_u8, K, D.reshape(1, 5)), cv2.undistort(img_u8, K, D)
    )


def test_prefetch_worker_error_propagates():
    """A corrupt item must fail the epoch loudly — not be silently dropped
    with one worker dead for the rest of the run."""
    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("corrupt item")
            return i

    loader = PrefetchLoader(Bad(), shuffle=False, num_workers=2, seed=0)
    with pytest.raises(RuntimeError, match=r"dataset\[5\]"):
        for _ in loader:
            pass


def test_prefetch_process_backend_yields_all_items():
    """backend='process': forked workers sample; transform runs consumer-
    side; every item arrives exactly once."""
    from dual_space_nerf_tpu.data.prefetch import PrefetchLoader

    class Squares:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return {"i": i, "sq": i * i}

    loader = PrefetchLoader(
        Squares(), shuffle=True, num_workers=2, seed=0,
        transform=lambda d: {**d, "t": d["sq"] + 1}, backend="process",
    )
    got = sorted((d["i"], d["sq"], d["t"]) for d in loader)
    assert got == [(i, i * i, i * i + 1) for i in range(12)]
    # a second epoch works (fresh pool per epoch)
    assert len(list(loader)) == 12


def test_prefetch_backend_validation():
    from dual_space_nerf_tpu.data.prefetch import PrefetchLoader

    import pytest as _pytest

    with _pytest.raises(ValueError, match="backend"):
        PrefetchLoader([1, 2], backend="greenlet")


def test_prefetch_env_overrides_backend_arg(monkeypatch):
    """DSNERF_LOADER_BACKEND wins over the config-passed backend, same
    convention as the DSNERF_KNN_* kernel knobs."""
    from dual_space_nerf_tpu.data.prefetch import PrefetchLoader

    monkeypatch.setenv("DSNERF_LOADER_BACKEND", "process")
    assert PrefetchLoader([1], backend="thread").backend == "process"
    monkeypatch.delenv("DSNERF_LOADER_BACKEND")
    assert PrefetchLoader([1], backend="thread").backend == "thread"
    assert PrefetchLoader([1]).backend == "thread"


def test_synthesize_tree_parametrized_sizes(tmp_path):
    """bench.py's cache-cold measurement synthesizes a ZJU-shaped tree at
    non-default sizes through scripts/demo_end_to_end.synthesize_tree —
    protect that parametrization (the demo test covers only the defaults)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
    ))
    import demo_end_to_end as demo

    from dual_space_nerf_tpu.data.zju import Mocap

    tree = str(tmp_path / "zju_mocap")
    demo.synthesize_tree(
        tree, h=128, w=128, n_frames=2, train_views=[0, 1],
        extra_view_dirs=(),
    )
    ds = Mocap(
        human="CoreView_313", ratio=0.5, nrays=32, begin=0, end=2,
        train_views=(0, 1), data_dir=tree,
    )
    assert len(ds) == 4  # 2 frames x 2 views
    item = ds[0]
    assert item["img"].shape == (64, 64, 3)  # ratio 0.5 of 128
    assert item["rgb"].shape == (32, 3)
    assert (item["near"] < item["far"]).all()
