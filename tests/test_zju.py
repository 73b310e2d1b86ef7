"""ZJU-MoCap dataset-path tests against a synthesized on-disk layout.

The ZJU loader carries the most quirks in the system (reference
`dataloader/zju_mocap_dataset.py:38-44,76-78,153-156,275-280` and
`utils/camera_utils.py:208-244`); these tests build miniature trees for BOTH
flavors and exercise every quirk path end-to-end:

- 313-style: annots.npy cameras (T in mm -> /1000, physical cams 20/21 named
  "Camera (22)"/"Camera (23)"), "Camera (N)" image dirs, frame parsed from
  filename field 4 (1-indexed), full-path field-6 sort key.
- 377-style: intri/extri.yml (cv2.FileStorage) cameras, "Camera_BN" dirs,
  0-indexed "{frame}.jpg" names.
- both: mask_cihp sibling masks, undistort+fg-multiply+resize, X-pose leg
  offsets on poses, new_params/new_vertices per raw frame name.
"""

import os

import cv2
import numpy as np
import pytest

from dual_space_nerf_tpu.data import cameras as camera_utils
from dual_space_nerf_tpu.data.synthetic import look_at_camera, make_scene
from dual_space_nerf_tpu.data.synthetic_dataset import splat_image
from dual_space_nerf_tpu.data.zju import Mocap, MocapInfer, MocapView

H, W = 64, 64
N_FRAMES = 6           # 1-indexed 1..6 for 313-style; 0..5 for 377-style
RATIO = 0.5


def _scene():
    return make_scene(n_theta=14, n_phi=12, h=H, w=W)


def _cam_ring(n, radius=2.0):
    out = []
    for c in range(n):
        ang = 2 * np.pi * c / max(n, 1)
        eye = np.array([radius * np.cos(ang), radius * np.sin(ang), 0.3])
        out.append(look_at_camera(eye, np.zeros(3), H, W, focal=80.0))
    return out


def _write_assets(root, scene, rng, frame_names):
    """new_params / new_vertices / X_smpl_vertices for the given raw names."""
    os.makedirs(root / "new_params", exist_ok=True)
    os.makedirs(root / "new_vertices", exist_ok=True)
    for name in frame_names:
        np.save(
            root / "new_params" / f"{name}.npy",
            {
                "Rh": np.zeros((1, 3), np.float32),
                "Th": np.zeros((1, 3), np.float32),
                # zero poses make the X-pose leg offsets directly observable
                "poses": np.zeros((1, 72), np.float32),
                "shapes": np.zeros((1, 10), np.float32),
            },
        )
        np.save(root / "new_vertices" / f"{name}.npy", scene.verts_world)
    np.save(root / "X_smpl_vertices.npy", scene.verts_cano[None])


def _write_frame_image(root, cam_dir, fname, scene):
    img, mask = splat_image(scene, H, W)
    img_path = root / cam_dir / f"{fname}.jpg"
    os.makedirs(img_path.parent, exist_ok=True)
    cv2.imwrite(str(img_path), (img * 255).astype(np.uint8))
    msk_path = root / "mask_cihp" / cam_dir / f"{fname}.png"
    os.makedirs(msk_path.parent, exist_ok=True)
    cv2.imwrite(str(msk_path), mask * 255)


@pytest.fixture(scope="module")
def zju313_tree(tmp_path_factory):
    """CoreView_313-style tree. The data_dir must contain exactly one '_'
    for the reference's full-path split('_')[6] frame sort to land on the
    frame field (`zju_mocap_dataset.py:309`) — real deployments use a
    '.../zju_mocap/' root, reproduced here."""
    data_dir = tmp_path_factory.mktemp("zjuroot") / "zju_mocap"
    root = data_dir / "CoreView_313"
    scene = _scene()
    rng = np.random.default_rng(0)

    # 21 physical cameras -> names Camera (1..19), Camera (22), Camera (23)
    n_cams = 21
    ring = _cam_ring(n_cams)
    cams = {
        "K": [k for k, _, _ in ring],
        "R": [r for _, r, _ in ring],
        "T": [t * 1000.0 for _, _, t in ring],  # annots store mm
        "D": [np.zeros((5, 1)) for _ in range(n_cams)],
    }
    os.makedirs(root, exist_ok=True)
    np.save(root / "annots.npy", {"cams": cams, "ims": []})

    # images only where the tests look: train view 0 ("Camera (1)") and the
    # two renamed eval dirs ("Camera (22)"/"Camera (23)")
    for cam_dir in ("Camera (1)", "Camera (22)", "Camera (23)"):
        for f in range(1, N_FRAMES + 1):  # 1-indexed raw frame names
            fname = f"CoreView_313_Camera_(x)_{f:04d}_2019-08-23"
            _write_frame_image(root, cam_dir, fname, scene)

    # prepare_input loads f"{int(field4)}.npy" -> unpadded names 1..6
    _write_assets(root, scene, rng, [str(f) for f in range(1, N_FRAMES + 1)])
    return str(data_dir)


@pytest.fixture(scope="module")
def zju377_tree(tmp_path_factory):
    """CoreView_377-style tree: intri/extri.yml + Camera_BN dirs."""
    data_dir = tmp_path_factory.mktemp("zjuroot") / "zju_mocap"
    root = data_dir / "CoreView_377"
    scene = _scene()
    rng = np.random.default_rng(1)

    n_cams = 4
    ring = _cam_ring(n_cams)
    names = [f"Camera_B{c + 1}" for c in range(n_cams)]
    os.makedirs(root, exist_ok=True)
    _write_opencv_yml(
        root / "intri.yml",
        names,
        {
            f"K_{nm}": ring[i][0] for i, nm in enumerate(names)
        }
        | {f"dist_{nm}": np.zeros((5, 1)) for nm in names},
    )
    _write_opencv_yml(
        root / "extri.yml",
        None,
        {
            f"R_{nm}": cv2.Rodrigues(ring[i][1])[0] for i, nm in enumerate(names)
        }
        | {f"T_{nm}": ring[i][2].reshape(3, 1) for i, nm in enumerate(names)},
    )

    for c in range(n_cams):
        for f in range(N_FRAMES):  # 0-indexed "{frame}.jpg"
            _write_frame_image(root, f"Camera_B{c + 1}", str(f), scene)

    _write_assets(root, scene, rng, [str(f) for f in range(N_FRAMES)])
    return str(data_dir)


def _write_opencv_yml(path, names, mats):
    """Emit the cv2.FileStorage YAML the reference reads
    (`camera_utils.py:5-53`)."""
    lines = ["%YAML:1.0", "---"]
    if names is not None:
        lines.append("names:")
        for nm in names:
            lines.append(f'   - "{nm}"')
    for key, m in mats.items():
        m = np.asarray(m, np.float64)
        data = ", ".join(f"{v:.10e}" for v in m.ravel())
        lines += [
            f"{key}: !!opencv-matrix",
            f"   rows: {m.shape[0]}",
            f"   cols: {m.shape[1]}",
            "   dt: d",
            f"   data: [ {data} ]",
        ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# camera IO
# ---------------------------------------------------------------------------
def test_annots_camera_quirks(zju313_tree):
    cams = camera_utils.load_cam(
        os.path.join(zju313_tree, "CoreView_313", "annots.npy")
    )
    names = set(cams.keys())
    assert "Camera (1)" in names and "Camera (19)" in names
    # physical cams 20/21 renamed 22/23; 20/21 never exist
    assert {"Camera (22)", "Camera (23)"} <= names
    assert not {"Camera (20)", "Camera (21)"} & names
    assert len(names) == 21
    # T converted from millimeters
    raw = np.load(
        os.path.join(zju313_tree, "CoreView_313", "annots.npy"),
        allow_pickle=True,
    ).item()
    np.testing.assert_allclose(
        cams["Camera (1)"]["T"], np.asarray(raw["cams"]["T"][0]) / 1000.0
    )


def test_yml_camera_io(zju377_tree):
    cams = camera_utils.load_cameras(os.path.join(zju377_tree, "CoreView_377"))
    assert set(cams.keys()) == {f"Camera_B{c}" for c in (1, 2, 3, 4)}
    c = cams["Camera_B2"]
    assert c["K"].shape == (3, 3) and c["R"].shape == (3, 3)
    # R round-trips through the Rodrigues vector stored in extri.yml
    assert np.allclose(c["R"] @ c["R"].T, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(c["P"], c["K"] @ c["RT"], atol=1e-8)


# ---------------------------------------------------------------------------
# 313-style dataset
# ---------------------------------------------------------------------------
def test_313_train_split(zju313_tree):
    ds = Mocap(
        human="CoreView_313", ratio=RATIO, nrays=64, begin=0, end=2,
        train_views=(0,), data_dir=zju313_tree,
    )
    # raw frames 1..6 are 0-indexed 0..5; begin<=f<=end keeps 0,1,2
    assert len(ds) == 3
    item = ds[0]
    raw = int(os.path.basename(ds.all_img_path[0]).split("_")[4])
    assert item["frame"] == raw - 1          # 1-indexed -> 0-indexed
    assert item["cam_ind"] == 0              # "Camera (1)" -> 0
    # X-pose leg offsets applied to the zero input poses
    np.testing.assert_allclose(item["poses"][1, 2], -0.6, atol=1e-6)
    np.testing.assert_allclose(item["poses"][2, 2], 0.6, atol=1e-6)
    # sampled rgb equals the processed image at the sampled pixels
    np.testing.assert_allclose(
        item["rgb"], item["img"][item["coord"][:, 0], item["coord"][:, 1]]
    )
    assert item["rgb"].shape == (64, 3)
    assert (item["near"] < item["far"]).all()
    assert set(np.unique(item["occupancy"])) <= {0.0, 1.0}
    assert item["img"].shape == (int(H * RATIO), int(W * RATIO), 3)
    assert ds.canonical_vertex.shape == (len(ds.canonical_vertex), 3)


def test_313_eval_view_remap(zju313_tree):
    """Eval views 19/20 must resolve to the renamed 'Camera (22)/(23)' dirs
    (`zju_mocap_dataset.py:275-280`)."""
    ds = MocapView(
        human="CoreView_313", ratio=RATIO, begin=0, end=N_FRAMES,
        train_views=tuple(range(19)),  # leave only views 19/20 for eval
        train_max_frame=3, interval=1, data_dir=zju313_tree,
    )
    dirs = {p.split("/")[-2] for p in ds.all_img_path}
    assert dirs == {"Camera (22)", "Camera (23)"}
    assert len(ds) == 2 * N_FRAMES
    # sorted by frame within each view
    frames = [ds._frame_of(p) for p in ds.all_img_path[:N_FRAMES]]
    assert frames == sorted(frames)
    item = ds[0]
    # frame code is randomized into the train range for val items
    assert 0 <= item["frame"] < 3
    assert item["cam_ind"] == 21             # "Camera (22)" -> 21


def test_313_infer_splits(zju313_tree):
    novel_view = MocapInfer(
        human="CoreView_313", ratio=RATIO, begin=0, end=N_FRAMES,
        train_views=tuple(range(19)), train_max_frame=3, interval=1,
        eval_begin_frame=3, novel_pose=False, data_dir=zju313_tree,
    )
    novel_pose = MocapInfer(
        human="CoreView_313", ratio=RATIO, begin=0, end=N_FRAMES,
        train_views=tuple(range(19)), train_max_frame=3, interval=1,
        eval_begin_frame=3, novel_pose=True, data_dir=zju313_tree,
    )
    nv_frames = {novel_view._frame_of(p) for p in novel_view.all_img_path}
    np_frames = {novel_pose._frame_of(p) for p in novel_pose.all_img_path}
    assert nv_frames == {0, 1, 2}
    assert np_frames == {3, 4, 5}
    item = novel_pose[0]
    assert 0 <= item["frame"] < 3            # frame code randomized


def test_infer_runs_are_deterministic(zju313_tree):
    """Two fresh eval passes over the same tree must emit identical items —
    the reference seeds np.random globally with 233 (`main.py:22-26`) so its
    Mocap_infer frame codes (and hence test.py metrics) reproduce across
    runs; the datasets' own rngs are seeded to match."""
    def run():
        ds = MocapInfer(
            human="CoreView_313", ratio=RATIO, begin=0, end=N_FRAMES,
            train_views=tuple(range(19)), train_max_frame=3, interval=1,
            eval_begin_frame=3, novel_pose=True, data_dir=zju313_tree,
        )
        return [ds[i] for i in range(len(ds))]

    a, b = run(), run()
    assert [x["frame"] for x in a] == [y["frame"] for y in b]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["ray_o"], y["ray_o"])
        np.testing.assert_array_equal(x["rgb"], y["rgb"])

    # training sampling is reproducible the same way
    def train_run():
        ds = Mocap(
            human="CoreView_313", ratio=RATIO, nrays=64, begin=0,
            end=N_FRAMES, train_views=(0, 1), data_dir=zju313_tree,
        )
        return ds[1]

    x, y = train_run(), train_run()
    np.testing.assert_array_equal(x["coord"], y["coord"])


def test_decoded_image_cache_is_bit_identical(zju313_tree):
    """Items served from the epoch-persistent decoded-frame cache must be
    bit-identical to the uncached pipeline, across repeated fetches."""
    kw = dict(
        human="CoreView_313", ratio=RATIO, nrays=64, begin=0, end=N_FRAMES,
        train_views=(0,), data_dir=zju313_tree,
    )
    cached = Mocap(**kw, cache_images=True)
    uncached = Mocap(**kw, cache_images=False)
    assert cached.cache_images and not uncached.cache_images

    # decode products: cache hit equals a fresh uncached decode, bitwise
    path = cached.all_img_path[0]
    cached._decode_frame(path)   # populate
    img_a, fg_a, cihp_a = cached._decode_frame(path)
    img_b, fg_b, cihp_b = uncached._decode_frame(path)
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_array_equal(fg_a, fg_b)
    np.testing.assert_array_equal(cihp_a, cihp_b)
    assert path in cached._image_cache and not uncached._image_cache

    # full-item equality under identical rng state
    fresh_cached = Mocap(**kw, cache_images=True)
    fresh_cached[0]              # warm the cache
    fresh_cached.rng = np.random.default_rng(233)
    fresh_uncached = Mocap(**kw, cache_images=False)
    a = fresh_cached[0]
    b = fresh_uncached[0]
    for k in ("img", "rgb", "ray_o", "ray_d", "near", "far", "occupancy",
              "poses", "xyz", "bounds"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


# ---------------------------------------------------------------------------
# 377-style dataset
# ---------------------------------------------------------------------------
def test_377_train_split(zju377_tree):
    ds = Mocap(
        human="CoreView_377", ratio=RATIO, nrays=64, begin=0, end=3,
        train_views=(0, 2), data_dir=zju377_tree,
    )
    assert len(ds) == 2 * 4                  # 2 views x frames 0..3
    item = ds[0]
    raw = int(os.path.basename(ds.all_img_path[0])[:-4])
    assert item["frame"] == raw              # 0-indexed names: no shift
    assert item["cam_ind"] in (0, 2)         # "Camera_B1"/"Camera_B3"
    np.testing.assert_allclose(item["poses"][1, 2], -0.6, atol=1e-6)
    np.testing.assert_allclose(
        item["rgb"], item["img"][item["coord"][:, 0], item["coord"][:, 1]]
    )
    assert (item["near"] < item["far"]).all()


def test_377_view_split_skips_train_views(zju377_tree):
    ds = MocapView(
        human="CoreView_377", ratio=RATIO, begin=0, end=N_FRAMES,
        train_views=(0, 2), train_max_frame=N_FRAMES, interval=2,
        data_dir=zju377_tree,
    )
    dirs = {p.split("/")[-2] for p in ds.all_img_path}
    assert dirs == {"Camera_B2", "Camera_B4"}
    # every-2nd-frame interval over 6 frames = 3 per view
    assert len(ds) == 2 * 3
    frames = [ds._frame_of(p) for p in ds.all_img_path[:3]]
    assert frames == sorted(frames)


def test_377_fixed_vis_views(zju377_tree):
    """vis_views bypasses the train-view exclusion and keeps the true frame
    id (`zju_mocap_dataset.py:322-326`)."""
    ds = MocapView(
        human="CoreView_377", ratio=RATIO, begin=0, end=N_FRAMES,
        train_views=(0,), train_max_frame=N_FRAMES, interval=1,
        vis_views=[0], data_dir=zju377_tree,
    )
    dirs = {p.split("/")[-2] for p in ds.all_img_path}
    assert dirs == {"Camera_B1"}
    item = ds[2]
    assert item["frame"] == ds._frame_of(ds.all_img_path[2])


def test_zju_deterministic_items_order_independent(zju313_tree):
    """Multi-host contract on the REAL ZJU loader: with deterministic_items,
    an item's ray draw is a pure function of (seed, epoch, index) — reading
    items in different orders from different instances (as racing loader
    workers on different hosts would) yields bit-identical batches."""
    kw = dict(
        human="CoreView_313", ratio=RATIO, nrays=64, begin=0, end=N_FRAMES,
        train_views=(0,), data_dir=zju313_tree,
    )

    def make():
        ds = Mocap(**kw)
        ds.deterministic_items = True
        ds.set_epoch(3)
        return ds

    a, b = make(), make()
    item_a = a[0]             # a reads item 0 first
    _ = b[2]                  # b reads item 2 first...
    item_b = b[0]             # ...then 0: draws must not shift
    for k in ("coord", "rgb", "ray_d", "near", "far", "occupancy"):
        np.testing.assert_array_equal(item_a[k], item_b[k], err_msg=k)

    # epoch advance changes the draw (per-epoch variety is kept)
    c = make()
    c.set_epoch(4)
    assert not np.array_equal(item_a["coord"], c[0]["coord"])
