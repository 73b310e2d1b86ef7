"""Camera parameter IO for ZJU-MoCap (numpy/cv2).

Behavioral reference: `utils/camera_utils.py` — intri.yml/extri.yml
(cv2.FileStorage) for most subjects (`read_camera:93-119`,
`load_cameras:194-204`), annots.npy for CoreView_313/315 with T/1000 scaling
and the camera 20/21 -> 22/23 renaming quirk (`load_cam:208-244`).
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np


class Undistorter:
    """Bit-exact, map-cached replacement for per-frame ``cv2.undistort``.

    ``cv2.undistort(img, K, D)`` recomputes the distortion maps on every
    call, but per camera they are constant across a sequence. This builds
    ``cv2.initUndistortRectifyMap`` maps once per (K, D, image size) in the
    fixed-point CV_16SC2 encoding — the same one ``cv2.undistort`` uses
    internally — so ``cv2.remap`` returns a **bitwise-identical** image
    (tests/test_data.py::test_undistorter_bitwise) at roughly half the
    per-frame cost. All-zero distortion is an exact no-op (the map is the
    identity and bilinear interpolation at integer coordinates is a copy),
    so it skips the remap entirely.

    Maps cost ~6 MB per (camera, size) at 1024x1024; a full ZJU rig (~23
    cameras) caches ~140 MB, well within a TPU host's RAM. Shared use from
    prefetch worker threads is safe: entries are immutable once inserted
    and a lost race merely recomputes a map.

    Behavioral reference: the per-frame `cv2.undistort` calls at
    `dataloader/zju_mocap_dataset.py:120` (image) / `:100` (mask) and
    `dataloader/h36m_dataset.py:116-119`.
    """

    def __init__(self) -> None:
        self._maps: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}

    def __call__(self, img: np.ndarray, K, D) -> np.ndarray:
        D = np.asarray(D, np.float64).ravel()
        if not D.any():
            return img
        K = np.asarray(K, np.float64)
        h, w = img.shape[:2]
        key = (K.tobytes(), D.tobytes(), w, h)
        maps = self._maps.get(key)
        if maps is None:
            maps = cv2.initUndistortRectifyMap(
                K, D, None, K, (w, h), cv2.CV_16SC2
            )
            self._maps[key] = maps
        return cv2.remap(img, maps[0], maps[1], cv2.INTER_LINEAR)


#: process-wide map cache shared by every dataset instance
undistort = Undistorter()


def _read_string_list(fs: cv2.FileStorage, key: str) -> list[str]:
    node = fs.getNode(key)
    out = []
    for i in range(node.size()):
        val = node.at(i).string()
        if val == "":
            val = str(int(node.at(i).real()))
        if val != "none":
            out.append(val)
    return out


def read_camera(intri_name: str, extri_name: str) -> dict:
    """Read {cam_name: {K, invK, R, T, RT, P, dist}} from OpenCV yml files."""
    assert os.path.exists(intri_name), intri_name
    assert os.path.exists(extri_name), extri_name
    intri = cv2.FileStorage(intri_name, cv2.FILE_STORAGE_READ)
    extri = cv2.FileStorage(extri_name, cv2.FILE_STORAGE_READ)
    cam_names = _read_string_list(intri, "names")
    cams: dict = {}
    for cam in cam_names:
        K = intri.getNode(f"K_{cam}").mat()
        Rvec = extri.getNode(f"R_{cam}").mat()
        Tvec = extri.getNode(f"T_{cam}").mat()
        R = cv2.Rodrigues(Rvec)[0]
        RT = np.hstack((R, Tvec))
        cams[cam] = {
            "K": K,
            "invK": np.linalg.inv(K),
            "R": R,
            "T": Tvec,
            "RT": RT,
            "P": K @ RT,
            "dist": intri.getNode(f"dist_{cam}").mat(),
        }
    cams["basenames"] = cam_names
    intri.release()
    extri.release()
    return cams


def load_cameras(path: str) -> dict | None:
    intri_name = os.path.join(path, "intri.yml")
    extri_name = os.path.join(path, "extri.yml")
    if os.path.exists(intri_name) and os.path.exists(extri_name):
        cameras = read_camera(intri_name, extri_name)
        cameras.pop("basenames")
        return cameras
    raise FileNotFoundError(f"no camera parameters under {path}")


def load_cam(ann_file: str) -> dict:
    """annots.npy/json camera table for CoreView_313/315.

    Quirks preserved: T is millimeters -> /1000; physical cameras 20/21 are
    named "Camera (22)"/"Camera (23)" (`camera_utils.py:225-231`).
    """
    if ann_file.endswith(".json"):
        annots = json.load(open(ann_file, "r"))
        cams = annots["cams"]["20190823"]
    else:
        annots = np.load(ann_file, allow_pickle=True).item()
        cams = annots["cams"]

    ret = {}
    for i in range(len(cams["K"])):
        t = i + 1
        if t in (20, 21):
            t += 2
        k = np.array(cams["K"][i])
        r = np.array(cams["R"][i])
        tv = np.array(cams["T"][i]) / 1000.0
        rt = np.concatenate([r, tv], 1)  # 3x4, same schema as read_camera
        ret[f"Camera ({t})"] = {
            "K": k,
            "invK": np.linalg.inv(k),
            "R": r,
            "T": tv,
            "RT": rt,
            "P": k @ rt,
            "dist": np.array(cams["D"][i]).reshape(1, 5),
        }
    return ret
