"""Metric tests: PSNR and the skimage-compatible SSIM."""

import numpy as np

from dual_space_nerf_tpu.evaluation import psnr, ssim, ssim_metric


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(psnr(a, b), 20.0, atol=1e-6)


def test_psnr_mask():
    a = np.zeros((4, 4, 3))
    b = a.copy()
    b[0, 0] = 1.0  # error only outside mask
    mask = np.ones((4, 4), bool)
    mask[0, 0] = False
    assert psnr(a, b, mask[..., None] * np.ones(3, bool)) > 100


def test_ssim_identical_is_one(rng_np):
    img = rng_np.random((32, 32, 3))
    np.testing.assert_allclose(ssim(img, img), 1.0, atol=1e-9)


def test_ssim_decreases_with_noise(rng_np):
    img = rng_np.random((64, 64, 3))
    s1 = ssim(img, np.clip(img + 0.05 * rng_np.standard_normal(img.shape), 0, 1))
    s2 = ssim(img, np.clip(img + 0.3 * rng_np.standard_normal(img.shape), 0, 1))
    assert 1.0 > s1 > s2 > 0.0


def test_ssim_matches_closed_form_constant_shift():
    """For constant images x and x+d: SSIM = (2 x (x+d) + c1) / (x^2 + (x+d)^2 + c1)."""
    x, d = 0.4, 0.2
    img1 = np.full((32, 32), x)
    img2 = np.full((32, 32), x + d)
    c1 = 0.01**2
    want = (2 * x * (x + d) + c1) / (x * x + (x + d) ** 2 + c1)
    np.testing.assert_allclose(ssim(img1, img2), want, atol=1e-6)


def test_ssim_metric_protocol(rng_np):
    pred = rng_np.random((48, 48, 3)).astype(np.float32)
    mask = np.zeros((48, 48), bool)
    mask[10:30, 12:40] = True
    val = ssim_metric(pred, pred.copy(), mask)
    np.testing.assert_allclose(val, 1.0, atol=1e-9)


def test_ssim_metric_uses_reference_data_range(rng_np):
    """The reference's compare_ssim call on float images uses skimage's
    float dtype_range (-1, 1) -> data_range 2 (`metrics.py:38`); ssim_metric
    must reproduce that, not the unit-range value."""
    import cv2

    img = rng_np.random((32, 32, 3))
    noisy = np.clip(img + 0.1 * rng_np.standard_normal(img.shape), 0, 1)
    mask = np.zeros((32, 32), bool)
    mask[4:28, 6:30] = True
    got = ssim_metric(img, noisy, mask)

    zp = np.zeros_like(img)
    zp[mask] = img[mask]
    zg = np.zeros_like(noisy)
    zg[mask] = noisy[mask]
    x, y, w, h = cv2.boundingRect(mask.astype(np.uint8))
    want2 = ssim(zp[y:y + h, x:x + w], zg[y:y + h, x:x + w], data_range=2.0)
    want1 = ssim(zp[y:y + h, x:x + w], zg[y:y + h, x:x + w], data_range=1.0)
    np.testing.assert_allclose(got, want2, atol=1e-12)
    assert abs(got - want1) > 1e-4  # the ranges genuinely differ


def test_ssim_metric_degenerate_masks(rng_np):
    """Empty masks and bounding rects narrower than the 7x7 window must
    return finite values (the reference crashes / NaNs here)."""
    img = rng_np.random((32, 32, 3))
    empty = np.zeros((32, 32), bool)
    assert ssim_metric(img, img, empty) == 1.0

    tiny = np.zeros((32, 32), bool)
    tiny[10:13, 0:2] = True  # 3x2 rect at the image edge
    val = ssim_metric(img, img.copy(), tiny)
    assert np.isfinite(val)
