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
