"""Pure-JAX LPIPS vs an independent torch replica of the same architecture.

Pretrained weights cannot be downloaded here, so the math (conv
strides/padding, maxpools, scaling layer, channel unit-normalization,
lin-head weighting, spatial averaging, BGR->RGB input protocol) is verified
with RANDOM weights shared between both implementations — when real weights
from tool/convert_lpips_weights.py are supplied, the metric is the
reference's (`test.py:18-23, 77-85`).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dual_space_nerf_tpu.evaluation.lpips_jax import (

    _ALEX,
    _SCALE,
    _SHIFT,
    _VGG_SLICES,
    lpips_distance,
    make_lpips_jax,
)

# interpret-mode Pallas / torch-reference parity: the heavy tier.
# Fast CI runs 'pytest -m "not slow"'; the full battery runs everything.
pytestmark = pytest.mark.slow

_ALEX_CH = [64, 192, 384, 256, 256]
_VGG_CH = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]


def _random_params(net, rng):
    params = {}
    if net == "alex":
        specs = [(3, _ALEX_CH[0], 11)]
        for i in range(1, 5):
            specs.append((_ALEX_CH[i - 1], _ALEX_CH[i], _ALEX[i][0]))
        head_ch = _ALEX_CH
    else:
        specs, cin = [], 3
        for cout in _VGG_CH:
            specs.append((cin, cout, 3))
            cin = cout
        head_ch = [64, 128, 256, 512, 512]
    for i, (ci, co, k) in enumerate(specs):
        params[f"conv{i}/kernel"] = (
            rng.standard_normal((k, k, ci, co)) * 0.05
        ).astype(np.float32)
        params[f"conv{i}/bias"] = (
            rng.standard_normal(co) * 0.01
        ).astype(np.float32)
    for i, c in enumerate(head_ch):
        params[f"lin{i}/kernel"] = np.abs(
            rng.standard_normal((1, 1, c, 1)) * 0.1
        ).astype(np.float32)
    return params


def _torch_lpips(params, img0, img1, net):
    """Independent torch implementation from the same weights."""

    def conv(x, i, stride, pad):
        w = torch.tensor(params[f"conv{i}/kernel"]).permute(3, 2, 0, 1)
        b = torch.tensor(params[f"conv{i}/bias"])
        return F.conv2d(x, w, b, stride=stride, padding=pad)

    def feats(x):
        out = []
        if net == "alex":
            for i, (k, s, p, pool) in enumerate(_ALEX):
                if pool:
                    x = F.max_pool2d(x, 3, 2)
                x = F.relu(conv(x, i, s, p))
                out.append(x)
        else:
            ci = 0
            for si, n_convs in enumerate(_VGG_SLICES):
                if si > 0:
                    x = F.max_pool2d(x, 2, 2)
                for _ in range(n_convs):
                    x = F.relu(conv(x, ci, 1, 1))
                    ci += 1
                out.append(x)
        return out

    def prep(img):  # (H,W,3) RGB (-1,1) -> (1,3,H,W) scaled
        t = torch.tensor(img).permute(2, 0, 1)[None]
        shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
        return (t - shift) / scale

    f0, f1 = feats(prep(img0)), feats(prep(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        nb = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        w = torch.tensor(params[f"lin{i}/kernel"][0, 0, :, 0]).view(1, -1, 1, 1)
        total = total + ((na - nb) ** 2 * w).sum(1).mean()
    return float(total)


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_matches_torch_replica(net, rng_np):
    params = _random_params(net, rng_np)
    h = 64 if net == "alex" else 32  # alex needs >= 63px for 5 convs
    img0 = rng_np.random((h, h, 3)).astype(np.float32) * 2 - 1
    img1 = rng_np.random((h, h, 3)).astype(np.float32) * 2 - 1

    import jax.numpy as jnp

    got = float(
        lpips_distance(
            {k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(img0), jnp.asarray(img1), net=net,
        )
    )
    want = _torch_lpips(params, img0, img1, net)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    assert got > 0


def test_identical_images_give_zero(rng_np):
    params = _random_params("alex", rng_np)
    import jax.numpy as jnp

    img = rng_np.random((64, 64, 3)).astype(np.float32)
    d = float(
        lpips_distance(
            {k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(img), jnp.asarray(img), net="alex",
        )
    )
    assert abs(d) < 1e-7


def test_make_lpips_jax_roundtrip(tmp_path, rng_np):
    """npz save/load + the [0,1]-BGR input protocol."""
    params = _random_params("alex", rng_np)
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **{"meta/net": np.str_("alex")}, **params)

    fn = make_lpips_jax("alex", str(path))
    assert fn is not None
    # directory form resolves lpips_{net}.npz
    fn_dir = make_lpips_jax("alex", str(tmp_path))
    assert fn_dir is not None
    # mismatched net gated off
    assert make_lpips_jax("vgg", str(path)) is None
    assert make_lpips_jax("alex", "") is None

    pred = rng_np.random((64, 64, 3)).astype(np.float32)
    gt = rng_np.random((64, 64, 3)).astype(np.float32)
    d = fn(pred, gt)
    assert np.isfinite(d) and d > 0
    # BGR->RGB flip + (-1,1) scaling must match the manual protocol
    import jax.numpy as jnp

    manual = float(
        lpips_distance(
            {k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(2 * pred[..., ::-1] - 1),
            jnp.asarray(2 * gt[..., ::-1] - 1),
            net="alex",
        )
    )
    np.testing.assert_allclose(d, manual, rtol=1e-6)


@pytest.mark.parametrize("net,h", [("alex", 64), ("vgg", 32)])
def test_lpips_matches_committed_golden(net, h):
    """Numerics pinned by a COMMITTED fixture (tests/fixtures/
    lpips_golden.npz): deterministic weights (seed 77) + images (seeds
    101/202) must reproduce the recorded score and per-layer feature
    stats bit-for-bit at f64 print precision. This gives the first
    real-weights run of tool/convert_lpips_weights.py a harness whose own
    numerics are provably unchanged since this recording."""
    import os

    import jax.numpy as jnp

    from dual_space_nerf_tpu.evaluation.lpips_jax import (
        _SCALE as scale,
        _SHIFT as shift,
        _features,
    )

    fx = np.load(
        os.path.join(os.path.dirname(__file__), "fixtures",
                     "lpips_golden.npz")
    )
    params = _random_params(net, np.random.default_rng(77))
    img0 = (np.random.default_rng(101).random((h, h, 3)).astype(np.float32)
            * 2 - 1)
    img1 = (np.random.default_rng(202).random((h, h, 3)).astype(np.float32)
            * 2 - 1)
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    score = float(
        lpips_distance(jp, jnp.asarray(img0), jnp.asarray(img1), net=net)
    )
    np.testing.assert_allclose(score, float(fx[f"{net}/score"]), rtol=1e-5)

    x = ((jnp.asarray(img0) - jnp.asarray(shift)) / jnp.asarray(scale))[None]
    feats = _features(jp, x, net)
    for i, f in enumerate(feats):
        fa = np.asarray(f)
        np.testing.assert_allclose(
            fa.mean(), float(fx[f"{net}/feat{i}_mean"]), rtol=1e-5,
            err_msg=f"{net} feat{i} mean",
        )
        np.testing.assert_allclose(
            np.abs(fa).max(), float(fx[f"{net}/feat{i}_absmax"]), rtol=1e-5,
            err_msg=f"{net} feat{i} absmax",
        )
