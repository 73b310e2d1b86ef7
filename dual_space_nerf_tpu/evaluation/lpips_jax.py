"""Pure-JAX LPIPS (alex / vgg16) — no torch at eval time.

The reference's headline perceptual metric (`test.py:18-23, 77-85`) is the
`lpips` package: a frozen AlexNet/VGG16 feature stack, unit-normalized
channel activations, squared differences weighted by learned 1x1 "lin"
convs, spatially averaged and summed over layers. This module reimplements
that computation in jnp/XLA from a weights .npz (pretrained weights cannot
be downloaded here; `tool/convert_lpips_weights.py` dumps the npz on any
machine with torch + lpips installed).

Input protocol matches the reference exactly: HxWx3 images in [0, 1] BGR
(cv2 order) are flipped to RGB and scaled to (-1, 1) before the network.

npz schema (all arrays f32):
  meta/net            "alex" | "vgg"
  convN/kernel        (H, W, Cin, Cout)   feature convs, HWIO
  convN/bias          (Cout,)
  linN/kernel         (1, 1, C, 1)        LPIPS heads, N = 0..4
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants (RGB order)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (kernel, stride, pad, pool_before) per conv, torchvision .features layout
_ALEX = [
    (11, 4, 2, False),  # conv1 -> relu        (64)
    (5, 1, 2, True),    # pool, conv2 -> relu  (192)
    (3, 1, 1, True),    # pool, conv3 -> relu  (384)
    (3, 1, 1, False),   # conv4 -> relu        (256)
    (3, 1, 1, False),   # conv5 -> relu        (256)
]
# vgg16: conv count per slice (all k3 s1 p1), pool between slices
_VGG_SLICES = [2, 2, 3, 3, 3]


def _conv(x, kernel, bias, stride, pad):
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -np.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _features(params, x, net: str):
    """x (1, H, W, 3) RGB in (-1, 1) -> list of 5 feature maps."""
    feats = []
    if net == "alex":
        for i, (k, s, p, pool) in enumerate(_ALEX):
            if pool:
                x = _maxpool(x)
            x = _conv(x, params[f"conv{i}/kernel"], params[f"conv{i}/bias"], s, p)
            x = jax.nn.relu(x)
            feats.append(x)
    elif net == "vgg":
        ci = 0
        for si, n_convs in enumerate(_VGG_SLICES):
            if si > 0:
                x = _maxpool(x, k=2, s=2)
            for _ in range(n_convs):
                x = _conv(
                    x, params[f"conv{ci}/kernel"], params[f"conv{ci}/bias"], 1, 1
                )
                x = jax.nn.relu(x)
                ci += 1
            feats.append(x)
    else:
        raise ValueError(f"unknown lpips net {net!r}")
    return feats


@functools.partial(jax.jit, static_argnames=("net",))
def lpips_distance(params, img0, img1, net: str = "alex"):
    """img0/img1 (H, W, 3) RGB in (-1, 1) -> scalar LPIPS distance."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def prep(img):
        return ((img - shift) / scale)[None]  # (1, H, W, 3)

    f0 = _features(params, prep(img0), net)
    f1 = _features(params, prep(img1), net)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        # unit-normalize along channels (lpips.normalize_tensor, eps 1e-10)
        na = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        w = params[f"lin{i}/kernel"][0, 0, :, 0]
        total = total + jnp.mean(jnp.sum(diff * w, axis=-1))
    return total


def load_lpips_params(npz_path: str):
    """Load the converted weights npz -> (params dict, net name)."""
    data = np.load(npz_path, allow_pickle=False)
    net = str(data["meta/net"]) if "meta/net" in data else "alex"
    params = {
        k: jnp.asarray(v) for k, v in data.items() if not k.startswith("meta")
    }
    return params, net


def make_lpips_jax(net: str = "alex", weights_path: str = ""):
    """Returns fn(pred_hw3, gt_hw3) -> float (inputs [0,1] BGR), or None.

    weights_path may be a single npz (its meta/net must match) or a
    directory holding lpips_{net}.npz.
    """
    path = weights_path
    if path and os.path.isdir(path):
        path = os.path.join(path, f"lpips_{net}.npz")
    if not path or not os.path.exists(path):
        return None
    params, stored_net = load_lpips_params(path)
    if stored_net != net:
        return None

    def run(pred: np.ndarray, gt: np.ndarray) -> float:
        # [0,1] BGR -> (-1,1) RGB (test.py:77-81)
        p = jnp.asarray(2.0 * pred[..., ::-1] - 1.0, jnp.float32)
        g = jnp.asarray(2.0 * gt[..., ::-1] - 1.0, jnp.float32)
        return float(lpips_distance(params, p, g, net=net))

    return run
