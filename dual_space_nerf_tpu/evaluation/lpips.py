"""LPIPS perceptual metric (gated).

The reference computes LPIPS(alex) and LPIPS(vgg) at formal test time
(`test.py:18-23, 77-85`) using pretrained CNNs. Pretrained weights cannot be
downloaded in an air-gapped environment, so this wrapper:

1. runs the pure-JAX implementation (evaluation/lpips_jax.py) from a
   weights npz at `cfg.TEST.LPIPS_WEIGHTS` (see
   tool/convert_lpips_weights.py) — no torch at eval time;
2. else uses the `lpips` torch package if installed and its weights resolve;
3. else loads a user-provided torchscript module from the same path;
4. otherwise reports None and eval scripts skip the metric.

Inputs follow the reference protocol: RGB in (-1, 1), BGR->RGB flipped
before the call.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np


def make_lpips(net: str = "alex", weights_path: str = "") -> Callable | None:
    """Returns fn(pred_hw3, gt_hw3) -> float, images in [0,1] BGR, or None."""
    if weights_path:
        from .lpips_jax import make_lpips_jax

        try:
            fn = make_lpips_jax(net, weights_path)
        except Exception:
            fn = None
        if fn is not None:
            return fn
    try:
        import lpips as _lpips  # optional dependency
        import torch

        model = _lpips.LPIPS(net=net)
        model.eval()

        def run(pred: np.ndarray, gt: np.ndarray) -> float:
            with torch.no_grad():
                p = _to_tensor(pred)
                g = _to_tensor(gt)
                return float(model(p, g).squeeze())

        return run
    except Exception:
        pass

    if weights_path and os.path.exists(weights_path):
        try:
            import torch

            model = torch.jit.load(weights_path, map_location="cpu")
            model.eval()

            def run(pred: np.ndarray, gt: np.ndarray) -> float:
                with torch.no_grad():
                    return float(model(_to_tensor(pred), _to_tensor(gt)).squeeze())

            return run
        except Exception:
            return None
    return None


def _to_tensor(img_hw3: np.ndarray):
    """[0,1] BGR HxWx3 -> (-1,1) RGB 1x3xHxW torch tensor (test.py:77-81)."""
    import torch

    t = torch.from_numpy(np.ascontiguousarray(img_hw3)).float()
    t = (2.0 * t - 1.0).permute(2, 0, 1)[None]
    return t.flip(1)  # BGR -> RGB
