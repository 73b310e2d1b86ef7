#!/usr/bin/env python3
"""Dump lpips alex/vgg weights to the npz schema of evaluation/lpips_jax.py.

Run on any machine with `torch` and `lpips` installed (this air-gapped
environment has neither the package nor its pretrained downloads):

    python tool/convert_lpips_weights.py --net alex --out lpips_alex.npz
    python tool/convert_lpips_weights.py --net vgg  --out lpips_vgg.npz

then point `cfg.TEST.LPIPS_WEIGHTS` at the npz (or at a directory holding
lpips_alex.npz / lpips_vgg.npz) and `test.py` reports LPIPS with no torch
import at eval time. Reference metric: `test.py:18-23, 77-85`.
"""

from __future__ import annotations

import argparse


def convert(net: str, out: str) -> None:
    import lpips
    import numpy as np
    import torch

    model = lpips.LPIPS(net=net)
    model.eval()

    arrays: dict = {"meta/net": np.str_(net)}

    convs = [
        m for m in model.net.modules() if isinstance(m, torch.nn.Conv2d)
    ]
    for i, conv in enumerate(convs):
        # torch OIHW -> HWIO
        arrays[f"conv{i}/kernel"] = (
            conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        arrays[f"conv{i}/bias"] = conv.bias.detach().numpy()

    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        arrays[f"lin{i}/kernel"] = w.transpose(2, 3, 1, 0)  # (1, 1, C, 1)

    np.savez(out, **arrays)
    print(f"wrote {out}: {len(arrays) - 1} arrays for net={net}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", choices=("alex", "vgg"), default="alex")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    convert(args.net, args.out)
