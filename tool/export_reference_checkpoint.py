#!/usr/bin/env python3
"""Export a framework checkpoint to the reference's torch format.

Inverse of ``tool/convert_reference_checkpoint.py``: reads a ``.ckpt``
written by ``training/checkpoint.py`` (flax msgpack of
{params, opt_state, step, epoch}) and writes a ``model_epoch_*.pth``-style
payload ``{"model": state_dict, "training_status": {...}}`` (reference
``utils/checkpoint.py:113-118``) that the reference's eval scripts load via
``torch.load(ckpt)["model"]`` (``validate.py:18-28``) — so avatars trained
on TPU can be rendered with the original CUDA stack.

Usage:
    python tool/export_reference_checkpoint.py in.ckpt out.pth
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tool.convert_reference_checkpoint import _LINEAR_MAP  # noqa: E402


def export_state_dict(params: dict) -> dict:
    """Flax params tree -> reference-named torch state_dict (torch
    tensors; weights transposed back to torch's (out, in))."""
    import torch

    p = params["params"] if "params" in params else params
    sd = {}
    for prefix, module, ours, theirs in _LINEAR_MAP:
        for i, j in zip(ours, theirs):
            node = p[module][f"Dense_{i}"]["Dense_0"]
            w = np.asarray(node["kernel"], np.float32)
            b = np.asarray(node["bias"], np.float32)
            sd[f"{prefix}.{j}.weight"] = torch.tensor(w.T.copy())
            sd[f"{prefix}.{j}.bias"] = torch.tensor(b)
    emb = p["nerf"].get("embedding")
    if emb is not None:
        sd["nerf.embedding.weight"] = torch.tensor(
            np.asarray(emb["embedding"], np.float32)
        )
    return sd


def export_file(in_path: str, out_path: str) -> dict:
    import torch

    from flax import serialization

    with open(in_path, "rb") as f:
        payload = serialization.msgpack_restore(bytearray(f.read()))
    sd = export_state_dict(payload["params"])
    torch.save(
        {
            "model": sd,
            "training_status": {
                "epoch": int(payload.get("epoch", 0)),
                "iteration": int(payload.get("step", 0)),
            },
        },
        out_path,
    )
    return sd


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="framework .ckpt")
    ap.add_argument("output", help="output reference-format .pth")
    args = ap.parse_args()
    sd = export_file(args.input, args.output)
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"wrote {args.output}: {len(sd)} tensors, {n} params")


if __name__ == "__main__":
    main()
