#!/usr/bin/env python3
"""Convert a reference Dual-Space-NeRF torch checkpoint to this framework.

The reference trainer saves ``{"model": model.state_dict(), ...}`` as
``model_epoch_%07d.pth`` (reference ``utils/checkpoint.py:114``,
``trainer.py:119``). This tool maps that state_dict onto the flax parameter
tree used here and writes a ``.ckpt`` loadable by every eval CLI
(``validate.py`` / ``test.py`` / ``novel_pose_vis.py`` / ``vis_lighting.py``
via ``Checkpointer.load_params_only``), so avatars trained with the torch
reference can be rendered, relit, and motion-transferred on TPU without
retraining.

Name map (torch ``(out, in)`` Linear weights are transposed to flax
``(in, out)`` kernels; reference module layout ``model/spacenet.py:18-205``):

    nerf.embedding.weight            -> nerf/embedding/embedding
    nerf.stage1.{0,2,4,6}            -> nerf/Dense_{0..3}/Dense_0
    nerf.stage2.{0,2,4}              -> nerf/Dense_{4..6}/Dense_0
    nerf.density_net.0               -> nerf/Dense_7/Dense_0
    nerf.rgb_net.{1,3}               -> nerf/Dense_{8,9}/Dense_0
    lighting_mlp.lights_encoding.{0,2,4} -> lighting_mlp/Dense_{0..2}/Dense_0
    pose_mlp.{0,2,4}                 -> pose_mlp/Dense_{0..2}/Dense_0

Usage:
    python tool/convert_reference_checkpoint.py in.pth out.ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (reference prefix, our module, our Dense indices)
_LINEAR_MAP = [
    ("nerf.stage1", "nerf", [0, 1, 2, 3], [0, 2, 4, 6]),
    ("nerf.stage2", "nerf", [4, 5, 6], [0, 2, 4]),
    ("nerf.density_net", "nerf", [7], [0]),
    ("nerf.rgb_net", "nerf", [8, 9], [1, 3]),
    ("lighting_mlp.lights_encoding", "lighting_mlp", [0, 1, 2], [0, 2, 4]),
    ("pose_mlp", "pose_mlp", [0, 1, 2], [0, 2, 4]),
]


def convert_state_dict(sd: dict) -> dict:
    """Reference ``model.state_dict()`` -> flax params tree (numpy f32)."""
    tree: dict = {"nerf": {}, "lighting_mlp": {}, "pose_mlp": {}}

    def arr(key):
        v = sd[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return np.asarray(v, np.float32)

    for prefix, module, ours, theirs in _LINEAR_MAP:
        for i, j in zip(ours, theirs):
            w = arr(f"{prefix}.{j}.weight")  # (out, in)
            b = arr(f"{prefix}.{j}.bias")
            tree[module][f"Dense_{i}"] = {
                "Dense_0": {"kernel": w.T.copy(), "bias": b}
            }
    if "nerf.embedding.weight" in sd:
        tree["nerf"]["embedding"] = {"embedding": arr("nerf.embedding.weight")}
    return {"params": tree}


def convert_file(in_path: str, out_path: str) -> dict:
    import torch

    from flax import serialization

    payload = torch.load(in_path, map_location="cpu", weights_only=True)
    sd = payload.get("model", payload) if isinstance(payload, dict) else payload
    epoch = 0
    status = payload.get("training_status") if isinstance(payload, dict) else None
    if isinstance(status, dict):
        epoch = int(status.get("epoch", 0))

    params = convert_state_dict(sd)
    out = {"params": params, "opt_state": {}, "step": 0, "epoch": epoch}
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(out))
    return params


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="reference model_epoch_*.pth")
    ap.add_argument("output", help="output .ckpt for this framework")
    args = ap.parse_args()
    params = convert_file(args.input, args.output)
    n = sum(
        int(np.prod(v.shape))
        for v in __import__("jax").tree_util.tree_leaves(params)
    )
    print(f"wrote {args.output}: {n} params")


if __name__ == "__main__":
    main()
