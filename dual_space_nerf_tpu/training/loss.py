"""Photometric losses.

Behavioral reference: `utils/loss.py:4-49` — MSE or SmoothL1 on ray RGB,
plus an optional 0.1-weighted L1 mask loss on the accumulated opacity where
rays inside the foreground mask are snapped to 1 before the comparison
(`loss.py:24-25`).
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.SmoothL1Loss with beta=1 (elementwise mean)."""
    diff = jnp.abs(pred - target)
    return jnp.mean(jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5))


def make_loss(loss_type: str = "L2", with_mask: bool = False):
    """Returns loss_fn(outputs: dict, rgb_gt (R,3), occupancy (R,)) -> dict."""

    def loss_fn(outputs, rgb_gt, occupancy=None):
        color = outputs["color"]
        if loss_type == "L1":
            loss_rgb = smooth_l1(color, rgb_gt)
        else:
            loss_rgb = jnp.mean((color - rgb_gt) ** 2)
        losses = {"loss_rgb": loss_rgb}
        if with_mask and occupancy is not None:
            occ = occupancy.astype(color.dtype)
            acc = outputs["acc_map"]
            # rays known to be foreground contribute no opacity penalty
            acc = jnp.where(occ == 1, 1.0, acc)
            losses["loss_mask"] = 0.1 * jnp.mean(jnp.abs(acc - occ))
        return losses

    return loss_fn
