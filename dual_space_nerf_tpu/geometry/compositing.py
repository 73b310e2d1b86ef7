"""Volume-rendering alpha compositing (NeRF `raw2outputs`).

Behavioral reference: `utils/nerf_net_utils.py:5-56`. Notably:
- rgb is NOT sigmoid-squashed (the LightingMLP output is unbounded and only
  clamped at eval, `test.py:62`);
- transmittance uses cumprod of (1 - alpha + 1e-10) with a leading 1;
- the final interval is 1e10 and all intervals are scaled by ||ray_d||.

Functional, static-shaped, differentiable; noise is passed via an explicit
PRNG key rather than global state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RayOutputs(NamedTuple):
    rgb: jnp.ndarray        # (R, 3)
    disp: jnp.ndarray       # (R,)
    acc: jnp.ndarray        # (R,)
    weights: jnp.ndarray    # (R, S)
    depth: jnp.ndarray      # (R,)


def composite(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise_std: float = 0.0,
    rng: jax.Array | None = None,
    white_bkgd: bool = False,
) -> RayOutputs:
    """Alpha-composite per-sample (rgb, sigma) into per-ray outputs.

    rgb: (R, S, 3); sigma: (R, S); z_vals: (R, S); rays_d: (R, 3).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )  # (R, S)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if noise_std > 0.0 and rng is not None:
        sigma = sigma + jax.random.normal(rng, sigma.shape, sigma.dtype) * noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)  # (R, S)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RayOutputs(rgb_map, disp_map, acc_map, weights, depth_map)
