"""Geometry-guided near/far tightening as a Pallas kernel.

Behavioral equivalent of `geometry/sampling.py::gg_near_far` (reference
`utils/pts_utils.py:18-54`), which intersects every ray with gamma-spheres
around all V mesh vertices. The XLA form materializes a (V, R) intermediate
through several fusions; this kernel keeps the vertex table resident in VMEM
(6890 x 3 = 83 KB) and streams ray blocks, producing only the per-ray
(near, far) pair — one pass, no HBM intermediate.

Semantics preserved exactly: shared ray origin ray_o[0] (pinhole assumption,
`pts_utils.py:31`), sphere-space z divided by ||ray_d||, untouched rays keep
their AABB near/far.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_R = 256
_BIG = 99999.0


_BLOCK_V = 1024


def _gg_kernel(dirs_ref, rel_ref, out_ref, *, gamma2, n_v_tiles):
    """dirs (R_B, 3) unit ray dirs; rel (4, V_pad): rows 0..2 = verts - o
    (padded cols at 0 with |v|^2 = 1e18 so they are never inside), row 3 =
    |verts - o|^2; out (R_B, 2) = (z_min, z_max) in unit-direction units.
    The vertex axis is tiled so the (R_B, V-tile) temporaries fit VMEM."""
    dx = dirs_ref[:, 0:1]
    dy = dirs_ref[:, 1:2]
    dz = dirs_ref[:, 2:3]

    def body(t, carry):
        z_min, z_max = carry
        s = t * _BLOCK_V
        vx = rel_ref[0:1, pl.ds(s, _BLOCK_V)]
        vy = rel_ref[1:2, pl.ds(s, _BLOCK_V)]
        vz = rel_ref[2:3, pl.ds(s, _BLOCK_V)]
        v2 = rel_ref[3:4, pl.ds(s, _BLOCK_V)]
        z0 = dx * vx + dy * vy + dz * vz               # (R_B, BV)
        d2 = v2 - z0 * z0
        inside = d2 < gamma2
        delta = jnp.sqrt(jnp.maximum(gamma2 - d2, 0.0))
        z_min = jnp.minimum(
            z_min,
            jnp.min(jnp.where(inside, z0 - delta, _BIG), -1, keepdims=True),
        )
        z_max = jnp.maximum(
            z_max,
            jnp.max(jnp.where(inside, z0 + delta, -_BIG), -1, keepdims=True),
        )
        return z_min, z_max

    init = (
        jnp.full((dirs_ref.shape[0], 1), _BIG, jnp.float32),
        jnp.full((dirs_ref.shape[0], 1), -_BIG, jnp.float32),
    )
    z_min, z_max = jax.lax.fori_loop(0, n_v_tiles, body, init)
    out_ref[:, 0:1] = z_min
    out_ref[:, 1:2] = z_max


@functools.partial(jax.jit, static_argnames=("gamma", "interpret"))
def gg_near_far_pallas(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    verts: jnp.ndarray,
    gamma: float = 0.05,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for geometry.sampling.gg_near_far on TPU."""
    r = ray_o.shape[0]
    v = verts.shape[0]
    r_pad = -(-r // _BLOCK_R) * _BLOCK_R
    v_pad = -(-v // _BLOCK_V) * _BLOCK_V
    n_v_tiles = v_pad // _BLOCK_V

    norm_ray = jnp.linalg.norm(ray_d, axis=-1)
    dirs = ray_d / norm_ray[..., None]
    dirs_p = jnp.pad(dirs.astype(jnp.float32), ((0, r_pad - r), (0, 0)))

    rel = (verts - ray_o[0]).astype(jnp.float32)       # shared-origin semantic
    # padded columns: rel = 0 (so z0 = 0, no overflow) with |v|^2 = 1e18 so
    # d2 = 1e18 >> gamma^2 and they are never inside a sphere
    rel_t = jnp.zeros((4, v_pad), jnp.float32)
    rel_t = jax.lax.dynamic_update_slice(rel_t, rel.T, (0, 0))
    v2_row = jnp.full((1, v_pad), jnp.float32(1e18))
    v2_row = jax.lax.dynamic_update_slice(
        v2_row, jnp.sum(rel * rel, -1)[None], (0, 0)
    )
    rel_t = jax.lax.dynamic_update_slice(rel_t, v2_row, (3, 0))

    out = pl.pallas_call(
        functools.partial(
            _gg_kernel, gamma2=float(gamma) ** 2, n_v_tiles=n_v_tiles
        ),
        grid=(r_pad // _BLOCK_R,),
        in_specs=[
            pl.BlockSpec((_BLOCK_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, v_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_R, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, 2), jnp.float32),
        interpret=interpret,
    )(dirs_p, rel_t)

    z_min = out[:r, 0] / norm_ray
    z_max = out[:r, 1] / norm_ray
    hit = jnp.logical_and(out[:r, 0] < _BIG, z_min < z_max)
    return jnp.where(hit, z_min, near), jnp.where(hit, z_max, far)
