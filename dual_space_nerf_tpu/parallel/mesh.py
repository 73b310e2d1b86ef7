"""Device-mesh construction for ray-axis data parallelism.

The model is ~0.5M params, so the only parallelism worth having is data
parallelism over rays (SURVEY.md section 2): the per-step batch is sharded
along its ray axis, parameters and mesh geometry are replicated, and the
gradient all-reduce rides ICI via the psum XLA inserts under
`jax.jit(in_shardings=...)` (see training/state.py::make_train_step).

Scaling law: rays/step must be a multiple of the mesh size; use
`pad_rays_for_mesh` on the host-side nray count.
"""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh


def make_ray_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'rays'."""
    import jax

    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, ("rays",))


def local_ray_mesh(n: int | None = None) -> Mesh | None:
    """Mesh over local devices; None when only one device is present (the
    unsharded step is cheaper than a degenerate mesh)."""
    import jax

    # local, not global: on a multi-process slice jax.devices() spans all
    # hosts and a mesh over non-addressable devices breaks the jitted step
    devs = jax.local_devices()
    if n is not None:
        devs = devs[:n]
    if len(devs) <= 1:
        return None
    return Mesh(np.array(devs), ("rays",))


def pad_rays_for_mesh(nrays: int, mesh: Mesh | None) -> int:
    """Round nrays up to a multiple of the mesh size."""
    if mesh is None:
        return nrays
    n = mesh.devices.size
    return -(-nrays // n) * n
