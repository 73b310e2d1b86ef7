"""Multi-process (multi-host) data parallelism over rays.

Fills the DCN half of SURVEY.md section 2's parallelism equivalent: grad
psum "over ICI (single pod) / DCN (multi-slice)". One JAX process per host
joins a `jax.distributed` cluster; the ray mesh then spans EVERY process's
devices, parameters/optimizer state are replicated, each per-ray batch leaf
is assembled as a global `jax.Array` from host data, and the SAME jitted
step as the single-process path (training/state.py::make_train_step) runs
SPMD — XLA routes the gradient psum over ICI within a slice and DCN across
slices, with no hand-written collective.

Host data story: every process's loader computes the SAME item/batch
stream (identical dataset, identical seed — the loaders are deterministic,
pinned by tests/test_data_determinism.py), and `globalize_tree` hands each
process's runtime only the shards its own devices own. Each host therefore
feeds 1/P of every batch to its chips; the duplicated host-side sampling
is a few ms/item (bench/r4: 4.1 ms) against a multi-host DCN step, and
keeps the batch bit-identical to the single-process run — pinned by
tests/test_multiprocess.py.

The reference has no distributed anything (SURVEY.md section 2: single GPU,
`main.py:69`); this layer is TPU-native new build.

Env contract (set per process by the launcher):
  DSNERF_COORD_ADDR     host:port of process 0 (e.g. "localhost:9543")
  DSNERF_NUM_PROCESSES  total process count
  DSNERF_PROCESS_ID     this process's rank, 0-based
"""

from __future__ import annotations

import os

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """`jax.distributed.initialize` from the DSNERF_* env contract.

    Returns True when this process is part of a >1-process cluster.
    No-op (False) when the env is unset or names a single process, so every
    single-host entry point keeps working untouched. Must run before any
    other JAX call in the process (jax.distributed requirement).
    """
    global _INITIALIZED
    n = int(os.environ.get("DSNERF_NUM_PROCESSES", "1"))
    if n <= 1:
        return False
    if _INITIALIZED:
        return True
    addr = os.environ.get("DSNERF_COORD_ADDR")
    pid_raw = os.environ.get("DSNERF_PROCESS_ID")
    if addr is None or pid_raw is None:
        raise ValueError(
            "DSNERF_NUM_PROCESSES > 1 requires DSNERF_COORD_ADDR and "
            "DSNERF_PROCESS_ID (see parallel/distributed.py env contract)"
        )
    import jax

    jax.distributed.initialize(
        coordinator_address=addr, num_processes=n, process_id=int(pid_raw)
    )
    _INITIALIZED = True
    return True


def global_ray_mesh() -> Mesh | None:
    """1-D 'rays' mesh over ALL processes' devices (vs. mesh.local_ray_mesh,
    which deliberately stops at `jax.local_devices()`). None when the whole
    cluster has a single device."""
    import jax

    devs = jax.devices()
    if len(devs) <= 1:
        return None
    return Mesh(np.array(devs), ("rays",))


def is_multiprocess(mesh: Mesh | None) -> bool:
    """True when `mesh` spans devices owned by more than one process —
    the signal that batches must be assembled via `globalize_tree` and
    that checkpoint/TB writes should gate on process 0."""
    if mesh is None:
        return False
    procs = {d.process_index for d in mesh.devices.flat}
    return len(procs) > 1


def globalize_tree(tree, shardings):
    """Assemble global `jax.Array`s from host data present on EVERY process.

    `tree` is a pytree of numpy/jax arrays whose values are identical across
    processes (the deterministic loader guarantees this for batches; state
    init from an identical seed guarantees it for params). `shardings` is a
    matching pytree of NamedShardings — P('rays') leaves are split over the
    global ray axis, P() leaves replicated. Each process transfers only the
    shards its own devices own (`jax.make_array_from_single_device_arrays`).
    """
    import jax

    def to_global(x, sharding: NamedSharding):
        x = np.asarray(x)
        idx_map = sharding.addressable_devices_indices_map(x.shape)
        arrs = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
        return jax.make_array_from_single_device_arrays(
            x.shape, sharding, arrs
        )

    return jax.tree.map(
        to_global, tree, shardings,
        is_leaf=lambda l: isinstance(l, (np.ndarray, jax.Array)),
    )


def replicated_shardings(tree, mesh: Mesh):
    """A pytree of fully-replicated NamedShardings shaped like `tree`."""
    import jax

    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: rep, tree)
