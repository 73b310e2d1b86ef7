"""Worker for tests/test_multiprocess.py: one rank of a 2-process CPU
jax.distributed cluster (4 virtual devices each -> 8-device global mesh).

Modes:
  step   — run N train steps of make_train_step over the GLOBAL mesh on a
           fixed synthetic batch; rank 0 dumps final params + metrics.
  train  — run do_train end-to-end (real loop: ordered loader,
           deterministic items, globalize, process-0 checkpoint gating);
           rank 0's checkpoint is the artifact.

Launched as:  python mp_worker.py MODE RANK PORT OUT_DIR
Env must carry JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=4 (the launcher sets
them); the container's sitecustomize pre-initializes the axon TPU backend,
so the backend is repointed + cleared before jax.distributed joins
(same dance as tests/conftest.py).
"""

import os
import sys

MODE, RANK, PORT, OUT_DIR = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

import jax  # noqa: E402
import jax.extend.backend  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.extend.backend.clear_backends()

os.environ["DSNERF_COORD_ADDR"] = f"localhost:{PORT}"
os.environ["DSNERF_NUM_PROCESSES"] = "2"
os.environ["DSNERF_PROCESS_ID"] = str(RANK)

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))  # repo root
sys.path.insert(0, _HERE)  # for mp_common

import numpy as np  # noqa: E402

from dual_space_nerf_tpu.parallel.distributed import (  # noqa: E402
    global_ray_mesh,
    globalize_tree,
    maybe_initialize_distributed,
    replicated_shardings,
)

assert maybe_initialize_distributed()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.devices()

from mp_common import N_STEPS, make_problem  # noqa: E402


def main():
    model, tx, cfg, settings, batch, geom = make_problem()

    if MODE == "step":
        from dual_space_nerf_tpu.training.state import (
            create_train_state,
            make_train_step,
            train_batch_shardings,
        )

        mesh = global_ray_mesh()
        state = create_train_state(model, tx, jax.random.key(0))
        state = globalize_tree(state, replicated_shardings(state, mesh))
        batch_g = globalize_tree(batch, train_batch_shardings(mesh))
        geom_g = globalize_tree(geom, replicated_shardings(geom, mesh))
        step = make_train_step(model, tx, settings, loss_type="L2", mesh=mesh)
        rng = jax.jit(
            lambda: jax.random.key(7),
            out_shardings=replicated_shardings(0, mesh),
        )()
        for _ in range(N_STEPS):
            state, metrics = step(state, batch_g, geom_g, rng)
        if RANK == 0:
            leaves = jax.tree.leaves(state.params)
            np.savez(
                os.path.join(OUT_DIR, "step_result.npz"),
                loss=float(metrics["loss"]),
                psnr=float(metrics["psnr"]),
                **{f"p{i}": np.asarray(l) for i, l in enumerate(leaves)},
            )
    elif MODE == "train":
        from dual_space_nerf_tpu.data import SyntheticDataset
        from dual_space_nerf_tpu.training.loop import do_train
        from dual_space_nerf_tpu.utils.logger import (
            make_summary_writer,
            setup_logger,
        )

        mesh = global_ray_mesh()
        train_set = SyntheticDataset(
            split="train", nrays=cfg.SOLVER.TRAIN_NRAYS, n_frames=2,
            n_views=2, h=48, w=48,
        )
        out_dir = os.path.join(OUT_DIR, "mp_exp")
        os.makedirs(out_dir, exist_ok=True)
        writer = make_summary_writer(out_dir) if RANK == 0 else _NoopWriter()
        logger = setup_logger(f"mp_worker{RANK}", out_dir if RANK == 0 else None)
        state = do_train(
            cfg, model, train_set, np.asarray(train_set.faces), writer,
            logger, output_dir=out_dir, resume=False, mesh_devices=mesh,
        )
        if RANK == 0:
            leaves = jax.tree.leaves(state.params)
            np.savez(
                os.path.join(OUT_DIR, "train_result.npz"),
                step=int(state.step),
                **{f"p{i}": np.asarray(l) for i, l in enumerate(leaves)},
            )
    else:
        raise SystemExit(f"unknown mode {MODE!r}")
    print(f"MPWORKER_OK rank={RANK} mode={MODE}", flush=True)


class _NoopWriter:
    def add_scalar(self, *a, **k):
        pass

    def add_text(self, *a, **k):
        pass

    def close(self):
        pass


if __name__ == "__main__":
    main()
