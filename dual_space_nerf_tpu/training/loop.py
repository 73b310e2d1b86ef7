"""The training loop.

Behavioral reference: `trainer.py:12-160` (`do_train`): epoch loop over the
loader (1 image -> nrays rays per step), per-iteration scheduler, TB scalars
every 50 iterations, rays/s logging every LOG_PERIOD, per-epoch checkpoint,
validation every 40 epochs, psnr-threshold early stop.

TPU re-design: the host loader runs ahead in threads; the device step is one
compiled function; metrics transfer off-device only on log iterations so the
step stream never stalls.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np

from ..data import PrefetchLoader, item_to_mesh, item_to_train_batch
from ..renderer import RenderSettings
from .checkpoint import Checkpointer, PeriodicCheckpointer
from .optim import make_optimizer
from .state import create_train_state, make_train_step


def _train_seed() -> int:
    """The reference seeds everything with 233 (`main.py:22-26`).
    DSNERF_SEED overrides it for multi-seed quality A/Bs
    (scripts/ab_convergence.py --seeds); validated so a typo fails at
    startup, and logged so a set-but-forgotten var cannot silently change
    training."""
    raw = os.environ.get("DSNERF_SEED")
    if raw is None:
        return 233
    try:
        seed = int(raw)
    except ValueError:
        raise ValueError(
            f"DSNERF_SEED={raw!r} is not an integer"
        ) from None
    if seed != 233:
        logging.getLogger(__name__).warning(
            "DSNERF_SEED=%d overrides the reference seed 233", seed
        )
    return seed


def do_train(
    cfg,
    model,
    train_set,
    faces: np.ndarray,
    writer,
    logger,
    output_dir: str,
    psnr_thres: float = 100.0,
    resume: bool = True,
    val_fn=None,
    mesh_devices=None,
    max_epochs: int | None = None,
):
    """Returns the final TrainState."""
    settings = RenderSettings.from_cfg(cfg)
    tx, lr_fn = make_optimizer(cfg)
    seed = _train_seed()
    state = create_train_state(model, tx, jax.random.key(seed))
    nrays = cfg.SOLVER.TRAIN_NRAYS

    # Multi-host: when the ray mesh spans >1 process (jax.distributed
    # cluster, parallel/distributed.py), every process runs this same loop
    # SPMD. Each host's deterministic loader computes the identical batch
    # stream (same dataset + seed); globalize_tree hands the runtime only
    # the shards this process's devices own, so each host feeds 1/P of
    # every batch over its own PCI while XLA's grad psum rides ICI/DCN.
    # Checkpoints/TB/logs write from process 0 only.
    from ..parallel.distributed import (
        globalize_tree,
        is_multiprocess,
        replicated_shardings,
    )

    multiproc = is_multiprocess(mesh_devices)
    is_main = (not multiproc) or jax.process_index() == 0

    # resolve the effective epoch count BEFORE building the periodic
    # checkpointer: its final-epoch save clause must fire at the epoch the
    # run actually ends on, not cfg.SOLVER.MAX_EPOCHS (a `--max_epochs 100`
    # run with the shipped CHECKPOINT_PERIOD=3000 would otherwise finish
    # without ever writing a checkpoint)
    max_epochs = max_epochs or cfg.SOLVER.MAX_EPOCHS

    checkpointer = Checkpointer(output_dir)
    state, resume_epoch = checkpointer.resume_or_load("", state, resume=resume)
    periodic = PeriodicCheckpointer(
        checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD, max_epochs
    )
    if multiproc:
        # state leaves (host/single-device after init or resume) -> global
        # replicated jax.Arrays over the cross-process mesh
        state = globalize_tree(
            state, replicated_shardings(state, mesh_devices)
        )

    step_fn = make_train_step(
        model, tx, settings,
        loss_type=cfg.MODEL.LOSS, loss_with_mask=cfg.MODEL.LOSSwMask,
        mesh=mesh_devices,
    )

    verts_cano = train_set.canonical_vertex
    log_period = cfg.SOLVER.LOG_PERIOD
    rng = jax.random.key(seed)
    if multiproc:
        # key arrays have an extended dtype globalize_tree can't np.asarray;
        # produce the replicated global key with an SPMD jit instead
        from jax.sharding import NamedSharding, PartitionSpec as P

        rng = jax.jit(
            lambda: jax.random.key(seed),
            out_shardings=NamedSharding(mesh_devices, P()),
        )()
        from .state import train_batch_shardings

        batch_shardings = train_batch_shardings(mesh_devices)

    # batch conversion (pixel sort, padding, device puts) runs inside the
    # prefetch workers so host prep overlaps the device step
    def to_device(item):
        return (
            item_to_train_batch(item, nrays),
            item_to_mesh(item, faces, verts_cano),
        )

    # Deterministic data stream: required for multi-host (every process
    # must sample the IDENTICAL rays), opt-in for single-host repro runs
    # (DSNERF_DETERMINISTIC_DATA=1 — e.g. the single-process reference leg
    # of tests/test_multiprocess.py). Ordered yielding + per-(epoch, item)
    # rng make the loader a pure function of (dataset, seed, epoch)
    # regardless of worker interleaving.
    det_data = multiproc or (
        os.environ.get("DSNERF_DETERMINISTIC_DATA", "0") == "1"
    )
    if det_data:
        if not hasattr(train_set, "deterministic_items"):
            raise ValueError(
                "deterministic data streaming needs a dataset with "
                "deterministic_items support (see data/zju.py::MocapBase)"
            )
        train_set.deterministic_items = True

    loader = PrefetchLoader(
        train_set, shuffle=True,
        num_workers=cfg.DATALOADER.NUM_WORKERS, seed=seed,
        transform=to_device,
        backend=getattr(cfg.DATALOADER, "BACKEND", None),
        ordered=det_data,
    )

    global_step = int(state.step)
    # Epoch numbering matches the reference exactly: fresh runs start at 1
    # (its CheckpointableDict inits epoch=0 and the loop is
    # `range(1 + resume_epoch, max_epochs)`, `trainer.py:35,55-56`), so
    # epoch-keyed artifacts (val@40, `model_epoch_%07d` names) line up.
    for epoch in range(1 + resume_epoch, max_epochs):
        logger.info("Training Epoch %d...", epoch)
        psnr_monitor = []
        epoch_start = time.time()
        iters_start = epoch_start
        last_log_bidx = -1  # rays/s uses the true step count since last log
        pending = None  # (metrics, step) — read one step late to overlap

        for batch_idx, (batch, geom) in enumerate(loader):
            if multiproc:
                batch = globalize_tree(batch, batch_shardings)
                geom = globalize_tree(
                    geom, replicated_shardings(geom, mesh_devices)
                )
            state, metrics = step_fn(state, batch, geom, rng)
            global_step += 1

            if pending is not None:
                m, gstep, bidx = pending
                psnr_v = float(m["psnr"])
                psnr_monitor.append(psnr_v)
                if is_main and bidx % 50 == 0:
                    for key, v in m.items():
                        # per-term losses only ("loss_rgb", "fine_loss_rgb",
                        # ...); the total goes out as Loss/loss_sum below
                        if "loss_" in key:
                            writer.add_scalar(f"Loss/{key}", float(v), gstep)
                    writer.add_scalar("Loss/loss_sum", float(m["loss"]), gstep)
                    writer.add_scalar("TrainPsnr", psnr_v, gstep)
                    # lr_fn(gstep) is the NEXT update's LR — identical to
                    # the reference's `scheduler.get_lr()` read after
                    # `scheduler.step()` (`trainer.py:81,91`)
                    writer.add_scalar("LR", float(lr_fn(gstep)), gstep)
                if bidx % log_period == 0:
                    dt = time.time() - iters_start
                    iters_start = time.time()
                    # actual steps elapsed, not log_period: the first line
                    # of an epoch covers one step (the reference's formula,
                    # `trainer.py:105-107`, overstates it log_period-fold)
                    steps = bidx - last_log_bidx
                    last_log_bidx = bidx
                    rays_per_s = steps * nrays / max(dt, 1e-9)
                    if is_main:
                        logger.info(
                            "Epoch[%d] Iteration[%d/%d] Loss: %.3e "
                            "Psnr: %.2f Lr: %.2e Speed: %.1f[rays/s]",
                            epoch, bidx, len(loader), float(m["loss"]),
                            psnr_v, float(lr_fn(gstep)), rays_per_s,
                        )
            pending = (metrics, global_step, batch_idx)

        if pending is not None:
            psnr_monitor.append(float(pending[0]["psnr"]))

        if is_main:
            periodic.step_by_epoch(epoch, state)
        # reference cadence: full-val renders every 40 epochs
        # (`trainer.py:121-122`). DSNERF_VAL_PERIOD overrides for harness
        # runs (0 disables — e.g. the quality-A/B fleet, which evaluates
        # final checkpoints separately and would otherwise re-render the
        # whole val set dozens of times per training run).
        val_period = int(os.environ.get("DSNERF_VAL_PERIOD", "40"))
        if (is_main and val_fn is not None and val_period > 0
                and epoch % val_period == 0 and epoch != 0):
            res = val_fn(state, epoch)
            for key, v in res.items():
                writer.add_scalar(f"Val/{key}", v, epoch)
            logger.info(
                "Validation Results - Epoch: %d psnr_wMask: %.3f",
                epoch, res.get("psnr_wMask", float("nan")),
            )

        epoch_time = time.time() - epoch_start
        logger.info(
            "Epoch %d done. Time: %.3f[s] Speed: %.1f[rays/s]",
            epoch, epoch_time, len(loader) * nrays / max(epoch_time, 1e-9),
        )

        mean_psnr = float(np.mean(psnr_monitor)) if psnr_monitor else 0.0
        if mean_psnr > psnr_thres:
            logger.info(
                "Mean Psnr %.3f > threshold %.3f, training stopped",
                mean_psnr, psnr_thres,
            )
            break
    return state
