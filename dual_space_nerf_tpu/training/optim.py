"""Optimizer + LR schedule.

Behavioral reference: `solver/build.py:3-19` (Adam with BASE_LR and
WEIGHT_DECAY; the reference's "SGD" branch is a silent no-op that still
returns Adam) and `solver/lr_scheduler.py:58-71` (`build_scheduler`):
linear warmup over WARMUP_ITERS, flat 1.0, then from START_ITERS an
exponential decay (1-scale)*exp(-(it-start)/(end-start)) + scale —
stepped PER ITERATION (`trainer.py:81`).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def reference_schedule(
    warmup_iters: int, start_iters: int, end_iters: int, scale: float
):
    """The reference's LambdaLR multiplier as an optax-compatible schedule."""

    def schedule(step):
        it = jnp.asarray(step, jnp.float32) + 1.0
        warm = it / warmup_iters
        decay = (1.0 - scale) * jnp.exp(
            -(it - start_iters) / (end_iters - start_iters)
        ) + scale
        mult = jnp.where(
            it <= warmup_iters, warm, jnp.where(it >= start_iters, decay, 1.0)
        )
        return mult

    return schedule


def make_optimizer(cfg) -> tuple[optax.GradientTransformation, object]:
    """Adam (+ optional COUPLED weight decay) with the reference schedule.

    torch's `Adam(weight_decay=wd)` (`solver/build.py:11`) adds wd*param to
    the gradient BEFORE the adaptive moments — coupled L2, not AdamW's
    decoupled decay — so the equivalent here is add_decayed_weights ahead
    of the Adam transform, not optax.adamw.

    Returns (tx, schedule) — the schedule is also exposed so the train loop
    can log the current LR like `trainer.py:91`.
    """
    sched = reference_schedule(
        cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.START_ITERS,
        cfg.SOLVER.END_ITERS,
        cfg.SOLVER.LR_SCALE,
    )
    base_lr = cfg.SOLVER.BASE_LR

    def lr(step):
        return base_lr * sched(step)

    if cfg.SOLVER.WEIGHT_DECAY > 0:
        tx = optax.chain(
            optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY),
            optax.adam(learning_rate=lr, eps=1e-8),
        )
    else:
        tx = optax.adam(learning_rate=lr, eps=1e-8)
    return tx, lr
