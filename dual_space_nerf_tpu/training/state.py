"""Train state + jitted train step, optionally sharded over a device mesh.

Replaces the reference's eager epoch loop body (`trainer.py:63-109`) with a
single compiled step: render -> loss -> grad -> Adam update. Parallelism is
data-parallel over the RAY axis (SURVEY.md section 2 "TPU-native
equivalents"): the ray batch is sharded over the mesh, parameters are
replicated, and XLA inserts the psum for the gradient all-reduce over ICI —
there is no hand-written collective in the hot path.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..renderer import LightState, MeshBundle, RayBatch, RenderSettings, render_rays
from .loss import make_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # () int32


class TrainBatch(NamedTuple):
    """RayBatch + supervision targets. Leading dim of per-ray fields is R."""

    rays: RayBatch
    rgb: jnp.ndarray        # (R, 3)
    occupancy: jnp.ndarray  # (R,)


def create_train_state(model, tx, rng) -> TrainState:
    params = model.init(
        rng,
        jnp.zeros((4, 3)),
        jnp.zeros((4,), jnp.int32),
        jnp.zeros((4, 16)),
    )
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    settings: RenderSettings,
    loss_type: str = "L2",
    loss_with_mask: bool = False,
    mesh: Mesh | None = None,
):
    """Returns step(state, batch, mesh_bundle, rng) -> (state, metrics), jitted.

    With a device mesh, per-ray leaves of the batch are sharded over the
    'rays' axis; params/opt-state/mesh geometry are replicated.
    """
    loss_fn = make_loss(loss_type, loss_with_mask)

    def step(state: TrainState, batch: TrainBatch, geom: MeshBundle, rng):
        rng = jax.random.fold_in(rng, state.step)

        def compute_loss(params):
            out = render_rays(
                params, model, batch.rays, geom, settings,
                LightState.identity(), rng, train=True,
            )
            losses = loss_fn(out, batch.rgb, batch.occupancy)
            if settings.n_fine > 0:
                # standard coarse+fine NeRF supervision. The reference's own
                # fine path is dead (its trainer reads only tmp["coarse"],
                # `trainer.py:70-75`, and render_view's fine branch crashes at
                # `can_render.py:213`); with hierarchical sampling enabled
                # here, the fine render must carry a loss or it is dead
                # compute under jit.
                fine_out = {
                    k[len("fine_"):]: v
                    for k, v in out.items()
                    if k.startswith("fine_")
                }
                fine_losses = loss_fn(fine_out, batch.rgb, batch.occupancy)
                losses.update({f"fine_{k}": v for k, v in fine_losses.items()})
            total = sum(losses.values())
            mse = jnp.mean((out["color"] - batch.rgb) ** 2)
            return total, {"losses": losses, "mse": mse}

        (total, aux), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": total,
            "psnr": -10.0 * jnp.log10(aux["mse"]),
            **aux["losses"],
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    return jax.jit(
        step,
        in_shardings=(
            NamedSharding(mesh, P()),          # state: replicated
            train_batch_shardings(mesh),       # batch: rays sharded
            NamedSharding(mesh, P()),          # mesh geometry: replicated
            NamedSharding(mesh, P()),          # rng
        ),
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )


def train_batch_shardings(mesh: Mesh) -> TrainBatch:
    """Per-field NamedShardings: per-ray leaves split over the 'rays' axis;
    frame index and body pose are replicated."""
    rep = NamedSharding(mesh, P())
    ray = NamedSharding(mesh, P("rays"))
    rays = RayBatch(
        ray_o=ray, ray_d=ray, near=ray, far=ray, frame=rep, body_pose=rep
    )
    return TrainBatch(rays=rays, rgb=ray, occupancy=ray)
