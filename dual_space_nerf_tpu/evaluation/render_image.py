"""Full-image rendering (eval path).

Equivalent of the reference's `Renderer.render_view` + `post_process`
(`can_render.py:172-278`, `render_utils.py:466-472`): rays inside the AABB
mask are rendered in fixed-size jitted chunks and scattered back into the
H x W canvas. One compiled executable serves every image and every light
state (light params are traced inputs).

With a device mesh (`mesh_devices`), each chunk's ray axis is sharded over
the mesh ('rays' axis) with parameters and geometry replicated — validation
and formal test then use every chip of a pod instead of one (SURVEY.md
section 2 "Collectives": the image assembly's all_gather is the XLA-inserted
collective behind the replicated outputs).
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.batching import item_to_mesh, iter_ray_chunks
from ..renderer import LightState, RayBatch, RenderSettings, render_rays


def _default_pack() -> str:
    """D2H transport precision for eval chunk fetches (DSNERF_EVAL_PACK).

    "f16" (default) halves the per-chunk device->host payload by casting
    chunk outputs to float16 ON DEVICE before the fetch — the published
    s_per_image number then rides half the tunnel bandwidth and is less
    sensitive to D2H latency weather (VERDICT r4: eval drifted 0.85->1.03 s
    across sessions with no code change). "f32" keeps the raw-float path
    for bit-exact golden comparisons. Quantization is ~5e-4 absolute on
    [0,1] color (>60 dB), invisible next to 26-30 dB render PSNR.
    """
    raw = os.environ.get("DSNERF_EVAL_PACK", "f16")
    if raw not in ("f16", "f32"):
        raise ValueError(f"DSNERF_EVAL_PACK={raw!r} must be 'f16' or 'f32'")
    return raw


@functools.lru_cache(maxsize=16)
def _chunk_render_fn(model, settings: RenderSettings, mesh_devices: Mesh | None,
                     pack: str = "f32"):
    """One compiled render-chunk executable per (model, settings, mesh, pack).

    jax.jit caches on function-object identity, so a closure built inside
    ImageRenderer.__init__ would recompile the whole eval graph for every
    renderer instance — e.g. each 40-epoch validation in cli/train.py.
    Caching the jitted callable here makes repeat construction free (model
    and RenderSettings are frozen dataclasses, Mesh is hashable)."""

    def _render(params, rays, mesh, light):
        out = render_rays(
            params, model, rays, mesh, settings, light, None, train=False
        )
        if pack == "f16":
            import jax.numpy as jnp

            out = {
                k: v.astype(jnp.float16)
                if jnp.issubdtype(v.dtype, jnp.floating) else v
                for k, v in out.items()
            }
        return out

    if mesh_devices is None:
        return jax.jit(_render)
    rep = NamedSharding(mesh_devices, P())
    ray = NamedSharding(mesh_devices, P("rays"))
    ray_shardings = RayBatch(
        ray_o=ray, ray_d=ray, near=ray, far=ray,
        frame=rep, body_pose=rep,
    )
    return jax.jit(
        _render,
        in_shardings=(rep, ray_shardings, rep, rep),
        out_shardings=rep,
    )


class ImageRenderer:
    def __init__(
        self,
        model,
        params,
        settings: RenderSettings,
        faces: np.ndarray,
        verts_cano: np.ndarray,
        chunk: int = 4096,
        mesh_devices: Mesh | None = None,
        pack: str | None = None,
    ):
        self.model = model
        self.params = params
        self.settings = settings
        self.faces = faces
        self.verts_cano = verts_cano
        if mesh_devices is not None:
            n_dev = mesh_devices.devices.size
            chunk = -(-chunk // n_dev) * n_dev  # ray axis must split evenly
        self.chunk = chunk
        self.pack = _default_pack() if pack is None else pack
        self._render_chunk = _chunk_render_fn(
            model, settings, mesh_devices, self.pack
        )

    def render_item(
        self,
        item: dict,
        light: LightState | None = None,
        frame_override: int | None = None,
    ) -> dict[str, np.ndarray]:
        """Returns dict of full-image float arrays: color (H, W, 3),
        disp/acc/depth (H, W, 1)."""
        light = light if light is not None else LightState.identity()
        mesh = item_to_mesh(item, self.faces, self.verts_cano)

        keys = ["color", "disp_map", "acc_map", "depth_map"]
        if self.settings.n_fine > 0:
            keys += [f"fine_{k}" for k in keys]
        # Two-phase: dispatch EVERY chunk before fetching any result. A
        # per-chunk np.asarray would serialize each chunk's compute with a
        # host round trip (a ~200 ms/chunk stall on the axon tunnel —
        # measured 18.8k -> see bench/r3 for the fixed numbers); with all
        # chunks queued, device compute and D2H transfers pipeline.
        pending = [
            ({k: out[k][:valid] for k in keys}, valid)
            for rays, valid in iter_ray_chunks(item, self.chunk, frame_override)
            for out in (self._render_chunk(self.params, rays, mesh, light),)
        ]
        # ONE fetch per image: concatenate all chunks' outputs on device
        # and device_get a single small pytree (few leaves) instead of
        # issuing ~18 per-chunk round trips — with f16 packing this is
        # ~1.7 MB/image and insulates s_per_image from tunnel RTT weather
        parts = {k: [] for k in keys}
        if pending:
            import jax.numpy as jnp

            fetched = jax.device_get({
                k: (
                    jnp.concatenate([out[k] for out, _ in pending])
                    if len(pending) > 1 else pending[0][0][k]
                )
                for k in keys
            })
            for k in keys:
                parts[k].append(fetched[k])

        H, W = item["img"].shape[:2]
        mask = np.asarray(item["mask_at_box"]).reshape(-1).astype(bool)

        def scatter(key: str, c: int) -> np.ndarray:
            canvas = np.zeros((H * W, c), np.float32)
            if parts[key]:  # zero AABB-hitting rays -> background canvas
                canvas[mask] = np.concatenate(parts[key]).reshape(-1, c)
            return canvas.reshape(H, W, c)

        out_images = {
            "coarse_color": scatter("color", 3),
            "coarse_disp": scatter("disp_map", 1),
            "coarse_acc": scatter("acc_map", 1),
            "coarse_depth": scatter("depth_map", 1),
        }
        if self.settings.n_fine > 0:
            out_images.update({
                "fine_color": scatter("fine_color", 3),
                "fine_disp": scatter("fine_disp_map", 1),
                "fine_acc": scatter("fine_acc_map", 1),
                "fine_depth": scatter("fine_depth_map", 1),
            })
        return out_images


def light_state_for_novel_pose(
    light_center, Th: np.ndarray, code_scale: float = 0.0
) -> LightState:
    """The reference's novel-pose inference setup: frame code zeroed
    (`test.py:196`) and world coords shifted so the subject sits at the
    trained light_center (`spacenet.py:260-263`)."""
    import jax.numpy as jnp

    base = LightState.identity()
    if light_center is not None and len(np.ravel(light_center)) == 3:
        bias = np.asarray(light_center, np.float32) - np.asarray(
            Th, np.float32
        ).reshape(-1, 3).mean(axis=0)
        base = base._replace(light_bias=jnp.asarray(bias))
    return base._replace(code_scale=jnp.asarray(code_scale, jnp.float32))
