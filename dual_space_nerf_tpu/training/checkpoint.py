"""Checkpoint save/resume.

Mirrors the reference's vendored detectron2 Checkpointer surface
(`utils/checkpoint.py:46-474`): epoch-named files, a ``last_checkpoint`` tag
file, `resume_or_load`, and a `PeriodicCheckpointer` stepped per epoch
(`trainer.py:35-47,119`). Storage is flax msgpack of
{params, opt_state, step, epoch} — a single host-readable file, no torch.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization

from .state import TrainState

_TAG_FILE = "last_checkpoint"


class Checkpointer:
    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)

    # -- paths --------------------------------------------------------------
    def _tag_path(self) -> str:
        return os.path.join(self.save_dir, _TAG_FILE)

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._tag_path())

    def get_checkpoint_file(self) -> str:
        with open(self._tag_path(), "r") as f:
            name = f.read().strip()
        return os.path.join(self.save_dir, name)

    # -- save/load ----------------------------------------------------------
    def save(self, name: str, state: TrainState, epoch: int) -> str:
        """Save state under `<name>.ckpt` and update the tag file."""
        payload = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step),
            "epoch": int(epoch),
        }
        fname = f"{name}.ckpt"
        path = os.path.join(self.save_dir, fname)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
        with open(self._tag_path(), "w") as f:
            f.write(fname)
        return path

    def load(self, path: str, template: TrainState) -> tuple[TrainState, int]:
        """Load into the (already-initialized) state template.

        Returns (state, epoch)."""
        with open(path, "rb") as f:
            data = f.read()
        target = {
            "params": template.params,
            "opt_state": template.opt_state,
            "step": 0,
            "epoch": 0,
        }
        payload = serialization.from_bytes(target, data)
        state = TrainState(
            params=payload["params"],
            opt_state=payload["opt_state"],
            step=np.asarray(payload["step"], np.int32),
        )
        return state, int(payload["epoch"])

    def resume_or_load(
        self, path: str, template: TrainState, resume: bool = True
    ) -> tuple[TrainState, int]:
        """Resume from the tag file if present, else load `path` if given.

        Mirrors `utils/checkpoint.py:206-225`."""
        if resume and self.has_checkpoint():
            return self.load(self.get_checkpoint_file(), template)
        if path and os.path.exists(path):
            return self.load(path, template)
        return template, 0

    def load_params_only(self, path: str, params_template: Any) -> Any:
        """Eval-script path: read only the model params (validate.py:18-28)."""
        with open(path, "rb") as f:
            data = f.read()
        target = {
            "params": params_template,
            "opt_state": None,
            "step": 0,
            "epoch": 0,
        }
        # opt_state structure may differ across optimizers; tolerate it.
        try:
            payload = serialization.from_bytes(target, data)
        except Exception:
            state_dict = serialization.msgpack_restore(bytearray(data))
            payload = {
                "params": serialization.from_state_dict(
                    params_template, state_dict["params"]
                )
            }
        return payload["params"]


class PeriodicCheckpointer:
    """Per-epoch checkpoint with `model_epoch_%07d` naming
    (`utils/checkpoint.py:445-462`)."""

    def __init__(self, checkpointer: Checkpointer, period: int, max_epoch: int):
        self.checkpointer = checkpointer
        self.period = max(int(period), 1)
        self.max_epoch = max_epoch

    def step_by_epoch(self, epoch: int, state: TrainState) -> None:
        if epoch % self.period == 0 or epoch >= self.max_epoch - 1:
            self.checkpointer.save(f"model_epoch_{epoch:07d}", state, epoch)
