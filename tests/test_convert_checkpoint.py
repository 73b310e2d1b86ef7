"""Reference-checkpoint converter round-trip.

Builds a reference-style torch payload (``{"model": state_dict,
"training_status": {...}}`` — reference ``utils/checkpoint.py:113-118``,
``trainer.py:35``) whose tensors are the flax model's own parameters mapped
through the *inverse* of the converter's name map, runs
``tool/convert_reference_checkpoint.py``, loads the result through the
eval-CLI path (``Checkpointer.load_params_only``), and asserts exact
equality with the original tree — any wrong name, missing layer, or
transposition fails loudly.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dual_space_nerf_tpu.models import DualSpaceNeRF
from dual_space_nerf_tpu.training.checkpoint import Checkpointer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tool.convert_reference_checkpoint import (  # noqa: E402
    _LINEAR_MAP,
    convert_file,
    convert_state_dict,
)


@pytest.fixture(scope="module")
def model_params():
    model = DualSpaceNeRF()
    params = model.init(
        jax.random.key(3),
        jnp.zeros((4, 3)),
        jnp.zeros((4,), jnp.int32),
        jnp.zeros((4, 16)),
    )
    return model, params


def _reference_state_dict(params) -> dict:
    """Inverse of the converter's map: flax tree -> torch state_dict."""
    p = params["params"]
    sd = {}
    for prefix, module, ours, theirs in _LINEAR_MAP:
        for i, j in zip(ours, theirs):
            node = p[module][f"Dense_{i}"]["Dense_0"]
            sd[f"{prefix}.{j}.weight"] = torch.tensor(
                np.asarray(node["kernel"]).T.copy()
            )
            sd[f"{prefix}.{j}.bias"] = torch.tensor(np.asarray(node["bias"]))
    sd["nerf.embedding.weight"] = torch.tensor(
        np.asarray(p["nerf"]["embedding"]["embedding"])
    )
    return sd


def _assert_tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structure differs:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_state_dict_round_trip(model_params):
    _, params = model_params
    sd = _reference_state_dict(params)
    converted = convert_state_dict(sd)
    _assert_tree_equal(converted, jax.device_get(params))


def test_state_dict_covers_reference_layers(model_params):
    """Every Linear/Embedding the reference model owns appears in the map
    (layer list: reference model/spacenet.py:41-79,165-170,199-205)."""
    _, params = model_params
    sd = _reference_state_dict(params)
    expected = {
        *(f"nerf.stage1.{j}.{k}" for j in (0, 2, 4, 6) for k in ("weight", "bias")),
        *(f"nerf.stage2.{j}.{k}" for j in (0, 2, 4) for k in ("weight", "bias")),
        "nerf.density_net.0.weight", "nerf.density_net.0.bias",
        *(f"nerf.rgb_net.{j}.{k}" for j in (1, 3) for k in ("weight", "bias")),
        *(f"lighting_mlp.lights_encoding.{j}.{k}"
          for j in (0, 2, 4) for k in ("weight", "bias")),
        *(f"pose_mlp.{j}.{k}" for j in (0, 2, 4) for k in ("weight", "bias")),
        "nerf.embedding.weight",
    }
    assert set(sd) == expected
    # torch Linear weights are (out, in): stage1.0 maps 87 -> 256
    assert tuple(sd["nerf.stage1.0.weight"].shape) == (256, 87)
    assert tuple(sd["nerf.stage2.0.weight"].shape) == (256, 319)
    assert tuple(sd["nerf.rgb_net.3.weight"].shape) == (3, 128)
    assert tuple(sd["pose_mlp.0.weight"].shape) == (64, 92)
    assert tuple(sd["nerf.embedding.weight"].shape) == (500, 8)


def test_file_round_trip_through_eval_loader(model_params, tmp_path):
    """pth -> convert_file -> Checkpointer.load_params_only == original."""
    model, params = model_params
    payload = {
        "model": _reference_state_dict(params),
        "training_status": {"epoch": 123, "iteration": 456},
    }
    in_path = tmp_path / "model_epoch_0000123.pth"
    out_path = tmp_path / "converted.ckpt"
    torch.save(payload, in_path)

    convert_file(str(in_path), str(out_path))

    ck = Checkpointer(str(tmp_path))
    loaded = ck.load_params_only(str(out_path), jax.device_get(params))
    _assert_tree_equal(loaded, jax.device_get(params))

    # the converted params drive the model identically
    x = jnp.linspace(-0.5, 0.5, 12).reshape(4, 3)
    fi = jnp.zeros((4,), jnp.int32)
    pf = jnp.zeros((4, 16))
    e0, d0 = model.apply(params, x, fi, pf, 1.0, method="sigma_essence")
    e1, d1 = model.apply(
        jax.tree.map(jnp.asarray, loaded), x, fi, pf, 1.0,
        method="sigma_essence",
    )
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_export_round_trip(model_params, tmp_path):
    """ckpt -> export_reference_checkpoint -> convert back == original,
    and the exported payload matches the reference's saved shape
    (torch.load(...)[\"model\"] / training_status, utils/checkpoint.py:113)."""
    from dual_space_nerf_tpu.training import (
        create_train_state, make_optimizer,
    )
    from dual_space_nerf_tpu.config import get_cfg_defaults
    from tool.export_reference_checkpoint import export_file

    model, params = model_params
    cfg = get_cfg_defaults()
    tx, _ = make_optimizer(cfg)
    state = create_train_state(model, tx, jax.random.key(9))
    state = state._replace(params=params)
    ck = Checkpointer(str(tmp_path))
    ckpt_path = ck.save("model_epoch_0000042", state, 42)

    pth_path = tmp_path / "exported.pth"
    export_file(ckpt_path, str(pth_path))
    payload = torch.load(pth_path, map_location="cpu", weights_only=True)
    assert payload["training_status"]["epoch"] == 42
    assert "nerf.stage1.0.weight" in payload["model"]

    back = convert_state_dict(payload["model"])
    _assert_tree_equal(back, jax.device_get(params))


def test_bare_state_dict_payload(model_params, tmp_path):
    """Some tools re-save just the state_dict; converter accepts that too."""
    _, params = model_params
    in_path = tmp_path / "bare.pth"
    out_path = tmp_path / "bare.ckpt"
    torch.save(_reference_state_dict(params), in_path)
    convert_file(str(in_path), str(out_path))
    ck = Checkpointer(str(tmp_path))
    loaded = ck.load_params_only(str(out_path), jax.device_get(params))
    _assert_tree_equal(loaded, jax.device_get(params))
