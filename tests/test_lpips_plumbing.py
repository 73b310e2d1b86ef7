"""cli/test.py's LPIPS branch driven END-TO-END with a random-weights npz
fixture (VERDICT r4 #7): pretrained alex/vgg weights cannot exist in this
air-gapped environment, but the whole pipeline around them — weight
loading via cfg.TEST.LPIPS_WEIGHTS, the [0,1]-BGR -> (-1,1)-RGB input
protocol, per-image accumulation over both formal splits — has to execute
as one piece, not just as the unit-tested lpips_jax numerics.

Reference being pinned: `/root/reference/test.py:18-23, 77-85` (lpips alex
+ vgg reported per eval split). The fixture weights are random (seed 77 via
tests/test_lpips_jax.py::_random_params), documented as non-pretrained —
the assertion is that the metrics EXIST, are finite, and respond to the
input protocol, not that their values mean anything perceptual.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(__file__))

CFG = """\
MODEL:
  TYPE: "nerf"
  COARSE_RAY_SAMPLING: 8
  FINE_RAY_SAMPLING: -1
  sample_points_mode: "GG"
  MAX_FRAMES: 16
  MLP_CHUNK: 2048
  KNN_IMPL: "xla"
DATASETS:
  TYPE: "synthetic"
  SYNTHETIC_FRAMES: 2
  SYNTHETIC_VIEWS: 2
  SYNTHETIC_SIZE: 48
SOLVER:
  TRAIN_NRAYS: 64
TEST:
  IMS_PER_BATCH: 1
  RAY_CHUNK: 512
  light_center: [0.0, 0.0, 0.4]
  LPIPS_WEIGHTS: "{weights_dir}"
"""


def test_formal_test_reports_lpips_with_fixture_weights(tmp_path, monkeypatch):
    import jax

    from test_lpips_jax import _random_params
    from dual_space_nerf_tpu.cli import test as cli_test
    from dual_space_nerf_tpu.cli.common import build_model, load_cfg
    from dual_space_nerf_tpu.training import (
        Checkpointer,
        create_train_state,
        make_optimizer,
    )

    # fixture weights for BOTH nets, the directory form the CLI uses
    weights_dir = tmp_path / "lpips_weights"
    weights_dir.mkdir()
    rng = np.random.default_rng(77)
    for net in ("alex", "vgg"):
        np.savez(
            weights_dir / f"lpips_{net}.npz",
            **{"meta/net": np.str_(net)},
            **_random_params(net, rng),
        )

    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(CFG.format(weights_dir=weights_dir))

    # a (untrained) checkpoint for --ckpt, saved through the real path —
    # built from the SAME yml the CLI will load (MODEL shapes must match)
    cfg = load_cfg(str(cfg_path))
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg)
    state = create_train_state(model, tx, jax.random.key(0))
    exp_dir = tmp_path / "EXP" / "lpips_demo"
    exp_dir.mkdir(parents=True)
    ck = Checkpointer(str(exp_dir))
    ckpt_path = ck.save("model_epoch_0000001", state, epoch=1)

    monkeypatch.chdir(tmp_path)  # ./TEST/<exp> artifacts land in tmp
    nv, npse = cli_test.main([
        "-c", str(cfg_path), "--exp", "lpips_demo", "--ckpt", ckpt_path,
    ])

    for split_name, out in (("novel_view", nv), ("novel_pose", npse)):
        for key in ("lpips_alex", "lpips_vgg"):
            assert key in out, (split_name, out)
            assert np.isfinite(out[key]), (split_name, key, out)
            # random-weight LPIPS of an untrained render vs gt is a sum of
            # weighted squared feature diffs — strictly positive
            assert out[key] > 0, (split_name, key, out)
        # standard metrics still present alongside
        assert np.isfinite(out["psnr_wMask"]) and np.isfinite(out["ssim"])


def test_lpips_gated_off_without_weights(tmp_path, monkeypatch, capsys):
    """No LPIPS_WEIGHTS -> the CLI degrades exactly like the reference
    without the lpips package: metrics omitted, a notice printed."""
    import jax

    from dual_space_nerf_tpu.cli import test as cli_test
    from dual_space_nerf_tpu.cli.common import build_model, load_cfg
    from dual_space_nerf_tpu.training import (
        Checkpointer,
        create_train_state,
        make_optimizer,
    )

    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(CFG.format(weights_dir=""))

    cfg = load_cfg(str(cfg_path))
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg)
    state = create_train_state(model, tx, jax.random.key(0))
    exp_dir = tmp_path / "EXP" / "lpips_off"
    exp_dir.mkdir(parents=True)
    ckpt_path = Checkpointer(str(exp_dir)).save(
        "model_epoch_0000001", state, epoch=1
    )

    monkeypatch.chdir(tmp_path)
    nv, _ = cli_test.main([
        "-c", str(cfg_path), "--exp", "lpips_off", "--ckpt", ckpt_path,
    ])
    assert "lpips_alex" not in nv and "lpips_vgg" not in nv
    assert "LPIPS weights unavailable" in capsys.readouterr().out
