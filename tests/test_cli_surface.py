"""The five user-facing CLIs, driven in-process end-to-end on the synthetic
dataset: train -> validate -> formal test -> relighting sweep. (The
novel-pose CLI's same-subject path needs ZJU on-disk assets; its dataset
factory is covered by tests/test_novel_pose_transfer.py.)"""

import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_exp(tmp_path_factory, monkeypatch_module):
    """Train 2 epochs through the real `main.py` surface; yield (cwd, cfg
    path, ckpt path)."""
    work = tmp_path_factory.mktemp("cli_work")
    cfg_path = work / "tiny.yml"
    cfg_path.write_text(
        """
MODEL:
  TYPE: "nerf"
  COARSE_RAY_SAMPLING: 8
  FINE_RAY_SAMPLING: -1
  sample_points_mode: "GG"
  MLP_CHUNK: 2048
  MAX_FRAMES: 16
  KNN_IMPL: "xla"
DATASETS:
  TYPE: "synthetic"
  HUMAN: "capsule"
DATALOADER:
  NUM_WORKERS: 2
SOLVER:
  MAX_EPOCHS: 3
  BASE_LR: 0.0005
  WEIGHT_DECAY: 0.0
  WARMUP_ITERS: 5
  CHECKPOINT_PERIOD: 1
  LOG_PERIOD: 2
  TRAIN_NRAYS: 64
TEST:
  IMS_PER_BATCH: 1
  RAY_CHUNK: 512
  light_center: []
"""
    )
    monkeypatch_module.chdir(work)
    from dual_space_nerf_tpu.cli import train as cli_train

    cli_train.main(["-c", str(cfg_path), "--exp", "cli_surface"])
    ckpts = sorted(glob.glob(str(work / "EXP/cli_surface/model_epoch_*.ckpt")))
    assert ckpts, "training produced no checkpoints"
    return work, str(cfg_path), ckpts[-1]


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


@pytest.mark.slow
def test_validate_cli(trained_exp):
    work, cfg, ckpt = trained_exp
    from dual_space_nerf_tpu.cli import validate as cli_validate

    res = cli_validate.main(["-c", cfg, "--exp", "cli_surface", "--ckpt", ckpt])
    assert np.isfinite(res["psnr_wMask"]) and np.isfinite(res["ssim"])
    # image dumps landed (renders/acc/depth like the reference's val dir)
    assert glob.glob(str(work / "EXP/cli_surface/vis/**/*.jpg"), recursive=True)


@pytest.mark.slow
def test_formal_test_cli(trained_exp):
    work, cfg, ckpt = trained_exp
    from dual_space_nerf_tpu.cli import test as cli_test

    novel_view, novel_pose = cli_test.main(
        ["-c", cfg, "--exp", "cli_surface", "--ckpt", ckpt]
    )
    # both splits report psnr/ssim (lpips gated off without weights)
    for res in (novel_view, novel_pose):
        assert np.isfinite(res["psnr_wMask"]), res
    out_pngs = glob.glob(str(work / "TEST/**/*.png"), recursive=True)
    assert out_pngs, "formal test wrote no renders"


@pytest.mark.slow
def test_vis_lighting_cli(trained_exp):
    work, cfg, ckpt = trained_exp
    from dual_space_nerf_tpu.cli import vis_lighting as cli_vis

    cli_vis.main(["-c", cfg, "--exp", "cli_surface", "--ckpt", ckpt])
    frames = glob.glob(str(work / "vis_lighting/cli_surface/**/*.jpg"),
                       recursive=True)
    # 0..360 step 36 -> 10 relit frames of the same pose
    assert len(frames) >= 10
    vids = glob.glob(str(work / "vis_lighting/cli_surface/*.mp4"))
    assert vids, "no relighting video written"


@pytest.mark.slow
def test_vis_lighting_cli_data_parallel(trained_exp):
    """--data_parallel shards the render chunks over the 8 virtual devices
    and must produce the same artifact set."""
    work, cfg, ckpt = trained_exp
    from dual_space_nerf_tpu.cli import vis_lighting as cli_vis

    cli_vis.main(
        ["-c", cfg, "--exp", "cli_dp", "--ckpt", ckpt, "--data_parallel"]
    )
    frames = glob.glob(str(work / "vis_lighting/cli_dp/**/*.jpg"),
                       recursive=True)
    assert len(frames) >= 10


def test_train_cli_writes_checkpoints(trained_exp):
    """Fast-tier CLI smoke: the real `main.py` surface trains and writes
    epoch-named checkpoints + the last_checkpoint tag (the heavier eval
    CLIs above are `slow`)."""
    work, _, ckpt = trained_exp
    assert os.path.exists(ckpt)
    tag = os.path.join(work, "EXP/cli_surface/last_checkpoint")
    with open(tag, encoding="utf-8") as f:
        assert f.read().strip() in os.path.basename(ckpt)
