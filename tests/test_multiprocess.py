"""Multi-host data parallelism: 2 jax.distributed processes x 4 virtual CPU
devices each == one 8-device single-process run, bit-for-bit on the data
stream and allclose on the math (SURVEY.md section 2: grad psum "over ICI
(single pod) / DCN (multi-slice)" — this is the DCN half).

The cluster legs run in subprocesses (jax.distributed owns the whole
process); the single-process reference leg runs in-process on the
conftest's 8 virtual devices.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_HELPERS = os.path.join(os.path.dirname(__file__), "helpers")
sys.path.insert(0, _HELPERS)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_cluster(mode: str, out_dir: str, timeout: int = 900):
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    # each rank is its own process; the conftest's 8-device flag must not
    # leak in (the workers set their own 4-device flag above)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HELPERS, "mp_worker.py"),
             mode, str(rank), str(port), out_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"rank {rank} failed (rc={p.returncode}):\n{out[-4000:]}"
        )
        assert f"MPWORKER_OK rank={rank}" in out, out[-2000:]
    return outs


def test_cross_process_step_matches_single_process(tmp_path):
    """3 sharded train steps over the 2-process global mesh produce the
    same params/metrics as the unsharded single-process step."""
    import jax

    from mp_common import N_STEPS, make_problem

    _launch_cluster("step", str(tmp_path))
    got = np.load(tmp_path / "step_result.npz")

    from dual_space_nerf_tpu.training.state import (
        create_train_state,
        make_train_step,
    )

    model, tx, cfg, settings, batch, geom = make_problem()
    state = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(model, tx, settings, loss_type="L2", mesh=None)
    rng = jax.random.key(7)
    for _ in range(N_STEPS):
        state, metrics = step(state, batch, geom, rng)

    np.testing.assert_allclose(
        float(got["loss"]), float(metrics["loss"]), rtol=1e-4
    )
    leaves = jax.tree.leaves(state.params)
    import re

    n_params = sum(1 for k in got.files if re.fullmatch(r"p\d+", k))
    assert len(leaves) == n_params
    for i, leaf in enumerate(leaves):
        np.testing.assert_allclose(
            got[f"p{i}"], np.asarray(leaf), rtol=5e-4, atol=5e-5,
            err_msg=f"param leaf {i}",
        )


def test_cross_process_do_train_matches_single_process(tmp_path, monkeypatch):
    """The REAL do_train loop (ordered loader + deterministic items +
    globalize + process-0 checkpointing) over 2 processes lands on the
    same params as a single-process run consuming the identical stream."""
    import jax

    from mp_common import tiny_cfg

    _launch_cluster("train", str(tmp_path))
    got = np.load(tmp_path / "train_result.npz")
    # rank 0 wrote epoch-named checkpoints through the gated periodic path
    ckpts = [
        f for f in os.listdir(tmp_path / "mp_exp")
        if f.startswith("model_epoch_")
    ]
    assert ckpts, os.listdir(tmp_path / "mp_exp")

    # single-process reference with the identical deterministic stream
    monkeypatch.setenv("DSNERF_DETERMINISTIC_DATA", "1")
    from dual_space_nerf_tpu.cli.common import build_model
    from dual_space_nerf_tpu.data import SyntheticDataset
    from dual_space_nerf_tpu.training.loop import do_train
    from dual_space_nerf_tpu.utils.logger import (
        make_summary_writer,
        setup_logger,
    )

    cfg = tiny_cfg()
    model = build_model(cfg)
    train_set = SyntheticDataset(
        split="train", nrays=cfg.SOLVER.TRAIN_NRAYS, n_frames=2,
        n_views=2, h=48, w=48,
    )
    out_dir = str(tmp_path / "sp_exp")
    writer = make_summary_writer(out_dir)
    logger = setup_logger("mp_ref", out_dir)
    state = do_train(
        cfg, model, train_set, np.asarray(train_set.faces), writer, logger,
        output_dir=out_dir, resume=False, mesh_devices=None,
    )

    assert int(got["step"]) == int(state.step)
    leaves = jax.tree.leaves(state.params)
    for i, leaf in enumerate(leaves):
        # 8 early Adam steps amplify f32 psum reduce-order noise: near a
        # grad sign boundary with tiny second moments, update ~ +-lr, so a
        # ulp-level grad difference moves a weight by up to ~2*lr (1e-3
        # warmup LR here). Observed: ~0.1% of one leaf at <= 4.5e-4, the
        # signature of order noise — a STREAM mismatch would shift every
        # element at gradient scale and fail this by orders of magnitude.
        np.testing.assert_allclose(
            got[f"p{i}"], np.asarray(leaf), rtol=5e-4, atol=1e-3,
            err_msg=f"param leaf {i}",
        )
