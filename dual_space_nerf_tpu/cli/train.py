"""Training CLI.

Surface-compatible with the reference's `main.py`:
  python main.py -c configs/zju_mocap/313.yml --exp 313 [-s PSNR] [-r N]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train Dual-Space NeRF (TPU)")
    parser.add_argument("-c", "--config", default="", help="config file path")
    parser.add_argument("-g", "--gpu", type=int, default=0,
                        help="unused (device selection is via JAX); kept for "
                             "CLI compatibility")
    parser.add_argument("-r", "--resume", type=int, default=0,
                        help="checkpoint number to resume (auto-resumes from "
                             "last_checkpoint when present)")
    parser.add_argument("-s", "--psnr_thres", type=float, default=100.0)
    parser.add_argument("-cont", "--cont", action="store_true")
    parser.add_argument("-noise", "--add_noise", type=float, default=0.0)
    parser.add_argument("--exp", type=str, default="test")
    parser.add_argument("--max_epochs", type=int, default=0,
                        help="override SOLVER.MAX_EPOCHS (0 = use config)")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="write a jax.profiler trace of the first epoch "
                             "here (TensorBoard format)")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (the reference's "
                             "commented-out set_detect_anomaly, main.py:70)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    # seeds (main.py:22-26)
    np.random.seed(233)

    from ..data import select_dataset
    from ..parallel import local_ray_mesh, pad_rays_for_mesh
    from ..training.loop import do_train
    from ..utils.logger import make_summary_writer, setup_logger
    from .common import (
        build_model,
        enable_compilation_cache,
        load_cfg,
        load_faces,
    )

    enable_compilation_cache()

    # Multi-host: DSNERF_NUM_PROCESSES>1 joins a jax.distributed cluster
    # (env contract in parallel/distributed.py) and the ray mesh spans
    # every process's devices; single-host runs are untouched.
    from ..parallel.distributed import (
        global_ray_mesh,
        maybe_initialize_distributed,
    )

    cfg = load_cfg(args.config)
    if maybe_initialize_distributed():
        mesh_devices = global_ray_mesh()
    else:
        mesh_devices = local_ray_mesh()
    if mesh_devices is not None:
        cfg.defrost()
        cfg.SOLVER.TRAIN_NRAYS = pad_rays_for_mesh(
            cfg.SOLVER.TRAIN_NRAYS, mesh_devices
        )
        cfg.freeze()

    output_dir = os.path.join("EXP", args.exp)
    os.makedirs(output_dir, exist_ok=True)
    writer = make_summary_writer(output_dir)
    writer.add_text("OUT_PATH", output_dir, 0)
    logger = setup_logger("NERFRender", output_dir)
    logger.info("Running with config:\n%s", cfg)
    if args.config:
        shutil.copyfile(args.config, os.path.join(output_dir, "config.yml"))

    train_set, val_set = select_dataset(cfg, train_nrays=cfg.SOLVER.TRAIN_NRAYS)
    logger.info("len train: %d, len val: %d", len(train_set), len(val_set))

    model = build_model(cfg)
    faces = load_faces(cfg, train_set)

    import jax

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    def val_fn(state, epoch):
        from ..evaluation import ImageRenderer
        from ..renderer import RenderSettings
        from .validate import val

        renderer = ImageRenderer(
            model, state.params, RenderSettings.from_cfg(cfg), faces,
            val_set.canonical_vertex, chunk=cfg.TEST.RAY_CHUNK,
        )
        return val(val_set, renderer, os.path.join(output_dir, "vis"), epoch)

    state = do_train(
        cfg, model, train_set, faces, writer, logger,
        output_dir=output_dir, psnr_thres=args.psnr_thres,
        resume=True,
        val_fn=val_fn,
        mesh_devices=mesh_devices,
        max_epochs=args.max_epochs or None,
    )
    if args.profile_dir:
        jax.profiler.stop_trace()
    writer.close()
    return state


if __name__ == "__main__":
    main()
