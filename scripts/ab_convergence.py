#!/usr/bin/env python3
"""Training-quality A/B harness on the synthetic dataset.

Trains one run per (MODEL-override variant x seed) through the real CLI
(fresh subprocess each, so TPU memory and jit caches reset), then
re-evaluates every final checkpoint with EXACT reference-semantics shading
(SHADE_TOPK=0, REUSE_WARP_FACES off) on the held-out val views, reporting
masked PSNR / SSIM as mean +/- std over seeds. This is the harness behind
the README's quality evidence for approximation knobs (SHADE_TOPK,
REUSE_WARP_FACES).

Scenes: --human capsule (smooth essence) or capsule_hf (high-frequency
textured essence — the harder gate; data/synthetic.py emission_color).

Usage:
  python scripts/ab_convergence.py --epochs 60 --seeds 233,17,4096 \
      --human capsule_hf \
      --variant exact "" \
      --variant reuse "REUSE_WARP_FACES: true" \
      --variant g8 "SHADE_TOPK: 8"

Each --variant takes (name, yaml-fragment) where the fragment is merged
under MODEL:.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

BASE_CFG = """\
MODEL:
  TYPE: "nerf"
  COARSE_RAY_SAMPLING: 64
  FINE_RAY_SAMPLING: -1
  sample_points_mode: "GG"
  LOSS: 'L2'
  LOSSwMask: False
  MAX_FRAMES: 16
{model_overrides}
DATASETS:
  TYPE: "synthetic"
  HUMAN: "{human}"
  SYNTHETIC_FRAMES: {frames}
  SYNTHETIC_VIEWS: {views}
  SYNTHETIC_SIZE: {size}
  SYNTHETIC_VAL_VIEW_OFFSET: 0.5
DATALOADER:
  NUM_WORKERS: {workers}
SOLVER:
  OPTIMIZER_NAME: "Adam"
  MAX_EPOCHS: {epochs}
  BASE_LR: 0.0005
  WEIGHT_DECAY: 0.0
  START_ITERS: 3000
  END_ITERS: 60000
  LR_SCALE: 0.09
  WARMUP_ITERS: {warmup}
  CHECKPOINT_PERIOD: 100
  LOG_PERIOD: 50
  BUNCH: 3000
  TRAIN_NRAYS: {nrays}
TEST:
  IMS_PER_BATCH: 1
  RAY_CHUNK: {ray_chunk}
  light_center: []
"""


def run_one(name: str, frag: str, seed: int, epochs: int, human: str,
            skip_train: bool, scene: dict) -> dict:
    exp = f"ab_{name}_s{seed}" if seed != 233 else f"ab_{name}"
    if scene["tag"]:
        exp = f"ab{scene['tag']}_{name}_s{seed}"
    cfg_path = f"/tmp/{exp}.yml"
    overrides = "".join(
        f"  {line.strip()}\n" for line in frag.split(";") if line.strip()
    )
    with open(cfg_path, "w", encoding="utf-8") as f:
        f.write(BASE_CFG.format(
            epochs=epochs, model_overrides=overrides, human=human,
            frames=scene["frames"], views=scene["views"],
            size=scene["size"], nrays=scene["nrays"],
            ray_chunk=scene["ray_chunk"], warmup=scene["warmup"],
            workers=scene["workers"],
        ))
    # no in-train val renders: the fleet evaluates final checkpoints
    # itself, and a 48-image 512^2 val every 40 epochs costs ~1-2 min per
    # occurrence on the tunnel
    env = dict(os.environ, DSNERF_SEED=str(seed), DSNERF_VAL_PERIOD="0")
    def _has_final_ckpt() -> bool:
        tag = os.path.join(ROOT, "EXP", exp, "last_checkpoint")
        if not os.path.exists(tag):
            return False
        with open(tag, encoding="utf-8") as fh:
            name = fh.read().strip()
        digits = name.split(".")[0].split("_")[-1]
        # the loop numbers epochs 0..MAX-1, so the final save is MAX-1
        return digits.isdigit() and int(digits) >= epochs - 1

    if skip_train is True or (skip_train == "existing" and _has_final_ckpt()):
        print(f"=== {exp}: skipping train (skip_train={skip_train!r}) ===",
              flush=True)
    else:
        print(f"=== training {exp} (seed {seed}) ===", flush=True)
        subprocess.run(
            [sys.executable, "main.py", "-c", cfg_path, "--exp", exp],
            cwd=ROOT, check=True, env=env,
        )
    # evaluate the LAST checkpoint with exact shading, fresh process
    eval_code = f"""
import sys; sys.path.insert(0, {ROOT!r})
import json
from dual_space_nerf_tpu.cli.common import (
    enable_compilation_cache, load_cfg, load_render_state, load_faces,
)
enable_compilation_cache()
from dual_space_nerf_tpu.cli.validate import val
from dual_space_nerf_tpu.data import select_dataset
from dual_space_nerf_tpu.evaluation import ImageRenderer
from dual_space_nerf_tpu.renderer import RenderSettings
cfg = load_cfg({cfg_path!r})
cfg.defrost()
cfg.MODEL.SHADE_TOPK = 0
cfg.MODEL.REUSE_WARP_FACES = False
with open("EXP/{exp}/last_checkpoint") as f:
    ckpt = "EXP/{exp}/" + f.read().strip()
_, val_set = select_dataset(cfg, train_nrays=cfg.SOLVER.TRAIN_NRAYS)
model, params = load_render_state(ckpt, cfg)
faces = load_faces(cfg, val_set)
renderer = ImageRenderer(
    model, params, RenderSettings.from_cfg(cfg), faces,
    val_set.canonical_vertex, chunk=cfg.TEST.RAY_CHUNK,
)
out = val(val_set, renderer, "EXP/{exp}/vis_exact", 0,
          fixed_frame=min(50, cfg.MODEL.MAX_FRAMES - 1))
print("ABRESULT " + json.dumps(out))
"""
    print(f"=== evaluating {exp} (exact shading) ===", flush=True)
    proc = subprocess.run(
        [sys.executable, "-c", eval_code], cwd=ROOT,
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        print(proc.stdout[-2000:])
        print(proc.stderr[-4000:])
        raise SystemExit(f"eval failed for {exp}")
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise SystemExit(f"no ABRESULT line for {exp}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--seeds", type=str, default="233",
                    help="comma-separated DSNERF_SEED values; >=3 for "
                         "error bars")
    ap.add_argument("--human", type=str, default="capsule",
                    choices=["capsule", "capsule_hf"],
                    help="capsule_hf = high-frequency textured essence")
    ap.add_argument(
        "--variant", nargs=2, action="append", metavar=("NAME", "YAML"),
        required=True,
    )
    ap.add_argument("--skip_train", nargs="?", const=True, default=False,
                    choices=[True, False, "existing"],
                    help="evaluate existing EXP/ab_<name>[_s<seed>] "
                         "checkpoints only; --skip_train existing trains "
                         "only the runs whose final checkpoint is missing")
    # scene-scale knobs for the >=28 dB quality gate (VERDICT r3 #5):
    # the default 2x3x96 scene gates the smoke tier; --size 512 --views 6
    # --frames 8 --nrays 5500 is the high-fidelity regime the real ZJU
    # footage lives in
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--nrays", type=int, default=1024)
    ap.add_argument("--ray_chunk", type=int, default=2048)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--tag", type=str, default="",
                    help="experiment-name tag to keep scene variants apart")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    scene = {
        "size": args.size, "views": args.views, "frames": args.frames,
        "nrays": args.nrays, "ray_chunk": args.ray_chunk,
        "warmup": args.warmup, "workers": args.workers, "tag": args.tag,
    }

    per_seed: dict = {}
    for name, frag in args.variant:
        per_seed[name] = [
            run_one(name, frag, seed, args.epochs, args.human,
                    args.skip_train, scene)
            for seed in seeds
        ]
        print(name, per_seed[name], flush=True)

    import numpy as np

    summary = {}
    for name, runs in per_seed.items():
        agg = {}
        for key in runs[0]:
            vals = np.array([r[key] for r in runs], np.float64)
            agg[key] = {
                "mean": round(float(vals.mean()), 4),
                "std": round(float(vals.std(ddof=1 if len(vals) > 1 else 0)),
                             4),
                "per_seed": [round(float(v), 4) for v in vals],
            }
        summary[name] = agg
    print(json.dumps(
        {"human": args.human, "epochs": args.epochs, "seeds": seeds,
         "results": summary},
        indent=2,
    ))


if __name__ == "__main__":
    main()
