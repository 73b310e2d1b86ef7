#!/bin/bash
# TPU convergence showcase on the asset-free synthetic scene: train the
# production config (configs/showcase_synthetic.yml), evaluate the final
# checkpoint with EXACT reference-semantics shading on novel val views,
# and render the relighting sweep video. Run in the FOREGROUND to
# completion (SIGTERM mid-step wedges the axon remote executor).
#
# Artifacts: EXP/showcase_tpu/ (log, TB, checkpoints),
#            EXP/showcase_tpu/vis_exact/ (novel-view renders + metrics),
#            vis_lighting/showcase_tpu/relight.mp4
set -eu
cd "$(dirname "$0")/.."

exp=${1:-showcase_tpu}
cfg=${2:-configs/showcase_synthetic.yml}

python main.py -c "$cfg" --exp "$exp"

ckpt="EXP/$exp/$(cat EXP/$exp/last_checkpoint)"

# exact-shading novel-view eval: quality numbers carry no approximation
python - "$cfg" "$exp" "$ckpt" <<'PY'
import json, sys
cfg_path, exp, ckpt = sys.argv[1:4]
from dual_space_nerf_tpu.cli.common import load_cfg, load_render_state, load_faces
from dual_space_nerf_tpu.cli.validate import val
from dual_space_nerf_tpu.data import select_dataset
from dual_space_nerf_tpu.evaluation import ImageRenderer
from dual_space_nerf_tpu.renderer import RenderSettings
cfg = load_cfg(cfg_path)
cfg.defrost()
cfg.MODEL.SHADE_TOPK = 0
cfg.MODEL.REUSE_WARP_FACES = False
_, val_set = select_dataset(cfg, train_nrays=cfg.SOLVER.TRAIN_NRAYS)
model, params = load_render_state(ckpt, cfg)
faces = load_faces(cfg, val_set)
renderer = ImageRenderer(
    model, params, RenderSettings.from_cfg(cfg), faces,
    val_set.canonical_vertex, chunk=cfg.TEST.RAY_CHUNK,
)
out = val(val_set, renderer, f"EXP/{exp}/vis_exact", 0,
          fixed_frame=min(50, cfg.MODEL.MAX_FRAMES - 1))
print("SHOWCASE_EVAL " + json.dumps(out))
PY

python vis_lighting.py -c "$cfg" --exp "$exp" --ckpt "$ckpt"

echo "showcase done -> EXP/$exp, vis_lighting/$exp"
