"""Default config tree.

Mirrors the reference yacs tree (`/root/reference/configs/defaults.py:17-113`)
so the per-subject YAMLs (`configs/zju_mocap/*.yml`, `configs/h36m/*.yml`) are
drop-in, plus TPU-specific knobs the reference does not have (precision,
sharding, chunk sizes, paths overridable without editing source).
"""

from .node import CfgNode as CN

_C = CN()

_C.MODEL = CN()
_C.MODEL.TYPE = "nerfW"
_C.MODEL.DEVICE = "tpu"
_C.MODEL.COARSE_RAY_SAMPLING = 64
_C.MODEL.FINE_RAY_SAMPLING = 64
_C.MODEL.SAMPLE_METHOD = "NEAR_FAR"
_C.MODEL.BOARDER_WEIGHT = 1e10
_C.MODEL.SAME_SPACENET = False
_C.MODEL.BACKBONE_DIM = 256

_C.MODEL.TKERNEL_INC_RAW = True
_C.MODEL.POSE_REFINEMENT = False

_C.MODEL.USE_DIR = True
_C.MODEL.perturb = 1.0
_C.MODEL.raw_noise_std = 1.0

_C.MODEL.BLENDING_SCHEME = "VOLUME RENDERING"
_C.MODEL.EMBED_TYPE = "POSITIONAL"
_C.MODEL.sample_points_mode = "uniform"  # "uniform" | "GG"
_C.MODEL.LOSS = "L2"  # 'L1', 'L2'
_C.MODEL.LOSSwMask = False

# --- TPU-specific model/runtime knobs (not in reference) -------------------
_C.MODEL.MAX_FRAMES = 500          # nn.Embedding(500, 8) (spacenet.py:41)
_C.MODEL.CODE_DIM = 8
_C.MODEL.MLP_CHUNK = -1            # points per lax.map microbatch; <= 0 = auto (16384 gated / 8192 full shading — see renderer.pipeline.resolve_mlp_chunk for the v5e sweeps)
_C.MODEL.MATMUL_PRECISION = "f32"  # "f32" | "bf16" matmul accumulation input
_C.MODEL.KNN_IMPL = "auto"         # "auto" | "listed" | "pruned" | "pallas" | "xla" | "grouped" | "clustered"
# jax.checkpoint the per-point network. "auto" = remat exactly when
# SHADE_TOPK is off: full-shading's second-order graph over all samples is
# HBM-heavy and measures ~5% FASTER under remat on v5e (69.5 vs 73.4 ms
# solo), while the gated config pays ~1 ms for it (43.2 vs 44.3 ms).
_C.MODEL.REMAT = "auto"            # "auto" | True | False
# Importance-gated shading: evaluate density at every sample but run the
# color path (canonical KNN + transport + vjp normal + LightingMLP) only on
# the top-K samples per ray by compositing weight. 0/-1 = off (shade all
# samples, reference-exact). The weights' tail bounds the approximation.
_C.MODEL.SHADE_TOPK = 0
# Reuse the world warp's nearest-face id for the canonical->world normal
# transport instead of re-running the canonical-space KNN (the reference
# re-searches, spacenet.py:278-298; the results agree for ~all near-surface
# samples). Approximation; off by default.
_C.MODEL.REUSE_WARP_FACES = False
# Fused SpaceNet Pallas kernels (ops/fused_mlp.py): the whole density/
# essence/normal matmul chain (forward + hand-derived second-order backward)
# runs with weights + one activation block resident in VMEM. Exact vs the
# jax.vjp path (f32 roundoff); requires the default architecture
# (CODE_DIM=8, backbone 256, essence 3, PE L=10) — silently falls back to
# the XLA path otherwise. "auto" (default) currently resolves to OFF
# everywhere: r3 step-level A/Bs on v5e measured the fused pair LOSING in
# every composed configuration once the XLA paths adopted the face-id
# dataflow — exact train 61.7k vs 81.3k rays/s, eval render 80.0k vs
# 132.2k (bench/r3) — despite winning the isolated network fwd+bwd
# (an artifact of the axon per-call dispatch floor). "on" forces the
# kernels for A/Bs; they stay exactness-pinned in tests/test_fused_mlp.py.
_C.MODEL.FUSED_MLP = "auto"
_C.MODEL.FUSED_BLOCK = 512         # points per fused-kernel grid block
# one-pass bf16 MXU feeds inside the fused kernels (XLA-DEFAULT numerics
# for the Dense layers they replace); measured perf-neutral on v5e, so the
# default keeps Mosaic's exact multi-pass f32 dots
_C.MODEL.FUSED_FAST = False

# ----------------------------------------------------------------------------
# Dataset
# ----------------------------------------------------------------------------
_C.DATASETS = CN()
_C.DATASETS.TYPE = "zju_mocap"  # zju_mocap | h36m | synthetic
_C.DATASETS.HUMAN = "CoreView_313"

# Overridable via env DSNERF_ZJU_PATH / DSNERF_H36M_PATH / DSNERF_SMPL_PATH
_C.DATASETS.ZJU_MOCAP_PATH = "data/zju_mocap"
_C.DATASETS.H36M_PATH = "data/h36m"
_C.DATASETS.SMPL_PATH = "data/smpl/SMPL_NEUTRAL.pkl"

# Asset-free synthetic scene (DATASETS.TYPE = "synthetic") scale knobs.
# Defaults reproduce the original 2-pose x 3-view 96x96 smoke scene.
# VAL_VIEW_OFFSET rotates the val cameras by a fraction of the angular
# view spacing (0.5 = halfway between train cameras -> genuinely novel
# views for convergence/quality runs).
_C.DATASETS.SYNTHETIC_FRAMES = 2
_C.DATASETS.SYNTHETIC_VIEWS = 3
_C.DATASETS.SYNTHETIC_SIZE = 96
_C.DATASETS.SYNTHETIC_VAL_VIEW_OFFSET = 0.0

_C.DATALOADER = CN()
_C.DATALOADER.NUM_WORKERS = 8
_C.DATALOADER.PREFETCH = 2
# "thread" (default; cv2/numpy release the GIL for the heavy parts) or
# "process" (forked workers — for hosts where the Python-level pixel
# sampler caps thread scaling; DSNERF_LOADER_BACKEND also overrides)
_C.DATALOADER.BACKEND = "thread"

# ----------------------------------------------------------------------------
# Solver
# ----------------------------------------------------------------------------
_C.SOLVER = CN()
_C.SOLVER.OPTIMIZER_NAME = "SGD"

_C.SOLVER.MAX_EPOCHS = 50

_C.SOLVER.BASE_LR = 0.001
_C.SOLVER.BIAS_LR_FACTOR = 2

_C.SOLVER.MOMENTUM = 0.9

_C.SOLVER.WEIGHT_DECAY = 0.0005
_C.SOLVER.WEIGHT_DECAY_BIAS = 0.0

_C.SOLVER.GAMMA = 0.1
_C.SOLVER.STEPS = (30000,)

_C.SOLVER.WARMUP_FACTOR = 1.0 / 3
_C.SOLVER.WARMUP_ITERS = 500
_C.SOLVER.WARMUP_METHOD = "linear"

_C.SOLVER.CHECKPOINT_PERIOD = 10
_C.SOLVER.TEST_PERIOD = 1000
_C.SOLVER.LOG_PERIOD = 100
_C.SOLVER.BUNCH = 4096
_C.SOLVER.START_ITERS = 50
_C.SOLVER.END_ITERS = 200
_C.SOLVER.LR_SCALE = 0.1
_C.SOLVER.COARSE_STAGE = 10

_C.SOLVER.IMS_PER_BATCH = 16
_C.SOLVER.TRAIN_NRAYS = 5500       # rays per train step (main.py:94)

_C.TEST = CN()
_C.TEST.IMS_PER_BATCH = 8
_C.TEST.WEIGHT = ""
_C.TEST.SAMPLE_NUMS = 100000
_C.TEST.STEP_SIZE = 1
_C.TEST.STEP_NUM = 2
_C.TEST.light_center = []
# rays per eval chunk (the reference uses 3072, can_render.py:257). Swept
# on v5e at 512x512 with pipelined D2H (scripts/bench_eval.py, bench/r3).
# Post slot-ids + mlp_chunk-auto (2026-08-19): 4096 = 90.8k, 8192 =
# 171.4k, 16384 = 155.5k, 32768 = 155.4k rays/s.
_C.TEST.RAY_CHUNK = 8192
_C.TEST.LPIPS_WEIGHTS = ""         # optional path to LPIPS weights; gated if empty

_C.OUTPUT_DIR = ""


def get_cfg_defaults() -> CN:
    """Return a fresh clone of the default config tree."""
    return _C.clone()
