#!/usr/bin/env python3
"""Roofline / MFU accounting for the ZJU-313 train step on TPU v5e.

Counts the FLOPs and HBM bytes each pipeline stage fundamentally requires
(the math the semantics demand, not what today's implementation happens to
execute) and divides by v5e peaks, so the measured step times translate
into "how far from speed-of-light" — and round N+1 knows whether another
2x exists.

v5e peaks (public): 197 TFLOP/s bf16 MXU (f32 inputs run the MXU's
one-pass bf16 feed under XLA DEFAULT precision — ~80 TFLOP/s observed on
this model's matmuls), 819 GB/s HBM.

All counts are per train step: 5500 rays x 64 samples = 352k points,
V=6890 / F=13776.

Usage: python scripts/roofline.py [--ms-gated 36.6 --ms-exact 67.4]
"""

from __future__ import annotations

import argparse

R, S = 5500, 64
N = R * S
V, F = 6890, 13776
K = 8  # gated top-k

PEAK_MXU = 197e12      # bf16 FLOP/s
PEAK_MXU_F32IN = 80e12 # observed on these layer widths (README)
PEAK_HBM = 819e9       # B/s


def mlp_flops():
    """MACs per point for each network piece (x2 FLOPs/MAC)."""
    stage1 = 87 * 256 + 3 * 256 * 256
    stage2 = (256 + 63) * 256 + 2 * 256 * 256
    density = 256 * 1
    essence = 256 * 128 + 128 * 3
    lighting = 9 * 128 + 128 * 128 + 128 * 1
    return {
        "density_fwd": 2 * (stage1 + stage2 + density),      # sigma only
        "essence_fwd": 2 * essence,
        "lighting_fwd": 2 * lighting,
        "backbone_fwd": 2 * (stage1 + stage2 + density + essence),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms-gated", type=float, default=36.6)
    ap.add_argument("--ms-exact", type=float, default=67.4)
    args = ap.parse_args()

    m = mlp_flops()

    # --- network FLOPs ---
    # normal = d(sigma)/d(x): one reverse pass over the density branch
    # (~= its forward cost). Training backward differentiates the whole
    # graph INCLUDING that reverse pass (second order): ~2x the (forward +
    # normal) cost. Net multiplier on the density branch ~ (1 fwd + 1
    # normal + 2 bwd) = 4x fwd; on essence/lighting ~ 3x fwd (fwd + bwd
    # activations + bwd weights).
    density_train = 4 * m["density_fwd"]
    color_train = 3 * (m["essence_fwd"] + m["lighting_fwd"])
    # the vjp normal also needs the backbone forward activations; counted in
    # density_train already (shared backbone).

    gated_flops = N * density_train + R * K * (
        density_train + color_train  # gated recomputes the backbone on top-K
    )
    exact_flops = N * (density_train + color_train)

    # --- KNN FLOPs (d2 work the listed kernel actually performs) ---
    # whole-block plans: ~31 visited 128-face tiles per 2048-pt block
    # (scripts/knn_plan_stats.py); 8 FLOPs per point-face d2.
    visits = 31
    knn_flops = (N / 2048) * visits * 2048 * 128 * 8
    gg_flops = R * V * 8  # sphere near/far tighten, one pass

    # --- HBM bytes (fundamental traffic) ---
    # per point: 3x f32 world pos in, 4x f32 (rgb, sigma) out, plus the
    # (N, 87) packed MLP input written+read once if not fused into the
    # matmul (XLA materializes it), plus activations that cannot stay in
    # registers: ~6 (N, 256) f32 round-trips for fwd+bwd under XLA.
    bytes_gated = N * (3 + 4) * 4 + N * 87 * 4 * 2 + N * 256 * 4 * 6
    bytes_exact = bytes_gated + R * K * 0  # same order; color adds (N,small)

    for name, flops, ms in (
        ("gated (prod)", gated_flops + knn_flops + gg_flops, args.ms_gated),
        ("exact (ref semantics)", exact_flops + knn_flops * 2 + gg_flops,
         args.ms_exact),
    ):
        t_mxu = flops / PEAK_MXU_F32IN * 1e3
        t_hbm = bytes_gated / PEAK_HBM * 1e3
        bound = max(t_mxu, t_hbm)
        print(f"{name:24s}: {flops/1e12:6.3f} TFLOP  "
              f"MXU-bound {t_mxu:5.2f} ms | HBM-bound {t_hbm:5.2f} ms | "
              f"measured {ms:5.1f} ms | MFU {flops/ (ms/1e3) / PEAK_MXU *100:4.1f}% "
              f"| light-speed gap {ms/bound:4.1f}x")


if __name__ == "__main__":
    main()
