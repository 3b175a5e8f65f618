#!/usr/bin/env python
"""Analytic FLOPs / MFU / roofline accounting for the EGNN pipeline.

Counts exact multiply-add FLOPs for the score-network forward (per layer,
from the reference dimensions: ``diffusion/model.py:336-421``), the train
step (fwd + bwd ~ 3x fwd for matmul-dominated graphs), and the T-step
sampler, then reports achieved TFLOP/s and model FLOP utilization (MFU)
for the measured throughput numbers in docs/status.md.

Peaks used (TPU v5e, one chip): 197 TFLOP/s bf16 MXU; f32 matmuls run as
multi-pass bf16 (6 passes at precision=HIGHEST), effective ~49 TFLOP/s;
HBM ~819 GB/s. MFU is reported against the precision actually used.
"""

import argparse
import json
import sys

BF16_PEAK = 197e12
F32_PEAK = 49e12  # HIGHEST-precision matmuls: ~4-6 bf16 passes
F32X3_PEAK = BF16_PEAK / 3  # --fast-f32: exactly 3 bf16 passes
HBM_BW = 819e9


def layer_flops(B, N=16, P=80, H=23, T=64, M=64, O=64, E=31):
    """Exact MAC-based FLOPs (2 per MAC) for one EGNN layer forward."""
    NP = N + P
    R = B * N * NP
    f = 0
    # message: a_i [B,N,H]@[H,T], a_j [B,NP,H]@[H,T], lin2 R@[T,M]
    f += 2 * B * N * H * T + 2 * B * NP * H * T + 2 * R * T * M
    f += 3 * R * T  # pre-activation adds (a_i + a_j + edge + bias)
    # attention: lin1 R@[M,T] + 2 rank-1 terms, lin2 R@[T,1]
    f += 2 * R * M * T + 4 * R * T + 2 * R * T * 1
    # feature: [B,N,H+M]@[.,T] + [B,N,T]@[T,O]
    f += 2 * B * N * (H + M) * T + 2 * B * N * T * O
    # translation: lin1 R@[M,T], lin2 R@[T,1]
    f += 2 * R * M * T + 2 * R * T * 1
    # rotation: lin1 R@[M+4,T], lin2 R@[T,4], 3 quat products (~28 ops ea)
    f += 2 * R * (M + 4) * T + 2 * R * T * 4 + 3 * 28 * R
    # torsion: lin1 R@[M,T] + node [B,N,14]@[14,T], lin2 R@[T,7]
    f += 2 * R * M * T + 2 * B * N * 14 * T + 2 * R * T * 7
    # softmax + weighted reductions (exp, normalize, 4 weighted sums)
    f += R * (4 + 4 + 7 + 3 + M)
    return f


def forward_flops(B, I=64, M=64):
    """Two layers: H=23 -> O=I, then H=I -> O=1 (model.py:370-371).
    ``I``/``M`` generalize to scaled score networks
    (ScoreNetworkConfig.inner_size / message_size).

    The MLP hidden ("transition") width is the architecture's
    hardcoded 64 (reference model.py:36, our egnn.py TRANSITION) and
    does NOT scale with I/M — scaled-dims FLOPs grow roughly linearly
    in M (every head lin1 contracts over M into 64 hidden units), not
    quadratically. An earlier revision passed T=I here, overcounting
    scaled-dims FLOPs ~2-5x (at reference dims T=I=64 coincide, so
    all reference-dims MFU numbers were unaffected)."""
    T = 64  # transition width: fixed by the architecture
    return (layer_flops(B, H=23, T=T, M=M, O=I)
            + layer_flops(B, H=I, T=T, M=M, O=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--inner-size", type=int, default=64)
    ap.add_argument("--message-size", type=int, default=64)
    args = ap.parse_args()

    B = args.batch
    if (args.inner_size, args.message_size) != (64, 64):
        # scaled-dims accounting only (the measured table below is
        # reference-dims); used by the docs/status.md MFU-vs-dims table
        fwd = forward_flops(B, args.inner_size, args.message_size)
        print(json.dumps({
            "batch": B, "inner_size": args.inner_size,
            "message_size": args.message_size,
            "forward_gflops": round(fwd / 1e9, 2),
            "train_step_gflops": round(3 * fwd / 1e9, 2),
        }))
        return
    fwd = forward_flops(B)
    train = 3 * fwd  # bwd ~ 2x fwd for matmul-dominated graphs
    print(json.dumps({
        "batch": B,
        "forward_gflops": round(fwd / 1e9, 2),
        "train_step_gflops": round(train / 1e9, 2),
        "sampler_T1000_gflops_per_batch": round(fwd * 1000 / 1e9, 1),
    }))

    # measured numbers from docs/status.md (one v5e chip)
    measured = [
        # (name, batch, steps_per_sec, precision, kind)
        # pallas_lane / g8 backends, 2026-08-17 (docs/status.md tables)
        ("train f32 B=64", 64, 261.5, "f32", "train"),
        ("train bf16 B=64 (g8)", 64, 1036.4, "bf16", "train"),
        ("train f32 B=1024", 1024, 17500 / 1024, "f32", "train"),
        ("train bf16 B=1024", 1024, 61100 / 1024, "bf16", "train"),
        ("sample f32 B=64 (71.6/s)", 64, 71.6 / 64 * 1000, "f32", "fwd"),
        ("sample bf16 B=64 (g8, 266.7/s)", 64, 266.7 / 64 * 1000, "bf16", "fwd"),
        ("sample bf16 B=256 (g8, 317/s)", 256, 317.0 / 256 * 1000, "bf16", "fwd"),
    ]
    for name, b, per_sec, prec, kind in measured:
        flops = (3 if kind == "train" else 1) * forward_flops(b)
        achieved = flops * per_sec
        peak = F32_PEAK if prec == "f32" else BF16_PEAK
        print(json.dumps({
            "config": name,
            "achieved_tflops": round(achieved / 1e12, 2),
            "mfu_pct": round(100 * achieved / peak, 2),
            "peak_tflops": peak / 1e12,
        }))

    # roofline: arithmetic intensity of the dominant R x 64 x 64 matmuls
    # if activations stream HBM<->MXU unfused (the XLA path's worst case)
    ai = (2 * 64 * 64) / ((64 + 64) * 4)
    ridge_f32 = F32_PEAK / HBM_BW
    print(json.dumps({
        "dominant_matmul_arith_intensity_flop_per_byte": round(ai, 1),
        "v5e_ridge_point_f32": round(ridge_f32, 1),
        "hbm_bound_if_unfused": ai < ridge_f32,
    }))


if __name__ == "__main__":
    main()
