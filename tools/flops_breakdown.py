#!/usr/bin/env python
"""Analytic + XLA-counted FLOPs breakdown of the flagship train step.

Answers the "is it actually fast, or just faster than a weak baseline?"
question (r4 verdict ask #2) with numbers instead of vibes:

1. lowers the EXACT train step scripts/train.py runs (through the real
   config system) on the CPU backend — no TPU needed, no compile;
2. reads XLA's own HLO-level cost analysis for the exact executed
   FLOPs/step (all three players, fwd+bwd, vjp-R1, optimizer tails);
3. scans the lowered StableHLO and prices every dot_general/convolution
   from its shapes — a per-GEMM-signature table that attributes the
   matmul work to pipeline stages (fine trunk/color, coarse pass,
   weight grads, augment warps, D convs);
4. derives the roofline: per-GEMM arithmetic intensity vs the chip's
   compute/bandwidth ridge, a minimum HBM-traffic bound, and the
   step-time floor it implies.

Usage: python tools/flops_breakdown.py [--dataset D] [--bs N] [--json]

The summary JSON is what docs/DESIGN.md's MFU section cites; bench.py
computes the headline MFU from the same cost-analysis number (stashed by
the trainer at AOT-lower time) against the measured step time.
"""
import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e chip datasheet numbers (per chip): 197 TFLOP/s bf16 dense on the MXU,
# 819 GB/s HBM. OI_MATMUL_PRECISION='high' (the field-MLP default) runs
# fp32-precision matmuls as 3 bf16 MXU passes => ~197/3 effective compute
# peak for those GEMMs; activations still move as fp32.
# CHIP_PEAKS / scan_stablehlo live in the package so the trainer can price
# the step when the backend's cost_analysis is unavailable (axon returns
# None) — this tool keeps the decomposition/roofline presentation.
from object_intrinsics_tpu.utils.flops import (  # noqa: E402
    CHIP_PEAKS,
    DEFAULT_KIND,
    scan_stablehlo,
)


def classify(sig: str, rays: int, s_fine: int, s_coarse: int) -> str:
    """Attribute a GEMM signature to a pipeline stage by its M dimension."""
    m_fine, m_coarse = rays * s_fine, rays * s_coarse
    dims = [int(d) for d in sig.split(" @ ")[0].split("x")]
    if m_fine in dims and sig.split("-> ")[1].startswith("128x"):
        return "weight-grad GEMMs (G step only)"
    if m_fine in dims:
        return f"fine-sample field GEMMs ({s_fine}/ray)"
    if m_coarse in dims:
        return f"coarse-pass trunk GEMMs ({s_coarse}/ray, no grad)"
    if any(d > 100000 for d in dims):
        return "other large field GEMMs"
    return "small GEMMs (augment warps, pose math, mapping)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/root/reference/data/example")
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--json", action="store_true", help="summary JSON only")
    ap.add_argument("--it-per-sec", type=float, default=None,
                    help="measured throughput; adds MFU/BW-utilization lines")
    ap.add_argument("--device-kind", default=DEFAULT_KIND)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import object_intrinsics_tpu  # noqa: F401
    from object_intrinsics_tpu.utils.config import build_from_config
    from object_intrinsics_tpu.utils.train_setup import build_modules, get_cfg, get_parser

    train_args = get_parser().parse_args(["-d", args.dataset, "-o", "-t", "flops"])
    cfg = get_cfg(train_args, freeze=False)
    modules = build_modules(cfg, seed=0)
    trainer = build_from_config(cfg["trainer"], modules=modules, writer=None, mesh=None)
    res = cfg["resolution"]
    rcfg = modules["generator"].rcfg
    rays = res * res
    s_coarse = rcfg.n_samples
    s_fine = rcfg.n_samples + rcfg.n_importance

    batch = {
        "image": jax.numpy.zeros((args.bs, res, res, 3), np.float32),
        "mask": jax.numpy.zeros((args.bs, res, res, 1), np.float32),
    }
    step = trainer._build_step(args.bs)
    lowered = step.lower(trainer.state, batch, jax.random.PRNGKey(0))

    ca = lowered.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    total_flops = float(ca["flops"])

    flops, counts, conv_flops, min_gemm_bytes = scan_stablehlo(lowered.as_text())
    gemm_flops = sum(flops.values())

    stages = collections.Counter()
    for sig, f in flops.items():
        stages[classify(sig, rays, s_fine, s_coarse)] += f
    stages["discriminator convolutions"] = conv_flops

    peak_flops, peak_bw = CHIP_PEAKS.get(args.device_kind, CHIP_PEAKS[DEFAULT_KIND])
    ridge = peak_flops / peak_bw  # flops/byte at which compute = bandwidth
    # dominant GEMM class AI: (M,128)@(128,128) fp32 — 2*M*128*128 flops over
    # ~(2*M*128)*4 bytes of activation traffic
    ai_field = 2 * 128 * 128 / (2 * 128 * 4)

    summary = {
        "config": f"{res}px bs={args.bs}, {s_coarse}+{rcfg.n_importance} samples/ray, 3 renders/step",
        "xla_flops_per_step": total_flops,
        "matmul_flops_per_step": gemm_flops + conv_flops,
        "matmul_fraction": round((gemm_flops + conv_flops) / total_flops, 4),
        "min_gemm_traffic_bytes": min_gemm_bytes,
        "device_kind": args.device_kind,
        "peak_bf16_flops": peak_flops,
        "peak_hbm_bytes_per_sec": peak_bw,
        "ridge_flops_per_byte": round(ridge, 1),
        "field_gemm_flops_per_byte": round(ai_field, 1),
        "min_step_ms_bandwidth_bound": round(min_gemm_bytes / peak_bw * 1e3, 2),
        "min_step_ms_compute_bound": round(total_flops / peak_flops * 1e3, 2),
    }
    if args.it_per_sec:
        dt = 1.0 / args.it_per_sec
        summary["measured_it_per_sec"] = args.it_per_sec
        summary["mfu_vs_bf16_peak"] = round(total_flops / dt / peak_flops, 4)
        summary["matmul_mfu_vs_bf16_peak"] = round(
            (gemm_flops + conv_flops) / dt / peak_flops, 4
        )
        summary["min_hbm_bw_utilization"] = round(min_gemm_bytes / dt / peak_bw, 4)

    if args.json:
        print(json.dumps(summary))
        return
    print(f"== train step: {summary['config']} ==")
    print(f"XLA-counted flops/step : {total_flops/1e9:10.2f} GF (exact, incl. all autodiff)")
    print(f"matmul+conv flops/step : {(gemm_flops+conv_flops)/1e9:10.2f} GF "
          f"({summary['matmul_fraction']*100:.1f}% of executed flops)")
    print("\nper-stage matmul attribution:")
    for stage, f in stages.most_common():
        print(f"  {f/1e9:9.2f} GF  {stage}")
    print("\ntop GEMM signatures:")
    for sig, f in flops.most_common(10):
        print(f"  {f/1e9:9.2f} GF  x{counts[sig]:3d}  {sig}")
    print(f"\nroofline ({args.device_kind}: {peak_flops/1e12:.0f} TF/s bf16, "
          f"{peak_bw/1e9:.0f} GB/s HBM, ridge {ridge:.0f} flops/byte):")
    print(f"  field GEMMs run at ~{ai_field:.0f} flops/byte -> memory-bound "
          f"({ridge/ai_field:.1f}x below the ridge); precision passes are free")
    print(f"  min GEMM activation traffic: {min_gemm_bytes/1e9:.2f} GB/step "
          f"-> >= {summary['min_step_ms_bandwidth_bound']:.1f} ms/step at peak BW")
    print(f"  pure-compute floor: {summary['min_step_ms_compute_bound']:.2f} ms/step at bf16 peak")
    if args.it_per_sec:
        print(f"\nat the measured {args.it_per_sec} it/s "
              f"({1e3/args.it_per_sec:.1f} ms/step):")
        print(f"  MFU vs bf16 peak        : {summary['mfu_vs_bf16_peak']*100:.2f}%")
        print(f"  min HBM BW utilization  : {summary['min_hbm_bw_utilization']*100:.1f}% "
              f"(floor — real traffic includes elementwise/layout/optimizer bytes)")
    print("\nsummary-json: " + json.dumps(summary))


if __name__ == "__main__":
    main()
