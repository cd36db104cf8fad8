"""FLOP pricing of lowered programs, host-side and backend-independent.

``jax.stages.Lowered.cost_analysis()`` is the preferred exact count (all
ops, all autodiff), but it is backend-optional and returns ``None`` on the
axon TPU tunnel. :func:`scan_stablehlo` is the fallback the trainer and
bench.py use there: price every ``dot_general``/``convolution`` in the
lowered StableHLO text from its static shapes. At the parity config the
matmul+conv share is 93.3% of the XLA-counted total (measured on the CPU
lowering, docs/results/flops_breakdown.txt), so the fallback undercounts
MFU by ~7% — the emitted ``flops_source`` field says which count a number
came from. Full decomposition + roofline: tools/flops_breakdown.py.

Conv caveat: the convolution formula assumes the forward HWIO kernel
layout (2*kh*kw*cin per output element); the backward's grad-x/grad-w
convolutions carry transposed/activation-shaped rhs operands and are
mispriced by ~10-15% each. Convs are 1.2% of the parity step's flops so
the MFU impact there is <0.2%, but do not trust the fallback for a
conv-dominated model — use the CPU lowering's exact cost_analysis
(tools/flops_breakdown.py) instead.
"""
import collections
import math
import re

CHIP_PEAKS = {
    # device_kind -> (bf16 TFLOP/s, HBM GB/s)
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v5": (459e12, 2765e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v6e": (918e12, 1640e9),
}
DEFAULT_KIND = "TPU v5 lite"  # the chip every number in docs/DESIGN.md used


def _shape(s: str):
    dims = s.split("<")[1].split(">")[0].split("x")
    return [int(d) for d in dims[:-1]] or [1]


def scan_stablehlo(txt: str):
    """Price every dot_general/convolution in a lowered StableHLO module.

    Returns (per-signature flops, per-signature counts, conv flops,
    min-traffic bytes). Min traffic counts, per GEMM, one read of each
    operand + one write of the output at its stated dtype — the floor XLA
    cannot fuse away (weights are tiny and ignored for the bound's
    purposes; elementwise chains fuse into producers/consumers)."""
    dg = re.compile(
        r"stablehlo\.dot_general[^\n]*contracting_dims = \[([0-9, ]*)\] x "
        r"\[[0-9, ]*\][^\n]*: \(tensor<([^>]*)>, tensor<([^>]*)>\) -> tensor<([^>]*)>"
    )
    cv = re.compile(
        r"stablehlo\.convolution[^\n]*feature_group_count = (\d+)[^\n]*: "
        r"\(tensor<([^>]*)>, tensor<([^>]*)>\) -> tensor<([^>]*)>"
    )

    def dtype_bytes(s):
        return {"f32": 4, "bf16": 2, "f16": 2, "f64": 8}.get(
            s.split("<")[1].split(">")[0].split("x")[-1], 4
        )

    flops = collections.Counter()
    counts = collections.Counter()
    min_bytes = 0
    for m in dg.finditer(txt):
        cd = [int(x) for x in m.group(1).split(",") if x.strip()]
        lhs_s, rhs_s, out_s = (f"tensor<{m.group(i)}>" for i in (2, 3, 4))
        lhs, rhs, out = _shape(lhs_s), _shape(rhs_s), _shape(out_s)
        k = 1
        for d in cd:
            k *= lhs[d]
        f = 2 * k
        for d in out:
            f *= d
        sig = "{} @ {} -> {}".format(
            "x".join(map(str, lhs)), "x".join(map(str, rhs)), "x".join(map(str, out))
        )
        flops[sig] += f
        counts[sig] += 1
        min_bytes += (
            math.prod(lhs) * dtype_bytes(lhs_s)
            + math.prod(rhs) * dtype_bytes(rhs_s)
            + math.prod(out) * dtype_bytes(out_s)
        )
    conv_flops = 0
    for m in cv.finditer(txt):
        rhs = _shape(f"tensor<{m.group(3)}>")  # [kh, kw, cin/fg, cout]
        out = _shape(f"tensor<{m.group(4)}>")
        f = 2 * rhs[0] * rhs[1] * rhs[2]
        for d in out:
            f *= d
        conv_flops += f
    return flops, counts, conv_flops, min_bytes


def matmul_conv_flops(stablehlo_text: str) -> float:
    """Total priced matmul+conv flops of a lowered module (the fallback
    MFU numerator when the backend's cost_analysis is unavailable)."""
    flops, _, conv, _ = scan_stablehlo(stablehlo_text)
    return float(sum(flops.values()) + conv)
