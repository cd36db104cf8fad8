"""utils/flops: the StableHLO GEMM/conv pricer behind the MFU line.

bench.py's MFU numerator comes from `Lowered.cost_analysis()` when the
backend provides it and from `matmul_conv_flops` (this module) when it
doesn't (the axon tunnel returns None — docs/DESIGN.md). Pin the pricer
against closed-form flop counts so a regex/regression in the StableHLO
scan can't silently zero the MFU number.
"""
import jax
import jax.numpy as jnp

from object_intrinsics_tpu.utils.flops import (
    CHIP_PEAKS,
    matmul_conv_flops,
    scan_stablehlo,
)


def test_matmul_pricing_exact():
    f = jax.jit(lambda a, b: a @ b)
    low = f.lower(jnp.ones((64, 128)), jnp.ones((128, 32)))
    assert matmul_conv_flops(low.as_text()) == 2 * 64 * 128 * 32


def test_batched_and_chained_matmuls():
    def g(a, b, c):
        return (a @ b) @ c

    low = jax.jit(g).lower(
        jnp.ones((4, 16, 32)), jnp.ones((4, 32, 8)), jnp.ones((4, 8, 24))
    )
    want = 4 * (2 * 16 * 32 * 8) + 4 * (2 * 16 * 8 * 24)
    assert matmul_conv_flops(low.as_text()) == want


def test_conv_pricing_exact():
    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    low = jax.jit(conv).lower(jnp.ones((2, 8, 8, 3)), jnp.ones((3, 3, 3, 16)))
    # 2 * kh * kw * cin per output element
    want = 2 * 3 * 3 * 3 * (2 * 8 * 8 * 16)
    assert matmul_conv_flops(low.as_text()) == want


def test_min_traffic_counts_operands_and_output():
    low = jax.jit(lambda a, b: a @ b).lower(
        jnp.ones((64, 128)), jnp.ones((128, 32))
    )
    _, _, _, min_bytes = scan_stablehlo(low.as_text())
    assert min_bytes == 4 * (64 * 128 + 128 * 32 + 64 * 32)


def test_chip_peaks_cover_bench_targets():
    # bench.py looks up jax.devices()[0].device_kind; the tunnel reports
    # "TPU v5 lite" — losing that key silently drops the MFU line
    assert "TPU v5 lite" in CHIP_PEAKS
    tf, bw = CHIP_PEAKS["TPU v5 lite"]
    assert tf == 197e12 and bw == 819e9
