"""Per-draw golden tests of the non-default AugmentPipe branches (color /
imgfilter / noise / cutout) against the reference's torch pipe
(/root/reference/src/third_party/ada/augment.py:307-427).

RNG bypass: our pipe runs with patched jax.random.uniform/normal that draw
from numpy and RECORD each draw; the reference pipe then runs with patched
torch.rand/randn that REPLAY the same draws (transposing the one NHWC-shaped
noise tensor to NCHW). Outputs must match elementwise — any sign/convention
error in a branch shows up directly, not statistically.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

BS, H, W = 8, 32, 32


@pytest.fixture(scope="module")
def ref_augment_module():
    if "pkg_resources" not in sys.modules:
        shim = types.ModuleType("pkg_resources")
        try:
            from packaging.version import parse as _pv
        except Exception:  # pragma: no cover
            _pv = lambda v: v
        shim.parse_version = _pv
        sys.modules["pkg_resources"] = shim
    sys.path.insert(0, REF)
    from src.third_party.ada import augment as ref_aug

    return ref_aug


class DrawTape:
    """Records (kind, canonical ndarray) draws from our pipe, replays them
    into the reference's torch pipe."""

    def __init__(self, seed):
        self.rng = np.random.RandomState(seed)
        self.tape = []
        self.pos = 0

    # -- recording side (jax) --
    def record_uniform(self, key, shape=(), dtype=None, minval=0.0, maxval=1.0, **kw):
        import jax.numpy as jnp

        arr = self.rng.uniform(0.0, 1.0, size=shape).astype(np.float32)
        self.tape.append(("u", arr))
        lo, hi = np.float32(minval), np.float32(maxval)
        return jnp.asarray(arr * (hi - lo) + lo)

    def record_normal(self, key, shape=(), dtype=None, **kw):
        import jax.numpy as jnp

        arr = self.rng.standard_normal(size=shape).astype(np.float32)
        self.tape.append(("n", arr))
        return jnp.asarray(arr)

    # -- replay side (torch) --
    def _pop(self, kind, size):
        import torch

        assert self.pos < len(self.tape), "reference drew more randoms than ours"
        k, arr = self.tape[self.pos]
        self.pos += 1
        assert k == kind, f"draw #{self.pos}: kind mismatch ours={k} ref={kind}"
        size = tuple(size)
        assert arr.size == int(np.prod(size)), (arr.shape, size)
        if arr.ndim == 4 and len(size) == 4 and arr.shape != size:
            arr = np.transpose(arr, (0, 3, 1, 2))  # NHWC draw -> NCHW request
        return torch.tensor(arr.reshape(size))

    def replay_rand(self, *args, **kw):
        size = args[0] if isinstance(args[0], (list, tuple)) else args
        return self._pop("u", size)

    def replay_randn(self, *args, **kw):
        size = args[0] if isinstance(args[0], (list, tuple)) else args
        return self._pop("n", size)


BRANCH_CONFIGS = {
    "color": dict(brightness=0.8, contrast=0.7, lumaflip=0.6, hue=0.9, saturation=0.7),
    "imgfilter": dict(imgfilter=0.8),
    "noise": dict(noise=0.7),
    "cutout": dict(cutout=0.6),
    "all_corruptions": dict(
        brightness=0.8, contrast=0.7, lumaflip=0.6, hue=0.9, saturation=0.7,
        imgfilter=0.8, noise=0.7, cutout=0.6,
    ),
}


def _run_pair(ref_augment_module, kwargs, channels, seed=0):
    import jax
    import jax.numpy as jnp
    import torch

    from object_intrinsics_tpu.models.augment import AugmentPipe

    rng = np.random.RandomState(100 + seed)
    x = rng.rand(BS, H, W, channels).astype(np.float32)

    tape = DrawTape(seed)
    ours_pipe = AugmentPipe(**kwargs, p=1.0)
    orig_u, orig_n = jax.random.uniform, jax.random.normal
    jax.random.uniform, jax.random.normal = tape.record_uniform, tape.record_normal
    try:
        ours = np.asarray(ours_pipe(jax.random.PRNGKey(0), jnp.asarray(x)))
    finally:
        jax.random.uniform, jax.random.normal = orig_u, orig_n

    ref_pipe = ref_augment_module.AugmentPipe(**kwargs)
    ref_pipe.p.copy_(torch.tensor(1.0))
    orig_rand, orig_randn = torch.rand, torch.randn
    torch.rand, torch.randn = tape.replay_rand, tape.replay_randn
    try:
        ref = ref_pipe(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    finally:
        torch.rand, torch.randn = orig_rand, orig_randn
    ref = np.transpose(ref.detach().numpy(), (0, 2, 3, 1))

    assert tape.pos == len(tape.tape), (
        f"ours drew {len(tape.tape)} randoms, reference consumed {tape.pos}"
    )
    return ours, ref


@pytest.mark.parametrize("branch", sorted(BRANCH_CONFIGS))
@pytest.mark.parametrize("seed", [0, 1])
def test_branch_matches_reference_per_draw(ref_augment_module, branch, seed):
    ours, ref = _run_pair(ref_augment_module, BRANCH_CONFIGS[branch], channels=3, seed=seed)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5,
                               err_msg=f"branch={branch}")


@pytest.mark.parametrize("branch", ["color", "noise", "cutout"])
def test_branch_matches_reference_1ch(ref_augment_module, branch):
    """Mask-discriminator input path (1 channel): hue/saturation are skipped
    by both pipes; brightness/contrast/lumaflip reduce to a scalar affine
    (reference augment.py:359-365)."""
    ours, ref = _run_pair(ref_augment_module, BRANCH_CONFIGS[branch], channels=1, seed=3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5,
                               err_msg=f"branch={branch}")
