"""DCGAN discriminator stack with optional ADA augmentation front-end.

Rebuilds src/models/discriminator.py (DCDiscriminator / ADADiscriminator /
ADADiscriminatorView) functionally on NHWC tensors. Convolutions use torch's
default kaiming-uniform init (U(+-1/sqrt(fan_in))) so training dynamics match.
"""
from __future__ import annotations

from math import log2
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import build_from_config, register_target
from .augment import AugmentPipe

Params = Dict[str, Any]

LRELU_SLOPE = 0.2


def _conv_init(key, kh, kw, cin, cout, bias=False):
    fan_in = cin * kh * kw
    bound = 1.0 / np.sqrt(fan_in)
    kw_, kb_ = jax.random.split(key)
    p = {"w": jax.random.uniform(kw_, (kh, kw, cin, cout), minval=-bound, maxval=bound, dtype=jnp.float32)}
    if bias:
        p["b"] = jax.random.uniform(kb_, (cout,), minval=-bound, maxval=bound, dtype=jnp.float32)
    return p


# (A bf16-storage conv option was evaluated in r3 and dropped: the conv
# stack is a small share of the step, fp32 operands already run single-pass
# bf16 on the MXU by default, and bf16 storage breaks the R1 grad-of-grad
# transpose (f32 cotangent from preferred_element_type vs bf16 weights).
# docs/DESIGN.md r3 findings.)


def _conv(x, p, stride, padding):
    out = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"]
    return out


@register_target(
    "src.models.discriminator.ADADiscriminator",
    "object_intrinsics_tpu.models.discriminator.ADADiscriminator",
)
class ADADiscriminator:
    """Static config holder; params live in a pytree (src/models/discriminator.py:49-100).

    Stack: log2(img_size)-2 stride-2 4x4 convs (no bias) with LeakyReLU(0.2),
    then a 4x4 valid conv to out_dim. An AugmentPipe runs on the input with a
    fixed probability multiplier ``aug_p``.
    """

    def __init__(
        self,
        img_size: int,
        in_dim: int = 3,
        out_dim: int = 1,
        n_feat: int = 512,
        last_bias: bool = False,
        aug: Optional[dict] = None,
        aug_p: float = 1.0,
    ):
        self.img_size = int(img_size)
        self.in_dim = int(in_dim)
        self.out_dim = int(out_dim)
        self.n_feat = int(n_feat)
        self.last_bias = bool(last_bias)
        self.n_layers = int(log2(self.img_size) - 2)
        if aug is not None:
            aug = dict(aug)
            aug.setdefault("kwargs", {})
            self.aug: Optional[AugmentPipe] = AugmentPipe(**aug["kwargs"], p=aug_p)
        else:
            self.aug = None

        chans = [self.in_dim] + [
            int(self.n_feat / (2 ** (self.n_layers - 1 - i))) for i in range(self.n_layers)
        ]
        self._channels = chans

    def get_resolution(self) -> int:
        return self.img_size

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, self.n_layers + 1)
        blocks = [
            _conv_init(keys[i], 4, 4, self._channels[i], self._channels[i + 1], bias=False)
            for i in range(self.n_layers)
        ]
        conv_out = _conv_init(keys[-1], 4, 4, self.n_feat, self.out_dim, bias=self.last_bias)
        return {"blocks": blocks, "conv_out": conv_out}

    def apply(self, params: Params, x: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        """x: (bs, H, W, in_dim) -> logits (bs, out_dim). ``key`` drives the
        ADA augmentation; pass None to skip augmentation (e.g. for viz)."""
        if self.aug is not None and key is not None:
            x = self.aug(key, x)
        for p in params["blocks"]:
            x = jax.nn.leaky_relu(_conv(x, p, stride=2, padding=1), LRELU_SLOPE)
        out = _conv(x, params["conv_out"], stride=1, padding=0)
        return out.reshape(x.shape[0], self.out_dim)

    def augment_only(self, params: Params, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        del params
        return self.aug(key, x) if self.aug is not None else x


@register_target(
    "src.models.discriminator.DCDiscriminator",
    "object_intrinsics_tpu.models.discriminator.DCDiscriminator",
)
class DCDiscriminator(ADADiscriminator):
    """Plain DCGAN stack without the ADA front-end
    (src/models/discriminator.py:49-86). Unused by the shipped configs but a
    valid ``__target__`` in the reference schema."""

    def __init__(self, in_dim: int = 3, out_dim: int = 1, n_feat: int = 512,
                 img_size: int = 64, last_bias: bool = False):
        super().__init__(img_size=img_size, in_dim=in_dim, out_dim=out_dim,
                         n_feat=n_feat, last_bias=last_bias, aug=None)


@register_target(
    "src.models.discriminator.ResnetBlock",
    "object_intrinsics_tpu.models.discriminator.ResnetBlock",
)
class ResnetBlock:
    """Pre-activation residual block ``x_s + 0.1 * conv(lrelu(conv(lrelu(x))))``
    with an optional learned 1x1 shortcut (src/models/discriminator.py:8-46).
    Dead in the shipped configs; carried for registry parity."""

    def __init__(self, fin: int, fout: int, fhidden: Optional[int] = None,
                 is_bias: bool = True):
        self.fin = int(fin)
        self.fout = int(fout)
        self.fhidden = int(fhidden) if fhidden is not None else min(self.fin, self.fout)
        self.is_bias = bool(is_bias)
        self.learned_shortcut = self.fin != self.fout

    def init(self, key: jax.Array) -> Params:
        k0, k1, ks = jax.random.split(key, 3)
        p = {
            "conv_0": _conv_init(k0, 3, 3, self.fin, self.fhidden, bias=True),
            "conv_1": _conv_init(k1, 3, 3, self.fhidden, self.fout, bias=self.is_bias),
        }
        if self.learned_shortcut:
            p["conv_s"] = _conv_init(ks, 1, 1, self.fin, self.fout, bias=False)
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x_s = _conv(x, params["conv_s"], stride=1, padding=0) if self.learned_shortcut else x
        dx = _conv(jax.nn.leaky_relu(x, LRELU_SLOPE), params["conv_0"], stride=1, padding=1)
        dx = _conv(jax.nn.leaky_relu(dx, LRELU_SLOPE), params["conv_1"], stride=1, padding=1)
        return x_s + 0.1 * dx


@register_target(
    "src.models.discriminator.ADADiscriminatorView",
    "object_intrinsics_tpu.models.discriminator.ADADiscriminatorView",
)
class ADADiscriminatorView(ADADiscriminator):
    """Image discriminator with an auxiliary pose-regression head: out_dim =
    1 logit + out_dim_position (src/models/discriminator.py:103-109)."""

    def __init__(self, out_dim_position: int = 6, out_dim_latent: int = 0, **kwargs):
        self.out_dim_position = int(out_dim_position)
        self.out_dim_latent = int(out_dim_latent)
        super().__init__(**kwargs)
