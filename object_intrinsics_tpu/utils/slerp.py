"""Latent interpolation: lerp / slerp / gaussian-CDF variants
(rebuilds src/utils/slerp.py, itself derived from plat.interpolate)."""
from __future__ import annotations

import numpy as np
from scipy.stats import norm


def lerp(val, low, high):
    return low + (high - low) * val


def lerp_gaussian(val, low, high):
    return norm.ppf(lerp(val, norm.cdf(low), norm.cdf(high)))


def slerp(val, low, high):
    if val <= 0:
        return low
    if val >= 1:
        return high
    if np.allclose(low, high):
        return low
    omega = np.arccos(
        np.clip(np.dot(low / np.linalg.norm(low), high / np.linalg.norm(high)), -1, 1)
    )
    so = np.sin(omega)
    return np.sin((1.0 - val) * omega) / so * low + np.sin(val * omega) / so * high


def slerp_gaussian(val, low, high):
    offset = norm.cdf(np.zeros_like(low))
    lo = norm.cdf(low) - offset
    hi = norm.cdf(high) - offset
    out = slerp(val, lo, hi)
    return norm.ppf(np.clip(out + offset, 1e-3, 1 - 1e-3))


def get_interpfn(spherical: bool, gaussian: bool):
    if spherical and gaussian:
        return slerp_gaussian
    if spherical:
        return slerp
    if gaussian:
        return lerp_gaussian
    return lerp
