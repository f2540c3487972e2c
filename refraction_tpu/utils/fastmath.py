"""Transcendentals missing from the Mosaic TPU lowering, built from
primitives it does support (mul/add/sqrt/select).

Mosaic has no atan2/acos (``Unimplemented primitive ... atan2``), but the
miss shader needs both (RayTracing.hlsl:133-134). ``atan_poly`` is a
degree-8-in-s polynomial (s = a^2) fitted by iteratively reweighted least
squares on [0, 1] (see git history for the fitting script); absolute error
is 1.2e-7 — float32 rounding noise — so envmap texel indices match the
numpy oracle except for directions within ~1e-4 texel of a truncation
boundary.

All functions are jnp-generic and work inside Pallas kernels as well as
plain XLA. NOTE: the XLA env backend (ops/shade.envmap_color, shared with
the numpy oracle) uses true jnp.arctan2/arccos, so the Pallas and XLA env
paths may select a different texel for a direction within ~1e-7 of a
truncation boundary — a <=1-texel tolerance, not bit-for-bit parity.
"""

from __future__ import annotations

import jax.numpy as jnp

# atan(a) ~= a * P(a^2) on a in [0, 1]; coefficients low-order first.
_ATAN_COEFS = (
    9.999998704e-01,
    -3.333257073e-01,
    1.998555192e-01,
    -1.415835920e-01,
    1.048691631e-01,
    -7.207769714e-02,
    3.944877300e-02,
    -1.419170467e-02,
    2.403545891e-03,
)

_PI = 3.14159265358979
_PI_2 = _PI / 2.0


def atan_01(a):
    """arctan for a in [0, 1]."""
    s = a * a
    p = jnp.float32(_ATAN_COEFS[-1])
    for c in _ATAN_COEFS[-2::-1]:
        p = p * s + jnp.float32(c)
    return a * p


def atan2(y, x):
    """Full four-quadrant arctan(y/x); matches np.arctan2 conventions
    (including y = 0 signs at x < 0; x = y = 0 returns 0)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.maximum(hi, jnp.float32(1e-38))
    r = atan_01(a)
    # if |y| > |x|: angle = pi/2 - r
    r = jnp.where(ay > ax, jnp.float32(_PI_2) - r, r)
    # if x < 0: angle = pi - angle
    r = jnp.where(x < 0, jnp.float32(_PI) - r, r)
    # sign follows y (negative zero folds to >= 0, matching arctan2 for
    # the ray directions we feed it)
    return jnp.where(y < 0, -r, r)


# acos(x) ~= sqrt(1-x) * Q(x) on [0, 1]; low-order first. Same IRLS fit
# method as _ATAN_COEFS (degree 7; max angle error 1.3e-8 in float64,
# 3.9e-7 evaluated in float32 — *more* accurate than the previous
# atan2(sqrt(1-x^2), x) formulation, whose f32 max error was 8.5e-7,
# and ~11 fewer vector ops per call: the env miss shader evaluates this
# once per live slot-round per lane).
_ACOS_COEFS = (
    1.5707963142e+00,
    -2.1459988742e-01,
    8.8999197686e-02,
    -5.0312401739e-02,
    3.1334377851e-02,
    -1.7807343981e-02,
    7.2442115574e-03,
    -1.4411112803e-03,
)


def acos(x):
    """arccos on [-1, 1]: sqrt(1-|x|) * Q(|x|), reflected for x < 0."""
    ax = jnp.abs(x)
    p = jnp.float32(_ACOS_COEFS[-1])
    for c in _ACOS_COEFS[-2::-1]:
        p = p * ax + jnp.float32(c)
    r = jnp.sqrt(jnp.maximum(jnp.float32(0.0), jnp.float32(1.0) - ax)) * p
    return jnp.where(x < 0, jnp.float32(_PI) - r, r)
