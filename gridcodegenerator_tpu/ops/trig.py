"""Accurate f32 sin/cos for the joint-transform update.

Why this exists: the X(q) update is the root of the whole dynamics pipeline
(the reference's ``load_update_XImats_helpers``,
``/root/reference/helpers/_topology_helpers.py:90-182``, computes
``sin(q)``/``cos(q)`` once per joint and patches X from them). On TPU the
stock f32 ``sin``/``cos`` lowerings are polynomial approximations whose error
(a few ulp) is *amplified* by the articulated-body M⁻¹ recursion — the
dominant term of the ∇FD f32 parity budget (see PARITY.md, "the f32 floor").
This module provides a Cody-Waite range reduction + Cephes-grade minimax
evaluation whose f32 arithmetic error is ≤ ~2 ulp on the robot-joint domain,
matching correctly-rounded libm closely enough that CPU and TPU agree.

Everything here is plain elementwise jnp (mul/add/round/where), so it lowers
identically under XLA and inside Pallas kernel bodies (Mosaic-safe: no
gathers, no reshapes, no integer indexing, no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

# 3-term Cody-Waite split of π/2 in float32 (each term exactly
# representable; classic Cephes DP1..DP3 doubled from the π/4 split).
# Residual of the split vs π/2 is ~5e-10 — negligible for |k| ≲ 10⁴,
# i.e. |q| ≲ 1.5·10⁴ rad, far beyond any joint-coordinate range.
_D1 = 1.5703125
_D2 = 4.837512969970703125e-4
_D3 = 7.54978995489188216e-8

# Cephes sinf/cosf minimax coefficients on |r| ≤ π/4.
_S1, _S2, _S3 = -1.6666654611e-1, 8.3321608736e-3, -1.9515295891e-4
_C1, _C2, _C3 = 4.166664568298827e-2, -1.388731625493765e-3, 2.443315711809948e-5


def sincos(q):
    """(sin q, cos q) with ≤ ~2 ulp f32 error, backend-independent.

    Quadrant reduction: k = round(q·2/π), r = q − k·π/2 (3-term Cody-Waite,
    so r is accurate to f32 rounding for any realistic joint coordinate),
    then sin/cos on |r| ≤ π/4 via degree-7/8 minimax polynomials and the
    quadrant recombination  sin(q) = ±{sin r | cos r},  cos(q) likewise.
    """
    dtype = q.dtype
    if dtype == jnp.float64:
        # the minimax polynomials are f32-grade; in f64 the backend sincos
        # is already far more accurate than they are
        return jnp.sin(q), jnp.cos(q)
    k = jnp.round(q * jnp.asarray(0.6366197723675814, dtype))  # 2/π
    r = q - k * jnp.asarray(_D1, dtype)
    r = r - k * jnp.asarray(_D2, dtype)
    r = r - k * jnp.asarray(_D3, dtype)

    z = r * r
    sin_r = r + r * z * (jnp.asarray(_S1, dtype)
                         + z * (jnp.asarray(_S2, dtype)
                                + z * jnp.asarray(_S3, dtype)))
    cos_r = (1.0 - 0.5 * z
             + z * z * (jnp.asarray(_C1, dtype)
                        + z * (jnp.asarray(_C2, dtype)
                               + z * jnp.asarray(_C3, dtype))))

    # quadrant j = k mod 4 as an exact small float (k is an integer-valued
    # float; float arithmetic below is exact for |k| < 2^23)
    j = k - 4.0 * jnp.floor(k * 0.25)
    swap = jnp.logical_or(j == 1.0, j == 3.0)       # quadrants where sin↔cos
    sin_base = jnp.where(swap, cos_r, sin_r)
    cos_base = jnp.where(swap, sin_r, cos_r)
    sin_neg = jnp.logical_or(j == 2.0, j == 3.0)
    cos_neg = jnp.logical_or(j == 1.0, j == 2.0)
    s = jnp.where(sin_neg, -sin_base, sin_base)
    c = jnp.where(cos_neg, -cos_base, cos_base)
    return s, c
