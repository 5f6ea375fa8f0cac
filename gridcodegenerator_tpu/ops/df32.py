"""Double-float (f32x2, "two-float compensated") extended precision.

Why this exists (VERDICT r4 #2, PARITY.md "the f32 floor"): the measured
dominant term of the f32 ∇FD parity tail is the M⁻¹ stage's *sensitivity to
its f32-rounded X(q) input* — not rounding inside the recursion (all M⁻¹
sub-steps combined contribute 6.8e-8; the stage as a whole 6.7e-7+, and the
hardware tail reaches 3.7e-6). No same-precision trick can fix an input that
has already lost the bits (a same-precision Newton step measured *worse*,
4.0e-6). The fix is to carry the sensitive quantities — sin/cos(q), the X(q)
entries, and the mass matrix built from them — in ~49-bit double-float
arithmetic, then refine the f32 M⁻¹ with ONE Newton step whose residual is
computed in f32x2:

    M⁻¹ ← M⁻¹ + M⁻¹ · (I − M_df · M⁻¹)

The residual (≈1e-6) is then accurate to ~1e-13, so the refined M⁻¹ matches
the float64 golden model's to ~κ(M)·1e-12 — far below the ≤1e-6 north star.
Everything downstream (RNEA sweeps, ∂ID) stays plain f32: the stage analysis
bounds those contributions at ≤2e-7 each.

TPU notes: f64 does not exist on TPU hardware; double-float emulation over
the VPU's IEEE f32 mul/add is the native way to buy precision. All building
blocks are error-free transforms (Knuth two_sum, Dekker split/two_prod) —
plain elementwise mul/add/where, Mosaic-safe, and safe under XLA (which
performs no unsafe floating-point reassociation; FMA contraction of
``a*b − p`` only *sharpens* two_prod). Layout is batch-last like
:mod:`.blops` (trailing batch axes, df values as (hi, lo) array pairs).

Reference anchor: the precision contract being recovered is the reference's
suggested-float semantics validated against its f64 NumPy golden model
(``/root/reference/GRiDCodeGenerator.py:277``, ``_test.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..models.robot import (RobotModel, joint_motion_subspaces,
                            joint_xform_coefficients)

# --------------------------------------------------------------------------
# error-free transforms (IEEE f32 round-to-nearest)
# --------------------------------------------------------------------------


def two_sum(a, b):
    """Knuth: a + b = s + e exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Dekker: a + b = s + e exactly, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _df_split(a):
    """Dekker split: a = hi + lo with hi carrying the top 12 mantissa bits
    (f32 splitter 2^12 + 1; products of two hi/lo halves are then exact)."""
    c = a * 4097.0
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """a · b = p + e exactly (Dekker; an FMA-contracted ``a*b − p`` is the
    exact same error term, so XLA contraction is harmless-to-helpful)."""
    p = a * b
    ah, al = _df_split(a)
    bh, bl = _df_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# --------------------------------------------------------------------------
# double-float arithmetic on (hi, lo) pairs
# --------------------------------------------------------------------------


def df(hi, lo=None):
    hi = jnp.asarray(hi, jnp.float32)
    return (hi, jnp.zeros_like(hi) if lo is None else jnp.asarray(lo, jnp.float32))


def df_add(x, y):
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return fast_two_sum(s, e)


def df_sub(x, y):
    return df_add(x, (-y[0], -y[1]))


def df_mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def df_neg(x):
    return (-x[0], -x[1])


def df_where(c, x, y):
    return (jnp.where(c, x[0], y[0]), jnp.where(c, x[1], y[1]))


def df_from_f64(a) -> tuple:
    """Split a float64 numpy array into an (hi, lo) f32 pair (lossless to
    2⁻⁴⁹ relative)."""
    a = np.asarray(a, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


# --------------------------------------------------------------------------
# double-float sincos (Cody-Waite reduction + Cephes-double polynomial)
# --------------------------------------------------------------------------

# 3-term Cody-Waite split of π/2 (ops/trig.py) + the f64 residual as a 4th
# term so the reduction is df-grade (the 3-term split alone leaves ~5e-10·k).
_D1 = 1.5703125
_D2 = 4.837512969970703125e-4
_D3 = 7.54978995489188216e-8
_D4 = float(np.pi / 2 - np.float64(_D1) - np.float64(_D2) - np.float64(_D3))

# Cephes double-precision minimax coefficients on |r| ≤ π/4
_SIN_C = [1.58962301576546568060e-10, -2.50507477628578072866e-8,
          2.75573136213857245213e-6, -1.98412698295895385996e-4,
          8.33333333332211858878e-3, -1.66666666666666307295e-1]
_COS_C = [-1.13585365213876817300e-11, 2.08757008419747316778e-9,
          -2.75573141792967388112e-7, 2.48015872888517179954e-5,
          -1.38888888888730564116e-3, 4.16666666666665929218e-2]
_SIN_DF = [df_from_f64(c) for c in _SIN_C]
_COS_DF = [df_from_f64(c) for c in _COS_C]


def df_sincos(q):
    """(sin q, cos q) as df pairs from an f32 ``q`` — ~2⁻⁴⁵-grade accuracy
    for |q| ≲ 10³ rad (far beyond joint coordinates)."""
    q = jnp.asarray(q, jnp.float32)
    k = jnp.round(q * np.float32(0.6366197723675814))     # 2/π
    # reduction: r = q − k·π/2, every partial product error-free-tracked
    r = df_add(df(q), df(*two_prod(k, np.float32(-_D1))))
    r = df_add(r, df(*two_prod(k, np.float32(-_D2))))
    r = df_add(r, df(*two_prod(k, np.float32(-_D3))))
    r = df_add(r, df(k * np.float32(-_D4)))
    z = df_mul(r, r)

    def horner(coeffs):
        p = df(jnp.full_like(q, coeffs[0][0]), jnp.full_like(q, coeffs[0][1]))
        for c in coeffs[1:]:
            p = df_add(df_mul(p, z), df(jnp.full_like(q, c[0]),
                                        jnp.full_like(q, c[1])))
        return p

    # sin r = r + r·z·P(z);   cos r = 1 − z/2 + z²·Q(z)
    sin_r = df_add(r, df_mul(df_mul(r, z), horner(_SIN_DF)))
    cos_r = df_add(df_add(df(jnp.ones_like(q)),
                          (-0.5 * z[0], -0.5 * z[1])),
                   df_mul(df_mul(z, z), horner(_COS_DF)))

    j = k - 4.0 * jnp.floor(k * 0.25)
    swap = jnp.logical_or(j == 1.0, j == 3.0)
    sin_b = df_where(swap, cos_r, sin_r)
    cos_b = df_where(swap, sin_r, cos_r)
    s = df_where(jnp.logical_or(j == 2.0, j == 3.0), df_neg(sin_b), sin_b)
    c = df_where(jnp.logical_or(j == 1.0, j == 2.0), df_neg(cos_b), cos_b)
    return s, c


# --------------------------------------------------------------------------
# df robot constants + df CRBA mass matrix (batch-last)
# --------------------------------------------------------------------------


class DFConstants(NamedTuple):
    """f32x2 (hi, lo) copies of the X(q)-affine coefficients and inertias,
    split from the float64 description — the f32 ``RobotModel`` constants
    alone have already lost the bits the M⁻¹ stage is sensitive to. Build
    once per robot with :func:`x2_constants`."""
    Xb: tuple     # ((n,6,6) hi, lo)
    Xs: tuple
    Xc: tuple
    S: tuple      # ((n,6) hi, lo)
    inertia: tuple
    armature: tuple


def x2_constants(desc) -> DFConstants:
    """df constants from a :class:`RobotDescription` (float64 source)."""
    Xb, Xs, Xc = joint_xform_coefficients(desc)
    S = joint_motion_subspaces(desc)
    arm = (np.zeros(desc.n) if desc.armature is None
           else np.asarray(desc.armature, np.float64))
    return DFConstants(
        Xb=df_from_f64(Xb), Xs=df_from_f64(Xs), Xc=df_from_f64(Xc),
        S=df_from_f64(S), inertia=df_from_f64(np.asarray(desc.inertia,
                                                         np.float64)),
        armature=df_from_f64(arm))


def _bcast(pair, i, bshape):
    """Constant (hi, lo) row i broadcast over trailing batch axes."""
    hi = jnp.asarray(pair[0][i], jnp.float32)
    lo = jnp.asarray(pair[1][i], jnp.float32)
    ext = hi.reshape(hi.shape + (1,) * len(bshape))
    extl = lo.reshape(lo.shape + (1,) * len(bshape))
    return (jnp.broadcast_to(ext, hi.shape + bshape),
            jnp.broadcast_to(extl, lo.shape + bshape))


def _df_matvec6(X, v):
    """df (6,6,B)·(6,B) → (6,B)."""
    out = df_mul((X[0][:, 0], X[1][:, 0]), (v[0][0:1], v[1][0:1]))
    for c in range(1, 6):
        out = df_add(out, df_mul((X[0][:, c], X[1][:, c]),
                                 (v[0][c:c + 1], v[1][c:c + 1])))
    return out


def _df_matvec6_T(X, v):
    out = df_mul((X[0][0], X[1][0]), (v[0][0:1], v[1][0:1]))
    for c in range(1, 6):
        out = df_add(out, df_mul((X[0][c], X[1][c]),
                                 (v[0][c:c + 1], v[1][c:c + 1])))
    return out


def _df_matmat6(X, D):
    """df (6,6,B)·(6,6,B) → (6,6,B)."""
    out = df_mul((X[0][:, 0:1], X[1][:, 0:1]), (D[0][0:1], D[1][0:1]))
    for c in range(1, 6):
        out = df_add(out, df_mul((X[0][:, c:c + 1], X[1][:, c:c + 1]),
                                 (D[0][c:c + 1], D[1][c:c + 1])))
    return out


def _df_matmat6_T(X, D):
    """df Xᵀ·D: (6,6,B)ᵀ·(6,6,B) → (6,6,B)."""
    out = df_mul((X[0][0][:, None], X[1][0][:, None]),
                 (D[0][0:1], D[1][0:1]))
    for c in range(1, 6):
        out = df_add(out, df_mul((X[0][c][:, None], X[1][c][:, None]),
                                 (D[0][c:c + 1], D[1][c:c + 1])))
    return out


def _df_dot6(a, b):
    out = df_mul((a[0][0:1], a[1][0:1]), (b[0][0:1], b[1][0:1]))
    for c in range(1, 6):
        out = df_add(out, df_mul((a[0][c:c + 1], a[1][c:c + 1]),
                                 (b[0][c:c + 1], b[1][c:c + 1])))
    return out


def df_joint_transforms_bl(model: RobotModel, consts: DFConstants, q):
    """df X_i(q) per joint, batch-last: list of ((6,6,B) hi, lo) pairs.

    Honors the same model contract as :func:`..ops.blops
    .joint_transforms_bl`: with static ``joint_types`` metadata the
    prismatic branch is resolved at trace time; on a metadata-less model
    (traced-model path) it falls back to a runtime select on the
    ``prismatic`` mask (r5 review)."""
    n = model.n
    bshape = q.shape[1:]
    s, c = df_sincos(q)
    static_types = bool(model.joint_types)
    out = []
    for i in range(n):
        if static_types:
            prism = model.joint_types[i] == "prismatic"
            f1 = ((q[i], jnp.zeros_like(q[i])) if prism
                  else (s[0][i], s[1][i]))
            f2 = None if prism else (c[0][i], c[1][i])
        else:
            pm = model.prismatic[i]
            f1 = df_where(pm, df(q[i]), (s[0][i], s[1][i]))
            f2 = df_where(pm, df(jnp.zeros_like(q[i])),
                          (c[0][i], c[1][i]))
        Xb = _bcast(consts.Xb, i, bshape)
        Xs = _bcast(consts.Xs, i, bshape)
        Xi = df_add(Xb, df_mul((f1[0][None, None], f1[1][None, None]), Xs))
        if f2 is not None:
            Xc = _bcast(consts.Xc, i, bshape)
            Xi = df_add(Xi, df_mul((f2[0][None, None], f2[1][None, None]),
                                   Xc))
        out.append(Xi)
    return out


def df_crba_bl(model: RobotModel, consts: DFConstants, q):
    """Composite-rigid-body mass matrix in df, batch-last: q (n, B) →
    ((n,n,B) hi, lo). Same recursion as :func:`..ops.blops.crba_bl`, carried
    in f32x2 from df X(q) — the extended-precision ground truth the Newton
    residual needs."""
    topo = model.topology
    n = topo.n
    parents = topo.parents
    bshape = q.shape[1:]
    X = df_joint_transforms_bl(model, consts, q)
    Ic = [_bcast(consts.inertia, i, bshape) for i in range(n)]
    Sb = [_bcast(consts.S, i, bshape) for i in range(n)]
    for i in range(n - 1, -1, -1):
        p = parents[i]
        if p >= 0:
            Ic[p] = df_add(Ic[p], _df_matmat6_T(X[i], _df_matmat6(Ic[i],
                                                                  X[i])))
    Mh = jnp.zeros((n, n) + bshape, jnp.float32)
    Ml = jnp.zeros_like(Mh)
    for i in range(n):
        F = _df_matvec6(Ic[i], Sb[i])
        d = df_add(_df_dot6(Sb[i], F), _bcast(consts.armature, i, bshape))
        Mh = Mh.at[i, i].set(d[0][0])
        Ml = Ml.at[i, i].set(d[1][0])
        j = i
        while parents[j] >= 0:
            F = _df_matvec6_T(X[j], F)
            j = parents[j]
            mij = _df_dot6(Sb[j], F)
            Mh = Mh.at[i, j].set(mij[0][0])
            Ml = Ml.at[i, j].set(mij[1][0])
            Mh = Mh.at[j, i].set(mij[0][0])
            Ml = Ml.at[j, i].set(mij[1][0])
    return Mh, Ml


def refine_minv_bl(model: RobotModel, consts: DFConstants, q, Minv):
    """One Newton step on a batch-last f32 M⁻¹ with an f32x2 residual:

        M⁻¹ ← sym( M⁻¹ + M⁻¹ · hi(I_df − M_df · M⁻¹) )

    ``Minv``: (n, n, B) from any f32 route; returns the refined (n, n, B).
    The correction multiply runs in plain f32 — the residual is ~1e-6, so
    f32 rounding on it perturbs the result at ~1e-13."""
    n = model.n
    Mh, Ml = df_crba_bl(model, consts, q)

    # R = I − M_df · Minv, accumulated in df, hi part taken at the end
    eye = jnp.eye(n, dtype=jnp.float32).reshape(
        (n, n) + (1,) * (Minv.ndim - 2))
    R = (jnp.broadcast_to(eye, Minv.shape), jnp.zeros_like(Minv))
    for c in range(n):
        prod = df_mul((Mh[:, c:c + 1], Ml[:, c:c + 1]),
                      (Minv[c:c + 1], jnp.zeros_like(Minv[c:c + 1])))
        R = df_sub(R, prod)
    r_hi = R[0] + R[1]

    # correction: Minv @ r_hi (f32)
    corr = sum(Minv[:, c:c + 1] * r_hi[c:c + 1] for c in range(n))
    out = Minv + corr
    return 0.5 * (out + out.swapaxes(0, 1))


def fd_grad_x2_bl(model: RobotModel, consts: DFConstants, q, qd, u,
                  gravity=-9.81):
    """Batch-last ∇FD with the extended-precision M⁻¹ (the opt-in parity
    route): identical pipeline to :func:`..ops.blops.fd_grad_bl`, with the
    dense-M⁻¹ stage Newton-refined against the f32x2 CRBA mass matrix.
    q/qd/u (n, B) → (ddq, ddqd), each (n, n, B)."""
    from . import blops

    def minv_fn(m, X):
        rows, _, _ = blops.minv_bl(m, X)
        return refine_minv_bl(m, consts, q, blops.densify_rows(rows))

    return blops.fd_grad_bl(model, q, qd, u, gravity, minv_fn=minv_fn)
