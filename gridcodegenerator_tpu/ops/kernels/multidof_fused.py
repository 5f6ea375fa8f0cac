"""Fused Pallas TPU kernels for the multi-dof (spherical/floating) family.

Closes the last vmap-only compute family (ROADMAP r2 item 3): mixed trees
with quaternion ball joints and in-tree 6-dof floating joints get the same
one-kernel-per-tile treatment as the single-dof stack — generalized RNEA,
CRBA mass matrix, and the dense (nv, nv) Cholesky FD solve run VMEM-resident
per 128-state lane tile, in the kernel-safe (1, B)-entry style of
:mod:`.contact_fused`.

Joint transforms are computed in-kernel per type: 1-dof joints through the
Rodrigues affine form (literal K-coefficients × in-kernel sin/cos — the
same X(q) = Xb + s·Xs + c·Xc algebra as :mod:`...models.robot`, folded at
trace time), quaternion joints through the batch-last quaternion→rotation
map. Motion subspaces S are static one-hot/identity patterns and fold into
the trace as float literals (zero columns skipped — nothing multiplies by
zero at run time).

Equivalence: bodies mirror :func:`..multidof.md_rnea` /
:func:`..multidof.md_crba` / :func:`..multidof.md_forward_dynamics` and are
tested against vmap of those per-state references (interpret mode + the
plain-XLA fallback body) in tests/test_multidof_fused.py.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import blops
from .contact_fused import (_act_view, _chol_apply_e, _chol_factor_act,
                            _chol_factor_ev, _chol_minv_sym,
                            _chol_solve_act, _mm33s, _quat_rot_s, _sum_terms)
from .fused import _LANES
from .staged import _CAL, _LANE_BUDGET

__all__ = ["md_id_fused", "md_fd_fused", "md_id_grad_fused",
           "md_fd_grad_fused", "md_workset_ok", "md_grad_workset_ok"]

_MD_FIELDS = ("XT", "inertia", "damping", "armature")


# --------------------------------------------------------------------------
# joint transforms, batch-last in-kernel
# --------------------------------------------------------------------------
def _md_transforms_s(km, q):
    """q (nq, B) → list of n (6,6,B) child←parent transforms. Mirrors
    :func:`..multidof.md_joint_transforms` per joint type."""
    n = km.topology.n
    X = []
    for i in range(n):
        s, w = km.q_slices[i]
        t = km.joint_types[i]
        XTi = km.XT[i]                                    # (6,6,B) ref value
        if t in ("spherical", "floating"):
            quat = q[s:s + 4]
            E = _transpose3(_quat_rot_s(quat))            # Rᵀ as [r][c] (1,B)
            rows = []
            for r in range(6):
                Er = E[r % 3]
                cols = []
                for c in range(6):
                    same = (r < 3) == (c < 3)
                    cols.append(Er[c % 3] if same else None)
                rows.append(cols)
            if t == "floating":
                # lower-left block −E p̂ with p = q[s+4 : s+7]
                px, py, pz = q[s + 4:s + 5], q[s + 5:s + 6], q[s + 6:s + 7]
                P = [[None, -pz, py], [pz, None, -px], [-py, px, None]]
                for r in range(3):
                    for c in range(3):
                        rows[3 + r][c] = _sum_terms([
                            -E[r][k] * P[k][c] for k in range(3)
                            if P[k][c] is not None])
            XJ_X = _apply66(rows, XTi)
        else:
            qi = q[s:s + 1]
            a = np.asarray(km.axis[i], np.float64)
            K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                          [-a[1], a[0], 0]])
            if t == "prismatic":
                # XJ = I + q·L6,  L6 = [[0,0],[−K,0]]
                rows = [[None] * 6 for _ in range(6)]
                one = jnp.ones_like(qi)
                for r in range(6):
                    rows[r][r] = one
                for r in range(3):
                    for c in range(3):
                        if K[r, c] != 0.0:
                            rows[3 + r][c] = -float(K[r, c]) * qi
            else:                                        # revolute
                sn, cs = jnp.sin(qi), jnp.cos(qi)
                KK = K @ K
                rows = [[None] * 6 for _ in range(6)]
                for r in range(3):
                    for c in range(3):
                        coeff = []
                        if r == c:
                            coeff.append(jnp.ones_like(qi))
                        if K[r, c] != 0.0:
                            coeff.append(-float(K[r, c]) * sn)
                        if KK[r, c] != 0.0:
                            coeff.append(float(KK[r, c]) * (1.0 - cs))
                        e = _sum_terms(coeff)
                        rows[r][c] = e
                        rows[3 + r][3 + c] = e
            XJ_X = _apply66(rows, XTi)
        X.append(XJ_X)
    return X


def _transpose3(R):
    """(3,3,B) → list of 3 rows, each list of helper access; returns a
    list-of-rows view [r][c] → (1,B) of Rᵀ."""
    return [[R[c, r:r + 1, :] for c in range(3)] for r in range(3)]


def _apply66(rows, XT):
    """(6,6) list-of-(1,B)/None · (6,6,B) → (6,6,B): X = XJ @ XT with the
    structural zeros of XJ skipped at trace time."""
    out_rows = []
    for r in range(6):
        cols = []
        for c in range(6):
            cols.append(_sum_terms([
                rows[r][k] * XT[k, c:c + 1, :] for k in range(6)
                if rows[r][k] is not None]))
        out_rows.append(jnp.concatenate([x if x is not None
                                         else jnp.zeros_like(XT[0, 0:1, :])
                                         for x in cols]))
    return jnp.stack(out_rows)


# --------------------------------------------------------------------------
# generalized RNEA / CRBA, (1,B)-entry style
# --------------------------------------------------------------------------
def _S_cols(km, i):
    """Joint i's motion-subspace columns as static float lists:
    [(6 floats)] × dof_i, zero-skippable."""
    S = np.asarray(km.S_np[i])
    w = km.v_slices[i][1]
    return [S[:, c] for c in range(w)]


def _Smatvec(cols, coeffs):
    """Σ_c S[:, c]·x_c with S literal float columns, x_c (1,B) slices →
    (6,B); zero rows skipped per-entry."""
    rows = []
    for r in range(6):
        terms = [float(col[r]) * xc for col, xc in zip(cols, coeffs)
                 if col[r] != 0.0]
        rows.append(_sum_terms(terms))
    zero = None
    for t in rows:
        if t is not None:
            zero = jnp.zeros_like(t)
            break
    return jnp.concatenate([t if t is not None else zero for t in rows])


def _md_rnea_s(km, X, qd, qdd, gravity):
    """Generalized RNEA: → (c (nv,B), v, a, f lists of (6,B)); f is the
    NON-accumulated body wrench list plus the accumulated c — callers that
    need accumulated f use the returned f_acc."""
    topo = km.topology
    n = topo.n
    minus_g = float(-gravity)
    v = [None] * n
    a = [None] * n
    f = [None] * n
    for i in range(n):
        p = topo.parents[i]
        sv, w = km.v_slices[i]
        cols = _S_cols(km, i)
        vJ = _Smatvec(cols, [qd[sv + c:sv + c + 1] for c in range(w)])
        v[i] = vJ if p < 0 else blops.matvec6(X[i], v[p]) + vJ
        if p < 0:
            ai = X[i][:, 5, :] * minus_g          # X · [0..0, −g]
        else:
            ai = blops.matvec6(X[i], a[p])
        ai = ai + blops.crm_apply_bl(v[i], vJ)
        if qdd is not None:
            ai = ai + _Smatvec(cols,
                               [qdd[sv + c:sv + c + 1] for c in range(w)])
        a[i] = ai
        Ii = km.inertia[i]
        Iv = blops.matvec6(Ii, v[i])
        f[i] = blops.matvec6(Ii, a[i]) + blops.crf_apply_bl(v[i], Iv)
    f_acc = list(f)
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            f_acc[p] = f_acc[p] + blops.matvec6_T(X[i], f_acc[i])
    c_rows = []
    for i in range(n):
        sv, w = km.v_slices[i]
        for c in range(w):
            col = _S_cols(km, i)[c]
            ci = _sum_terms([float(col[r]) * f_acc[i][r:r + 1]
                             for r in range(6) if col[r] != 0.0])
            ci = ci + km.damping[sv + c:sv + c + 1, 0:1] * \
                qd[sv + c:sv + c + 1]
            if qdd is not None:
                # reflected rotor torque (armature ships (nv,1) like damping)
                ci = ci + km.armature[sv + c:sv + c + 1, 0:1] * \
                    qdd[sv + c:sv + c + 1]
            c_rows.append(ci)
    return jnp.concatenate(c_rows), v, a, f_acc


def _md_crba_s(km, X):
    """Generalized CRBA → (nv, nv) list-of-lists of (1,B)/None entries."""
    topo = km.topology
    n = topo.n
    nv = km.nv
    IC = [km.inertia[i] for i in range(n)]
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            IC[p] = IC[p] + blops.matmat6_T(X[i],
                                            blops.matmat6(IC[i], X[i]))
    M = [[None] * nv for _ in range(nv)]
    for i in range(n):
        si, wi = km.v_slices[i]
        cols_i = _S_cols(km, i)
        # F = IC_i @ S_i: wi columns of (6,B)
        F = []
        for c in range(wi):
            col = cols_i[c]
            F.append(_sum_terms([
                float(col[k]) * IC[i][:, k, :] for k in range(6)
                if col[k] != 0.0]))
        for ci in range(wi):
            for cj in range(ci + 1):
                val = _sum_terms([
                    float(cols_i[cj][r]) * F[ci][r:r + 1] for r in range(6)
                    if cols_i[cj][r] != 0.0])
                if ci == cj:
                    # + reflected rotor inertia on the diagonal
                    val = val + km.armature[si + ci:si + ci + 1, 0:1]
                M[si + ci][si + cj] = val
                M[si + cj][si + ci] = val
        j = i
        while topo.parents[j] >= 0:
            F = [blops.matvec6_T(X[j], Fc) for Fc in F]
            j = topo.parents[j]
            sj, wj = km.v_slices[j]
            cols_j = _S_cols(km, j)
            for ci in range(wi):
                for cj in range(wj):
                    val = _sum_terms([
                        float(cols_j[cj][r]) * F[ci][r:r + 1]
                        for r in range(6) if cols_j[cj][r] != 0.0])
                    M[si + ci][sj + cj] = val
                    M[sj + cj][si + ci] = val
    return M


# --------------------------------------------------------------------------
# kernel bodies + public entries
# --------------------------------------------------------------------------
def _md_id_body(km, q, qd, qdd, *, gravity):
    X = _md_transforms_s(km, q)
    c, *_ = _md_rnea_s(km, X, qd, qdd, gravity)
    return (c,)


def _md_fd_body(km, q, qd, u, *, gravity):
    X = _md_transforms_s(km, q)
    c, *_ = _md_rnea_s(km, X, qd, None, gravity)
    M = _md_crba_s(km, X)
    # active-region column factor: nv²/6 wide ops instead of nv³/6 scalar
    # (1,B)-entry ops (contact_fused's register-utilization fix plus the
    # triangular-structure slicing)
    Lview = _chol_factor_ev(M, km.nv)
    rhs = [u[r:r + 1] - c[r:r + 1] for r in range(km.nv)]
    qdd = _chol_apply_e(Lview, rhs)
    return (jnp.concatenate(qdd),)


def _md_aba_body(km, q, qd, u, *, gravity):
    """Generalized articulated-body FD on a lane tile
    (``ops/multidof.py::md_aba`` in (1,B)-entry batch-last form): q̈ (nv,B)
    with per-joint k×k entry Cholesky blocks instead of the (nv, nv)
    CRBA factor — O(n) state, the md counterpart of
    ``contact_fused._fb_aba_body``."""
    topo = km.topology
    n = topo.n
    X = _md_transforms_s(km, q)
    minus_g = float(-gravity)

    v = [None] * n
    zeta = [None] * n
    for i in range(n):
        p = topo.parents[i]
        sv, w = km.v_slices[i]
        cols = _S_cols(km, i)
        vJ = _Smatvec(cols, [qd[sv + c:sv + c + 1] for c in range(w)])
        v[i] = vJ if p < 0 else blops.matvec6(X[i], v[p]) + vJ
        zeta[i] = blops.crm_apply_bl(v[i], vJ)
    IA = [km.inertia[i] for i in range(n)]
    pA = [blops.crf_apply_bl(v[i], blops.matvec6(km.inertia[i], v[i]))
          for i in range(n)]

    U = [None] * n        # list of w (6,B) columns per joint
    Lc = [None] * n       # k×k entry-view Cholesky per joint
    ub = [None] * n       # list of w (1,B) bias torques per joint
    for i in range(n - 1, -1, -1):
        sv, w = km.v_slices[i]
        cols = _S_cols(km, i)
        Ucols = [_sum_terms([float(col[k]) * IA[i][:, k, :]
                             for k in range(6) if col[k] != 0.0])
                 for col in cols]
        D = [[_sum_terms([float(cols[cj][r]) * Ucols[ci][r:r + 1]
                          for r in range(6) if cols[cj][r] != 0.0])
              for cj in range(w)] for ci in range(w)]
        for c in range(w):  # D = SᵀU + diag(armature slice)
            D[c][c] = D[c][c] + km.armature[sv + c:sv + c + 1, 0:1]
        L = _chol_factor_ev(D, w)
        ubar = []
        for c in range(w):
            SpA = _sum_terms([float(cols[c][r]) * pA[i][r:r + 1]
                              for r in range(6) if cols[c][r] != 0.0])
            ubar.append(u[sv + c:sv + c + 1]
                        - km.damping[sv + c:sv + c + 1, 0:1]
                        * qd[sv + c:sv + c + 1] - SpA)
        U[i], Lc[i], ub[i] = Ucols, L, ubar
        p = topo.parents[i]
        # W[r] = D⁻¹·Uᵀ[:, r] — list of w (1,B) entries per spatial row r
        W = [_chol_apply_e(L, [Ucols[c][r:r + 1] for c in range(w)])
             for r in range(6)]
        # (U D⁻¹ Uᵀ)[r, k] = Σ_c U[r, c]·W[k][c]
        UDU = jnp.stack([
            jnp.concatenate([
                _sum_terms([Ucols[c][r:r + 1] * W[k][c] for c in range(w)])
                for k in range(6)])
            for r in range(6)])
        Ia = IA[i] - UDU
        Dinv_u = _chol_apply_e(L, ubar)
        pa = (pA[i] + blops.matvec6(Ia, zeta[i])
              + sum(Ucols[c] * Dinv_u[c] for c in range(w)))
        IaX = sum(Ia[:, c][:, None] * X[i][c][None] for c in range(6))
        XIaX = sum(X[i][c][:, None] * IaX[c][None] for c in range(6))
        if p >= 0:
            IA[p] = IA[p] + XIaX
            pA[p] = pA[p] + blops.matvec6_T(X[i], pa)

    a = [None] * n
    qdd_rows = [None] * km.nv
    for i in range(n):
        p = topo.parents[i]
        if p < 0:
            a_prime = X[i][:, 5, :] * minus_g + zeta[i]
        else:
            a_prime = blops.matvec6(X[i], a[p]) + zeta[i]
        sv, w = km.v_slices[i]
        rhs = [ub[i][c] - _sum_terms(
            [U[i][c][r:r + 1] * a_prime[r:r + 1] for r in range(6)])
            for c in range(w)]
        qdd_i = _chol_apply_e(Lc[i], rhs)
        for c in range(w):
            qdd_rows[sv + c] = qdd_i[c]
        a[i] = a_prime + _Smatvec(_S_cols(km, i), qdd_i)
    return (jnp.concatenate(qdd_rows),)


def md_aba_workset_ok(n: int, nv: int) -> bool:
    """ABA carries no (nv, nv) factor: X+IA+v/ζ/pA+U ≈ 120n floats/state."""
    ws = 120.0 * n + 200.0
    return ws * _CAL <= _LANE_BUDGET


def md_aba_fused(model, q, qd, u, gravity=-9.81, interpret=False,
                 force_xla=False):
    """Fused generalized ABA FD — same signature/outputs as
    :func:`md_fd_fused`, O(n) per state (no CRBA, no nv³/3 factor).
    A/B'd on hardware (``benchmarks/bench_aba.py --multidof``)."""
    def body(km, q, qd, u):
        return _md_aba_body(km, q, qd, u, gravity=float(gravity))

    (qdd,) = _run_md(model, body, [q, qd, u], [model.nv], interpret,
                     force_xla, gate=md_aba_workset_ok)
    return qdd


def md_workset_ok(n: int, nv: int) -> bool:
    """Lane-tile VMEM gate: X+IC+v/a/f ≈ 108n floats/state, mass+chol ≈
    1.5·nv², calibrated by the fixed-base Mosaic stack factor."""
    ws = 108.0 * n + 1.5 * nv * nv + 200.0
    return ws * _CAL <= _LANE_BUDGET


def md_grad_workset_ok(n: int, nv: int) -> bool:
    """Gate for the gradient kernels: adds the per-joint DV/DA/DF column
    lists (≈ 18·n·nv) and the (nv, nv) ∂-output + solve temporaries."""
    ws = 108.0 * n + 18.0 * n * nv + 4.5 * nv * nv + 200.0
    return ws * _CAL <= _LANE_BUDGET


# --------------------------------------------------------------------------
# generalized ∂ID / ∇FD, (1,B)-entry column lists
# --------------------------------------------------------------------------
def _md_vaf_s(km, X, qd, qdd, gravity):
    """(v, a, f_acc) lists of (6,B) at the given accelerations (f is the
    ACCUMULATED wrench — the ∂ID backward correction needs it)."""
    _, v, a, f_acc = _md_rnea_s(km, X, qd, qdd, gravity)
    return v, a, f_acc


def _crm_cols(m, col):
    """crm(m) @ col for one (6,B) column."""
    return blops.crm_apply_bl(m, col)


def _md_id_grad_body(km, q, qd, qdd, *, gravity, cols=None, vaf=None,
                     minv=None, sides=("q", "qd")):
    """Generalized tangent-space ∂ID on a lane tile → per requested side a
    (nv, cb, B) block (cb = nv by default). Mirrors
    :func:`..multidof.md_id_grad` with per-joint derivative COLUMN LISTS
    (None = structurally zero: columns of joints outside ancestors∪self
    never materialize — the multi-dof form of the subtree sparsity in
    ``blops.rnea_grad_cols_bl``).

    ``cols=(c0, cb)`` restricts the propagation to differentiation
    directions [c0, c0+cb) — the column-blocked form used by the staged
    large-nv pipeline (:mod:`.multidof_staged`). ``vaf=(v, a, f_acc)``
    supplies precomputed kinematics lists (each n × (6,B)) instead of
    re-running the RNEA sweeps. ``minv`` (an (nv, nv, B) M⁻¹ value) fuses
    the −M⁻¹·∂c finish: the returned block is then −M⁻¹·∂c[:, blk],
    contracted over the structurally nonzero ∂c rows only."""
    topo = km.topology
    n = topo.n
    nv = km.nv
    c0, cbw = cols if cols is not None else (0, nv)
    minus_g = float(-gravity)
    X = _md_transforms_s(km, q)
    v, a, f = vaf if vaf is not None else _md_vaf_s(km, X, qd, qdd, gravity)

    def Scol_b(i, c, like):
        """Constant S column broadcast against a live (6,B) value (scalar
        float × input-derived rows — never a pure constant chain)."""
        col = np.asarray(km.S_np[i])[:, c]
        zero = jnp.zeros_like(like[0:1])
        return jnp.concatenate([
            zero + float(col[r]) if col[r] != 0.0 else zero
            for r in range(6)])

    outs = {}
    for side in sides:
        is_q = side == "q"
        DV = [None] * n   # per joint: list of nv columns of (6,B)/None
        DA = [None] * n
        DF = [None] * n
        for i in range(n):
            p = topo.parents[i]
            sv, w = km.v_slices[i]
            cols_i = _S_cols(km, i)
            vJ = _Smatvec(cols_i, [qd[sv + c:sv + c + 1] for c in range(w)])

            dv = ([None] * nv if (p < 0 or DV[p] is None) else
                  [None if cp is None else blops.matvec6(X[i], cp)
                   for cp in DV[p]])
            da = ([None] * nv if (p < 0 or DA[p] is None) else
                  [None if cp is None else blops.matvec6(X[i], cp)
                   for cp in DA[p]])
            # seeds in joint i's own columns
            if is_q:
                Xv = (blops.matvec6(X[i], v[p]) if p >= 0 else None)
                Xa = (blops.matvec6(X[i], a[p]) if p >= 0
                      else X[i][:, 5, :] * minus_g)
            for c in range(w):
                j = sv + c
                if not (c0 <= j < c0 + cbw):
                    continue      # direction outside the column block
                if is_q:
                    if Xv is not None:
                        dv[j] = _sum_terms(
                            [dv[j], _crm_cols(Xv, Scol_b(i, c, Xv))])
                    sa = _crm_cols(Xa, Scol_b(i, c, Xa))
                else:
                    dv[j] = _sum_terms([dv[j], Scol_b(i, c, v[i])])
                    sa = _crm_cols(v[i], Scol_b(i, c, v[i]))
                da[j] = _sum_terms([da[j], sa])
            # the −crm(S q̇) DV term applies to every live column
            for j in range(nv):
                if dv[j] is not None:
                    da[j] = _sum_terms([da[j], -_crm_cols(vJ, dv[j])])
            Ii = km.inertia[i]
            Iv = blops.matvec6(Ii, v[i])
            df = [None] * nv
            for j in range(nv):
                terms = []
                if da[j] is not None:
                    terms.append(blops.matvec6(Ii, da[j]))
                if dv[j] is not None:
                    terms.append(blops.crf_apply_bl(dv[j], Iv))
                    terms.append(blops.crf_apply_bl(
                        v[i], blops.matvec6(Ii, dv[j])))
                df[j] = _sum_terms(terms)
            DV[i], DA[i], DF[i] = dv, da, df

        for i in range(n - 1, -1, -1):
            p = topo.parents[i]
            if p < 0:
                continue
            contrib = list(DF[i])
            if is_q:
                sv, w = km.v_slices[i]
                for c in range(w):
                    j = sv + c
                    if not (c0 <= j < c0 + cbw):
                        continue
                    contrib[j] = _sum_terms(
                        [contrib[j],
                         blops.crf_apply_bl(Scol_b(i, c, f[i]), f[i])])
            for j in range(nv):
                if contrib[j] is not None:
                    up = blops.matvec6_T(X[i], contrib[j])
                    DF[p][j] = _sum_terms([DF[p][j], up])

        # rows: ∂τ_(i,c) over the block's cbw columns
        rows = []
        for i in range(n):
            sv, w = km.v_slices[i]
            cols_i = _S_cols(km, i)
            for c in range(w):
                col = cols_i[c]
                ent = []
                for j in range(c0, c0 + cbw):
                    dfj = DF[i][j]
                    if dfj is None:
                        ent.append(None)
                    else:
                        ent.append(_sum_terms([
                            float(col[r]) * dfj[r:r + 1] for r in range(6)
                            if col[r] != 0.0]))
                if not is_q:
                    jd = sv + c
                    if c0 <= jd < c0 + cbw:
                        damp = km.damping[jd:jd + 1, 0:1]
                        base = ent[jd - c0]
                        one = jnp.ones_like(qd[0:1])
                        ent[jd - c0] = _sum_terms([base, damp * one])
                rows.append(ent)
        zero = jnp.zeros_like(qd[0:1])
        if minv is None:
            D = jnp.stack([
                jnp.concatenate([e if e is not None else zero for e in row])
                for row in rows])
        else:
            # fused −M⁻¹·∂c finish: one (nv, B)-wide FMA per structurally
            # nonzero ∂c entry (minv[r] is M⁻¹[r, :] = M⁻¹[:, r] — symmetric)
            out_cols = []
            for jj in range(cbw):
                acc = None
                for r in range(nv):
                    e = rows[r][jj]
                    if e is None:
                        continue
                    t = minv[r] * e
                    acc = t if acc is None else acc + t
                out_cols.append(-acc if acc is not None
                                else jnp.zeros_like(minv[0]))
            D = jnp.stack(out_cols, axis=1)            # (nv, cbw, B)
        outs[side] = D
    return tuple(outs[s] for s in sides)


# --------------------------------------------------------------------------
# wide (column-tensor) tangent-space ∂ID — the K5md kernel body
# --------------------------------------------------------------------------
def _md_id_grad_cols_wide(km, q, qd, v, a, f, *, gravity, c0, cb,
                          minv=None, sides=("q", "qd"), X=None):
    """Column-blocked tangent-space ∂ID with the block's ``cb``
    differentiation directions processed as ONE (6, cb, B) tensor per
    joint — the multi-dof generalization of
    :func:`...blops.rnea_grad_cols_bl` (same dense-within-block layout,
    same trace-time subtree skipping of whole joints). Equals
    :func:`..multidof_fused._md_id_grad_body` with ``cols=(c0, cb)``
    exactly up to f32 reassociation; the per-column-list body issues one
    (6, B) op per live column, this one issues (6, cb, B) ops — ~cb×
    fewer instructions for Mosaic to schedule at the same flop count.

    v, a, f are per-joint lists of (6, B) (the staged K1md outputs);
    ``minv`` (nv, nv, B) fuses the −M⁻¹·∂c finish as in the narrow body.
    Returns per side an (nv, cb, B) block."""
    topo = km.topology
    n = topo.n
    nv = km.nv
    minus_g = float(-gravity)
    dtype = qd.dtype
    bshape = qd.shape[1:]
    if X is None:
        X = _md_transforms_s(km, q)

    # joint j owns directions [sv_j, sv_j + w_j); the block's live subtree =
    # joints below (or at) any direction-owning joint of the block
    owns = [max(km.v_slices[i][0], c0)
            < min(km.v_slices[i][0] + km.v_slices[i][1], c0 + cb)
            for i in range(n)]
    in_subtree = [False] * n
    for i in range(n):
        p = topo.parents[i]
        in_subtree[i] = owns[i] or (p >= 0 and in_subtree[p])

    def zeros_cols():
        return jnp.zeros((6, cb) + bshape, dtype)

    def S_wide(i, like):
        """Joint i's S columns overlapping the block, as (6, k, B) live
        values (scalar × input-derived — never a pure constant chain)."""
        sv, w = km.v_slices[i]
        js, je = max(sv, c0), min(sv + w, c0 + cb)
        S = np.asarray(km.S_np[i])[:, js - sv:je - sv]
        zero = jnp.zeros_like(like[0:1])[:, None]
        rows = []
        for r in range(6):
            rows.append(jnp.concatenate(
                [zero + float(S[r, k]) if S[r, k] != 0.0 else zero
                 for k in range(je - js)], axis=1))
        return jnp.concatenate(rows, axis=0)

    def insert(i, seed_w):
        """(6, k, B) seeds for joint i's block-overlapping directions →
        (6, cb, B) with the seeds at their local columns (static concat —
        the directions are contiguous, no masks needed)."""
        sv, w = km.v_slices[i]
        js, je = max(sv, c0), min(sv + w, c0 + cb)
        parts = []
        if js > c0:
            parts.append(jnp.zeros((6, js - c0) + bshape, dtype))
        parts.append(seed_w)
        if c0 + cb > je:
            parts.append(jnp.zeros((6, c0 + cb - je) + bshape, dtype))
        return jnp.concatenate(parts, axis=1)

    def vJ_of(i):
        sv, w = km.v_slices[i]
        cols = _S_cols(km, i)
        return _Smatvec(cols, [qd[sv + c:sv + c + 1]
                                  for c in range(w)])

    outs = {}
    for side in sides:
        is_q = side == "q"
        DV = [None] * n
        DA = [None] * n
        DF = [None] * n
        for i in range(n):
            p = topo.parents[i]
            if not in_subtree[i]:
                continue
            dv = (None if (p < 0 or DV[p] is None)
                  else blops.matmat6(X[i], DV[p]))
            da = (None if (p < 0 or DA[p] is None)
                  else blops.matmat6(X[i], DA[p]))
            if owns[i]:
                if is_q:
                    Xv = blops.matvec6(X[i], v[p]) if p >= 0 else None
                    Xa = (blops.matvec6(X[i], a[p]) if p >= 0
                          else X[i][:, 5, :] * minus_g)
                    Sw = S_wide(i, Xa)
                    if Xv is not None:
                        dv_seed = insert(i, blops.crm_cols_left(Xv, Sw))
                        dv = dv_seed if dv is None else dv + dv_seed
                    da_seed = insert(i, blops.crm_cols_left(Xa, Sw))
                else:
                    Sw = S_wide(i, v[i])
                    dv_seed = insert(i, Sw)
                    dv = dv_seed if dv is None else dv + dv_seed
                    da_seed = insert(i, blops.crm_cols_left(v[i], Sw))
                da = da_seed if da is None else da + da_seed
            if dv is not None:
                term = -blops.crm_cols_left(vJ_of(i), dv)
                da = term if da is None else da + term
            Ii = km.inertia[i]
            df = None
            if da is not None:
                df = blops.matmat6(Ii, da)
            if dv is not None:
                Iv = blops.matvec6(Ii, v[i])
                t = (blops.crf_cols_right(dv, Iv)
                     + blops.crf_cols_left(v[i], blops.matmat6(Ii, dv)))
                df = t if df is None else df + t
            DV[i], DA[i], DF[i] = dv, da, df

        for i in range(n - 1, -1, -1):
            p = topo.parents[i]
            if p < 0:
                continue
            acc = DF[i]
            if is_q and owns[i]:
                Sw = S_wide(i, f[i])
                corr = insert(i, blops.crf_cols_right(Sw, f[i]))
                acc = corr if acc is None else acc + corr
            if acc is not None:
                up = blops.matmat6_T(X[i], acc)
                DF[p] = up if DF[p] is None else DF[p] + up

        # rows: ∂τ_(i,c) = S_iᵀ · DF_i, (w_i, cb, B) per joint
        rows = [None] * nv
        for i in range(n):
            sv, w = km.v_slices[i]
            if DF[i] is None:
                continue
            S = np.asarray(km.S_np[i])
            for c in range(w):
                rows[sv + c] = sum(
                    float(S[r, c]) * DF[i][r] for r in range(6)
                    if S[r, c] != 0.0)
        if not is_q:
            # damping on the global diagonal, static one-hot insertion
            for jd in range(max(0, c0), min(nv, c0 + cb)):
                d1 = km.damping[jd:jd + 1, 0:1] * jnp.ones_like(qd[0:1])
                parts = []
                if jd > c0:
                    parts.append(jnp.zeros((1, jd - c0) + bshape, dtype))
                parts.append(d1[:, None])
                if c0 + cb > jd + 1:
                    parts.append(
                        jnp.zeros((1, c0 + cb - jd - 1) + bshape, dtype))
                dmask = jnp.concatenate(parts, axis=1)[0]
                rows[jd] = dmask if rows[jd] is None else rows[jd] + dmask
        zero_row = jnp.zeros((cb,) + bshape, dtype)
        if minv is None:
            D = jnp.stack([r if r is not None else zero_row for r in rows])
        else:
            # fused −M⁻¹·∂c finish over the structurally nonzero rows
            acc = None
            for r in range(nv):
                if rows[r] is None:
                    continue
                t = minv[r][:, None] * rows[r][None]
                acc = t if acc is None else acc + t
            D = -acc if acc is not None else jnp.zeros(
                (nv, cb) + bshape, dtype)
        outs[side] = D
    return tuple(outs[s] for s in sides)



def _md_fd_grad_body(km, q, qd, u, *, gravity):
    """Generalized tangent-space ∇FD: Carpentier-Mansard over the fused
    pieces — FD solve, ∂ID at the solution, −M⁻¹·∂c and M⁻¹ itself —
    all in one kernel. Returns (Dq, Dqd, Du), each (nv,nv,B)."""
    nv = km.nv
    X = _md_transforms_s(km, q)
    c, *_ = _md_rnea_s(km, X, qd, None, gravity)
    M = _md_crba_s(km, X)
    # active-region column factor + column-oriented wide multi-rhs solves
    # (contact_fused's register-utilization machinery sliced to the
    # triangular live region): nv³/6-scale wide flops instead of nv³-scale
    cols = _chol_factor_act(M, nv)
    qdd_l = _chol_apply_e(_act_view(cols, nv),
                          [u[r:r + 1] - c[r:r + 1] for r in range(nv)])
    qdd = jnp.concatenate(qdd_l)
    v, a, f = _md_vaf_s(km, X, qd, qdd, gravity)
    Dq_id, Dqd_id = _md_id_grad_cols_wide(
        km, q, qd, v, a, f, gravity=gravity, c0=0, cb=nv, X=X)
    outs = [-_chol_solve_act(cols, D) for D in (Dq_id, Dqd_id)]
    # Du = M⁻¹ via L⁻ᵀ·L⁻¹ with both stages sliced to their triangular
    # live regions (3× the wide solve against I)
    Du = _chol_minv_sym(cols, nv)
    return outs[0], outs[1], Du


def md_id_grad_fused(model, q, qd, qdd=None, gravity=-9.81, interpret=False,
                     force_xla=False):
    """Fused generalized tangent-space ∂ID: q (nq,B), qd/qdd (nv,B) →
    (∂τ/∂δq, ∂τ/∂q̇), each (nv,nv,B). Batch-last counterpart of
    :func:`..multidof.md_id_grad`."""
    nv = model.nv

    def body(km, q, qd, *rest):
        X = _md_transforms_s(km, q)
        v, a, f = _md_vaf_s(km, X, qd, rest[0] if rest else None,
                            float(gravity))
        return _md_id_grad_cols_wide(km, q, qd, v, a, f,
                                     gravity=float(gravity), c0=0,
                                     cb=km.nv, X=X)

    states = [q, qd] + ([] if qdd is None else [qdd])
    return tuple(_run_md(model, body, states, [(nv, nv)] * 2, interpret,
                         force_xla, grad=True))


def md_fd_grad_fused(model, q, qd, u, gravity=-9.81, interpret=False,
                     force_xla=False):
    """Fused generalized tangent-space ∇FD: (∂q̈/∂δq, ∂q̈/∂q̇, ∂q̈/∂u),
    each (nv,nv,B) — the whole Carpentier-Mansard pipeline in one kernel."""
    nv = model.nv

    def body(km, q, qd, u):
        return _md_fd_grad_body(km, q, qd, u, gravity=float(gravity))

    return tuple(_run_md(model, body, [q, qd, u], [(nv, nv)] * 3, interpret,
                         force_xla, grad=True))


def _md_ns(model, vals):
    return SimpleNamespace(
        topology=model.topology, joint_types=model.joint_types,
        q_slices=model.q_slices, v_slices=model.v_slices, nv=model.nv,
        axis=np.asarray(model.axis, np.float64),
        S_np=np.asarray(model.S, np.float64),
        **dict(zip(_MD_FIELDS, vals)))


def _md_model_args(model, dtype):
    args = []
    for fname in _MD_FIELDS:
        arr = jnp.asarray(getattr(model, fname), dtype)
        if fname in ("damping", "armature"):
            args.append(arr[:, None])
        else:
            args.append(jnp.broadcast_to(arr[..., None],
                                         arr.shape + (_LANES,)))
    return args


def _run_md(model, body, states, out_dims, interpret, force_xla=False,
            grad=False, gate=None):
    dtype = states[0].dtype
    if gate is None:
        gate = md_grad_workset_ok if grad else md_workset_ok
    out_dims = [d if isinstance(d, tuple) else (d,) for d in out_dims]
    if force_xla or not gate(model.n_joints, model.nv):
        B_sh = states[0].shape[-1:]
        vals = []
        for fname in _MD_FIELDS:
            arr = jnp.asarray(getattr(model, fname), dtype)
            vals.append(arr[:, None] if fname in ("damping", "armature")
                        else jnp.broadcast_to(arr[..., None],
                                              arr.shape + B_sh))
        return list(body(_md_ns(model, vals), *states))

    B = states[0].shape[-1]
    pad = (-B) % _LANES
    if pad:
        states = [jnp.pad(s, ((0, 0),) * (s.ndim - 1) + ((0, pad),))
                  for s in states]
    Bp = B + pad
    model_args = _md_model_args(model, dtype)
    n_model = len(model_args)

    def kernel(*refs):
        mrefs = refs[:n_model]
        srefs = refs[n_model:n_model + len(states)]
        orefs = refs[n_model + len(states):]
        km = _md_ns(model, [r[:] for r in mrefs])
        outs = body(km, *[r[:] for r in srefs])
        for o_ref, o in zip(orefs, outs):
            o_ref[:] = o

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_model
        + [pl.BlockSpec(s.shape[:-1] + (_LANES,),
                        (lambda i, nd=s.ndim: (0,) * (nd - 1) + (i,)),
                        memory_space=pltpu.VMEM) for s in states]
    )
    out_specs = [pl.BlockSpec(d + (_LANES,),
                              (lambda i, nd=len(d): (0,) * nd + (i,)),
                              memory_space=pltpu.VMEM) for d in out_dims]
    out_shape = [jax.ShapeDtypeStruct(d + (Bp,), dtype) for d in out_dims]
    outs = pl.pallas_call(
        kernel, grid=(Bp // _LANES,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        interpret=interpret,
    )(*model_args, *states)
    if pad:
        outs = [o[..., :B] for o in outs]
    return list(outs)


def md_id_fused(model, q, qd, qdd=None, gravity=-9.81, interpret=False,
                force_xla=False):
    """Fused generalized inverse dynamics: q (nq,B), qd/qdd (nv,B) →
    c (nv,B). Batch-last counterpart of :func:`..multidof.md_inverse_dynamics`.
    ``force_xla=True`` runs the identical body as plain XLA (the non-TPU
    batched production path)."""
    def body(km, q, qd, *rest):
        return _md_id_body(km, q, qd, rest[0] if rest else None,
                           gravity=float(gravity))

    states = [q, qd] + ([] if qdd is None else [qdd])
    (c,) = _run_md(model, body, states, [model.nv], interpret, force_xla)
    return c


def md_fd_fused(model, q, qd, u, gravity=-9.81, interpret=False,
                force_xla=False):
    """Fused generalized forward dynamics: q (nq,B), qd/u (nv,B) →
    q̈ (nv,B): RNEA bias + CRBA + dense (nv,nv) Cholesky in one kernel."""
    def body(km, q, qd, u):
        return _md_fd_body(km, q, qd, u, gravity=float(gravity))

    (qdd,) = _run_md(model, body, [q, qd, u], [model.nv], interpret,
                     force_xla)
    return qdd
