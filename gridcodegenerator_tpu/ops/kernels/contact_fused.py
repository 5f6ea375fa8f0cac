"""Fused Pallas TPU kernels for the floating-base contact stack.

Round-3 closure of the reference's defining pattern — one native kernel per
algorithm family (``/root/reference/algorithms/_forward_dynamics.py:143-194``)
— extended to the layers this framework added beyond the reference: the
free-flyer stance solve and the unilateral frictional ground stepper
(the quadruped/humanoid and parallel-RL deployment shapes). The plain-XLA
batch-last bodies in :mod:`..contact` stage every (d, B) intermediate through
HBM; these kernels run the complete pipeline

    X(q) → FK → free-flyer bias + mass matrix → contact rows → Delassus
         → (Cholesky solve | PGS cone solve) → correction / integration

on one VMEM-resident 128-state lane tile per grid step (the 1-D lane-tile
layout of :func:`.fused._pallas_lane_call`: batch on the vector lanes,
structure on the sublanes).

Kernel-safe style: every value stays ≥2-D — scalars-per-state are (1, B)
slices, small matrices are python lists of (1, B) entries (J, M, L, G) so
structural zeros are ``None`` (skipped at trace time — the ancestor-sparsity
analog of the reference's compressed gradient columns) and no op ever
produces a 1-D (B,) array (Mosaic's layout-inference limitation, see the
NOTE at the top of :mod:`..blops`).

Equivalence: the bodies mirror :func:`..contact.fb_constrained_fd_batched`
and :func:`..contact.fb_step_ground_batched` term by term and are tested
against them in interpret mode (tests/test_contact_fused.py) and against
the single-state references through them.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import blops
from .fused import _LANES, _MODEL_FIELDS
from .staged import _CAL, _LANE_BUDGET

__all__ = ["stance_fd_fused", "step_ground_fused", "fb_fd_fused",
           "ff_workset_ok"]


# --------------------------------------------------------------------------
# 2-D-safe small-geometry helpers (batch-last, (1, B)-entry style)
# --------------------------------------------------------------------------
def _cross3s(a, b):
    """(3,B) × (3,B) → (3,B) via (1,B) slices."""
    return jnp.concatenate([
        a[1:2] * b[2:3] - a[2:3] * b[1:2],
        a[2:3] * b[0:1] - a[0:1] * b[2:3],
        a[0:1] * b[1:2] - a[1:2] * b[0:1],
    ])


def _mv3s(A, x, tA=False):
    """(3,3,B) @ (3,B) → (3,B): 3 column-wise (3,B)-wide FMAs (column k of
    A times scalar x_k), not 9 scalar-lane ops."""
    col = (lambda k: A[k]) if tA else (lambda k: A[:, k, :])
    return sum(col(k) * x[k:k + 1] for k in range(3))


def _mm33s(A, B, tA=False, tB=False):
    """(3,3,B) @ (3,3,B) → (3,3,B): 9 column-wise (3,B)-wide FMAs
    (out[:, j] = Σ_k A[:, k]·B[k, j])."""
    acol = (lambda k: A[k]) if tA else (lambda k: A[:, k, :])
    bent = (lambda k, j: B[j, k:k + 1, :]) if tB else (
        lambda k, j: B[k, j:j + 1, :])
    cols = [sum(acol(k) * bent(k, j) for k in range(3)) for j in range(3)]
    return jnp.stack(cols, axis=1)


def _quat_rot_s(quat):
    """(4,B) unit quaternions → (3,3,B), all products on (1,B) slices."""
    w, x, y, z = quat[0:1], quat[1:2], quat[2:3], quat[3:4]
    one = 1.0
    rows = [
        jnp.concatenate([one - 2 * (y * y + z * z), 2 * (x * y - w * z),
                         2 * (x * z + w * y)]),
        jnp.concatenate([2 * (x * y + w * z), one - 2 * (x * x + z * z),
                         2 * (y * z - w * x)]),
        jnp.concatenate([2 * (x * z - w * y), 2 * (y * z + w * x),
                         one - 2 * (x * x + y * y)]),
    ]
    return jnp.stack(rows)


def _quat_mul_s(a, b):
    aw, ax, ay, az = a[0:1], a[1:2], a[2:3], a[3:4]
    bw, bx, by, bz = b[0:1], b[1:2], b[2:3], b[3:4]
    return jnp.concatenate([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by + ay * bw + az * bx - ax * bz,
        aw * bz + az * bw + ax * by - ay * bx,
    ])


def _quat_exp_s(w_dt):
    """(3,B) body rotation vectors → (4,B) unit quaternions exp(½·)."""
    half = 0.5 * w_dt
    ang = jnp.sqrt(half[0:1] ** 2 + half[1:2] ** 2 + half[2:3] ** 2 + 1e-30)
    s = jnp.sin(ang) / ang
    return jnp.concatenate([jnp.cos(ang), s * half[0:1], s * half[1:2],
                            s * half[2:3]])


def _fk_s(km, X):
    """Kernel-safe batch-last FK from precomputed transforms: X (list of
    (6,6,B)) → (Rs list of (3,3,B), ps list of (3,B)). Mirrors
    :func:`..kinematics.fk_bl` with (1,B)-slice arithmetic and no constant
    identity at the root (Rs[root] = Eᵀ directly)."""
    topo = km.topology
    n = topo.n
    Rs = [None] * n
    ps = [None] * n
    for i in range(n):
        E = X[i][:3, :3]                       # (3,3,B) child ← parent
        M = -_mm33s(E, X[i][3:, :3], tA=True)
        r = jnp.concatenate([M[2, 1:2, :], M[0, 2:3, :], M[1, 0:1, :]])
        p = topo.parents[i]
        if p < 0:
            # world ← link = Eᵀ; joint origin r is already world-frame
            Rs[i] = jnp.stack([
                jnp.concatenate([E[j, i2:i2 + 1, :] for j in range(3)])
                for i2 in range(3)])           # Eᵀ rows
            ps[i] = r
        else:
            Rs[i] = _mm33s(Rs[p], E, tB=True)  # R_p @ Eᵀ
            ps[i] = ps[p] + _mv3s(Rs[p], r)
    return Rs, ps


def _sum_terms(terms):
    """Sum a list of (1,B) terms, skipping Nones; None if all are None."""
    live = [t for t in terms if t is not None]
    if not live:
        return None
    s = live[0]
    for t in live[1:]:
        s = s + t
    return s


# --------------------------------------------------------------------------
# free-flyer bias + mass matrix, (1,B)-entry style
# --------------------------------------------------------------------------
def _fb_bias_s(km, I_base, X, R, vb, qd, gravity):
    """Kernel-safe :func:`..freeflyer.fb_bias`: → (f_b (6,B), c_j (n,B)).
    a₀ = [0; −Rᵀ g] enters structurally (the three zero angular rows are
    never materialized)."""
    topo = km.topology
    n = topo.n
    g = float(gravity)
    # a0_lin = −g_b = −g·R[2, :] (third row of R_wb, batch-last)
    a0_lin = jnp.concatenate([-g * R[2, i:i + 1, :] for i in range(3)])

    def x_dot_a0(Xi):
        # X·a0 with a0 = [0,0,0 | a0_lin]: linear columns only
        return sum(Xi[:, 3 + c, :] * a0_lin[c:c + 1] for c in range(3))

    v = [None] * n
    a = [None] * n
    f = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Si = km.S[i]                                    # (6,B)
        Sqd = Si * qd[i:i + 1]
        v[i] = blops.matvec6(X[i], vb if p < 0 else v[p]) + Sqd
        ai = (x_dot_a0(X[i]) if p < 0 else blops.matvec6(X[i], a[p]))
        a[i] = ai + blops.crm_apply_bl(v[i], Sqd)
        Ii = km.inertia[i]                              # (6,6,B)
        Iv = blops.matvec6(Ii, v[i])
        f[i] = blops.matvec6(Ii, a[i]) + blops.crf_apply_bl(v[i], Iv)
    Ivb = blops.matvec6(I_base, vb)
    f_b = (sum(I_base[:, 3 + c, :] * a0_lin[c:c + 1] for c in range(3))
           + blops.crf_apply_bl(vb, Ivb))
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            f[p] = f[p] + blops.matvec6_T(X[i], f[i])
        else:
            f_b = f_b + blops.matvec6_T(X[i], f[i])
    cj_rows = []
    for i in range(n):
        ci = sum(km.S[i][c:c + 1] * f[i][c:c + 1] for c in range(6))
        # damping ships (n, 1): a (1,1) slice broadcasts against (1,B)
        cj_rows.append(ci + km.damping[i:i + 1, 0:1] * qd[i:i + 1])
    return f_b, jnp.concatenate(cj_rows)


def _fb_mass_s(km, I_base, X):
    """Kernel-safe :func:`..freeflyer.fb_mass_matrix`: → list-of-lists of
    (1,B) entries, (6+n)×(6+n), ``None`` where structurally zero (joint pairs
    with no ancestor relation)."""
    topo = km.topology
    n = topo.n
    IC = [km.inertia[i] for i in range(n)]
    IC_b = I_base
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        contrib = blops.matmat6_T(X[i], blops.matmat6(IC[i], X[i]))
        if p >= 0:
            IC[p] = IC[p] + contrib
        else:
            IC_b = IC_b + contrib

    m = 6 + n
    E = [[None] * m for _ in range(m)]
    for r in range(6):
        for c in range(6):
            E[r][c] = IC_b[r, c:c + 1, :]
    for i in range(n):
        F = blops.matvec6(IC[i], km.S[i])               # (6,B)
        # + armature on the joint diagonal (ships (n,1) like damping)
        E[6 + i][6 + i] = (sum(km.S[i][c:c + 1] * F[c:c + 1]
                               for c in range(6))
                           + km.armature[i:i + 1, 0:1])
        j = i
        while topo.parents[j] >= 0:
            F = blops.matvec6_T(X[j], F)
            j = topo.parents[j]
            val = sum(F[c:c + 1] * km.S[j][c:c + 1] for c in range(6))
            E[6 + i][6 + j] = val
            E[6 + j][6 + i] = val
        F = blops.matvec6_T(X[j], F)                    # into base coords
        for c in range(6):
            E[6 + i][c] = F[c:c + 1]
            E[c][6 + i] = F[c:c + 1]
    return E


# --------------------------------------------------------------------------
# (1,B)-entry linear algebra: Cholesky, solves
# --------------------------------------------------------------------------
def _chol_apply_e(L, r):
    """Solve (L Lᵀ) x = r with r a list of m (1,B)/None entries."""
    m = len(L)
    y = [None] * m
    for i in range(m):
        terms = ([r[i]] if r[i] is not None else [])
        terms.extend(-L[i][p] * y[p] for p in range(i)
                     if L[i][p] is not None and y[p] is not None)
        s = _sum_terms(terms)
        y[i] = (s / L[i][i]) if s is not None else None
    x = [None] * m
    for i in reversed(range(m)):
        terms = ([y[i]] if y[i] is not None else [])
        terms.extend(-L[p][i] * x[p] for p in range(i + 1, m)
                     if L[p][i] is not None and x[p] is not None)
        s = _sum_terms(terms)
        x[i] = (s / L[i][i]) if s is not None else None
    return x


def _chol_factor_act(M, m, reg=0.0):
    """Left-looking column Cholesky of an m×m list-of-lists of (1,B)/None
    entries, restricted to the ACTIVE region: ``cols[j]`` is the (m−j, B)
    stack of rows j..m−1 of L's column j (``cols[j][0:1]`` is the
    diagonal). Each column update is one wide FMA per prior column
    (the register-utilization fix applied to the factorization), and
    slicing the update to the at-or-below-diagonal region — a full-height
    form would spend 2/3 of each update on structural zeros / stale
    partial sums above the diagonal — puts the factor at m³/6 wide-op
    flops in ~m²/2 instructions. ``reg`` adds Tikhonov mass to the
    diagonal (the Delassus factor's singular-stance guard)."""
    zero = None
    for row in M:
        for e in row:
            if e is not None:
                zero = jnp.zeros_like(e)
                break
        if zero is not None:
            break
    cols = []
    for j in range(m):
        c = jnp.concatenate([
            zero if M[i][j] is None else M[i][j]
            for i in range(j, m)])                         # (m-j, B)
        if reg:
            c = jnp.concatenate([c[0:1] + reg] +
                                ([c[1:]] if m - j > 1 else []))
        for p in range(j):
            # L[j:, p] = cols[p][j-p:], L[j, p] = cols[p][j-p : j-p+1]
            c = c - cols[p][j - p:] * cols[p][j - p:j - p + 1]
        cols.append(c / jnp.sqrt(c[0:1]))
    return cols


def _act_view(cols, m):
    """Active columns → the ``Lview[i][j]`` (1,B) entry table consumed by
    the entry-wise solves (:func:`_chol_apply_e`)."""
    return [[cols[j][i - j:i - j + 1] if j <= i else None
             for j in range(m)] for i in range(m)]


def _chol_factor_ev(M, m):
    """Entry-view factor (for the entry-wise merged multi-rhs solves) at
    the active-region flop count."""
    return _act_view(_chol_factor_act(M, m), m)


def _chol_solve_act(cols, Bmat):
    """Solve (L Lᵀ) X = B for a WIDE rhs tensor B (m, k, *b) with the
    active column factor from :func:`_chol_factor_act` — column-oriented
    forward/back substitution: one (m−j, k, *b) FMA per column instead of
    m²/2 entry ops per rhs (the register-utilization fix applied to the
    multi-rhs solve), reading the diagonal / below-diagonal parts from
    the sliced columns."""
    m = len(cols)

    def replace_row(T, j, row, tail=None):
        parts = ([T[:j]] if j > 0 else []) + [row[None]]
        if j + 1 < m:
            parts.append(T[j + 1:] if tail is None else tail)
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    Y = Bmat
    for j in range(m):
        dj = cols[j][0:1]                            # (1, *b)
        yj = Y[j] / dj                               # (k, *b)
        tail = (Y[j + 1:] - cols[j][1:][:, None] * yj[None]
                if j + 1 < m else None)
        Y = replace_row(Y, j, yj, tail)
    X = Y
    for j in reversed(range(m)):
        dj = cols[j][0:1]
        if j + 1 < m:
            corr = jnp.sum(cols[j][1:][:, None] * X[j + 1:], axis=0)
            xj = (X[j] - corr) / dj
        else:
            xj = X[j] / dj
        X = replace_row(X, j, xj)
    return X


def _chol_minv_sym(cols, m):
    """Dense symmetric inverse (m, m, B) from the active column factor:
    M⁻¹ = L⁻ᵀ·L⁻¹ with both stages sliced to their triangular live
    regions. The straight route — a wide multi-rhs solve against I — runs
    a full-width forward + backward substitution (m³ wide-op flops) and
    ignores that (a) L⁻¹ is lower-triangular so the forward pass only
    ever touches columns ≤ j, and (b) M⁻¹ is symmetric so only one
    triangle needs computing. L⁻¹ (m³/6) + symmetric product (m³/6)
    replaces the m³ solve — with the sliced factor (m³/6 vs m³/2), the
    whole dense-M⁻¹ pipeline drops 3×, the op-count lever for the K2md
    staged kernel at humanoid scale (nv = 34)."""
    b = cols[0].shape[1:]
    dtype = cols[0].dtype
    one = jnp.ones_like(cols[0][0:1])
    zero = jnp.zeros_like(one)

    def zrow(k):
        return jnp.zeros((k,) + b, dtype)

    # Y = L⁻¹ as a full (m, m, B) lower-triangular tensor, built with
    # column-sliced updates: at step j only columns ≤ j of the remaining
    # rows carry corrections; columns > j still hold their identity part.
    Y = jnp.stack([
        jnp.concatenate([one if c == r else zero for c in range(m)])
        for r in range(m)])                              # (m, m, B)
    for j in range(m):
        dj = cols[j][0:1]
        yj = Y[j, :j + 1] / dj                           # (j+1, B)
        yj_full = (jnp.concatenate([yj, zrow(m - j - 1)])
                   if j + 1 < m else yj)
        parts = ([Y[:j]] if j > 0 else []) + [yj_full[None]]
        if j + 1 < m:
            upd = Y[j + 1:, :j + 1] - cols[j][1:][:, None] * yj[None]
            parts.append(jnp.concatenate([upd, Y[j + 1:, j + 1:]], axis=1))
        Y = jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    # Symmetric product, upper triangle only: column j of M⁻¹ above the
    # diagonal = Σ_{p≥j} L⁻¹[p, :j+1] · L⁻¹[p, j]  (one wide contraction
    # per column). T[j] holds that column padded to height m, so
    # T[j, i] = M⁻¹[i, j] for i ≤ j; the transpose supplies the upper
    # triangle + diagonal and T itself (diagonal zeroed) the strict lower.
    Tfull, Tstrict = [], []
    for j in range(m):
        colj = jnp.sum(Y[j:, :j + 1] * Y[j:, j][:, None], axis=0)  # (j+1,B)
        pad = zrow(m - j - 1) if j + 1 < m else None
        Tfull.append(jnp.concatenate([colj, pad])
                     if pad is not None else colj)
        strict = ([colj[:j]] if j > 0 else []) + [zrow(m - j)]
        Tstrict.append(jnp.concatenate(strict) if len(strict) > 1
                       else strict[0])
    Tfull = jnp.stack(Tfull)                             # (m, m, B)
    Tstrict = jnp.stack(Tstrict)
    return jnp.swapaxes(Tfull, 0, 1) + Tstrict


def _stack_rows(entries, like):
    """List of (1,B)/None → one (R,B) array (None fills zero).

    The register-utilization fix for the scalar solve chain: a (1, 128)
    value occupies one sublane of an (8, 128) vector register, so chains
    of (1,B) ops run the VPU at 1/8 payload. Stacking the 3k contact rows
    into (3k, B) arrays lets the Delassus solves, G assembly, and PGS run
    full-register ops (the multi-rhs forms below), ~3k/8-wide instead of
    1-wide."""
    zero = jnp.zeros_like(like)
    return jnp.concatenate([e if e is not None else zero for e in entries])


def _jt_stacks(J, m, like):
    """Contact rows (list 3k × list m of (1,B)/None) → per-COLUMN stacks:
    JT[c] = (3k, B) holding J[r][c] for every row r. None columns (joints
    outside every contact's support) stay None."""
    k3 = len(J)
    JT = []
    for c in range(m):
        ent = [J[r][c] for r in range(k3)]
        JT.append(None if all(e is None for e in ent)
                  else _stack_rows(ent, like))
    return JT


# --------------------------------------------------------------------------
# free-flyer contact rows, (1,B)-entry style with structural sparsity
# --------------------------------------------------------------------------
def _ff_contact_rows_s(km, X, R, links, offsets):
    """World-frame contact rows of the free-flyer as a list over 3k rows of
    lists over (6+n) columns of (1,B)/None entries, plus the foot points in
    base coordinates x_b (list of k (3,B)). ``offsets`` enter as baked float
    literals. Columns outside ancestors(link)∪{link} are ``None`` — the
    trace-time sparsity the dense (3k, 6+n, B) XLA form pays for with
    multiplies by zero."""
    topo = km.topology
    n = topo.n
    Rs, ps = _fk_s(km, X)
    rows = []
    xs = []
    for ci, l in enumerate(links):
        off = [float(offsets[ci][d]) for d in range(3)]
        x_b = ps[l] + jnp.concatenate([
            sum(Rs[l][i, j:j + 1, :] * off[j] for j in range(3))
            for i in range(3)])
        xs.append(x_b)
        support = set(topo.ancestors[l]) | {l}
        # every column built ONCE as a (3,B)-wide world vector; the 3k×m
        # entry rows below are pure slice views of these
        zero1 = x_b[0:1] * 0.0
        # ω_b columns: R (e_j × x_b) with (e_0×x) = (0, −x2, x1),
        # (e_1×x) = (x2, 0, −x0), (e_2×x) = (−x1, x0, 0)
        ex = [jnp.concatenate([zero1, -x_b[2:3], x_b[1:2]]),
              jnp.concatenate([x_b[2:3], zero1, -x_b[0:1]]),
              jnp.concatenate([-x_b[1:2], x_b[0:1], zero1])]
        wcols = [_mv3s(R, e) for e in ex]                      # 3 × (3,B)
        acols = {}
        for j in sorted(support):
            a_ang = _mv3s(Rs[j], km.S[j][:3])
            a_lin = _mv3s(Rs[j], km.S[j][3:])
            # world-frame q̇ column: R (a_ang × (x_b − p_j) + a_lin)
            acols[j] = _mv3s(R, _cross3s(a_ang, x_b - ps[j]) + a_lin)
        for r in range(3):
            row = [None] * (6 + n)
            for j in range(3):
                row[j] = wcols[j][r:r + 1]
            for j in range(3):                  # v_b columns: R[:, j]
                row[3 + j] = R[r, j:j + 1, :]
            for j, col in acols.items():        # q̇ columns (world frame)
                row[6 + j] = col[r:r + 1]
            rows.append(row)
    return rows, xs


# --------------------------------------------------------------------------
# collision rows, (1,B)-entry style
# --------------------------------------------------------------------------
def _mv3s_c(A, c):
    """A (3,3,B) @ constant 3-vector (python floats) → (3,B); zero
    components fold away at trace time."""
    return jnp.concatenate([
        sum(A[i, j:j + 1, :] * c[j] for j in range(3) if c[j] != 0.0)
        if any(c[j] != 0.0 for j in range(3))
        else A[i, 0:1, :] * 0.0
        for i in range(3)])


def _mtv3s_c(A, c):
    """Aᵀ (3,3,B) @ constant 3-vector → (3,B)."""
    return jnp.concatenate([
        sum(A[j, i:i + 1, :] * c[j] for j in range(3) if c[j] != 0.0)
        if any(c[j] != 0.0 for j in range(3))
        else A[0, i:i + 1, :] * 0.0
        for i in range(3)])


_COL_EPS = 1e-12


def _seg_seg_closest_s(p1, d1, p2, d2):
    """Entry-style :func:`..collision._seg_seg_closest_bl`: segment
    (start (3,B), vector (3,B)) pairs → witness points ((3,B), (3,B)).
    Identical clamped Ericson algebra (degenerate segments via the
    regularized denominators)."""
    dot = lambda x, y: jnp.sum(x * y, axis=0, keepdims=True)   # (1,B)
    rv = p1 - p2
    a, e, b = dot(d1, d1), dot(d2, d2), dot(d1, d2)
    c, f = dot(d1, rv), dot(d2, rv)
    denom = a * e - b * b
    s = jnp.clip(jnp.where(denom > _COL_EPS, (b * f - c * e)
                           / jnp.maximum(denom, _COL_EPS), 0.0), 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, _COL_EPS), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.maximum(a, _COL_EPS), 0.0, 1.0)
    return p1 + s * d1, p2 + t * d2


def _pair_geometry_s(cA, dA, rA, cB, dB, rB):
    """gap (1,B), unit normal B→A (3,B), shared contact point (3,B) for two
    capsules in segment (start, vector) form; radii are float literals."""
    wA, wB = _seg_seg_closest_s(cA, dA, cB, dB)
    diff = wA - wB
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=0, keepdims=True) + _COL_EPS)
    nrm = diff / dist
    gap = dist - rA - rB
    point = 0.5 * ((wA - rA * nrm) + (wB + rB * nrm))
    return gap, nrm, point


def _frame_rows_s(nr):
    """[t1, t2, n] frame rows (3 × (3,B)) for unit normals (3,B) — the
    branchless basis of :func:`..collision._contact_frame_cols_bl`."""
    n0, n1, n2 = nr[0:1], nr[1:2], nr[2:3]
    sign = jnp.where(n2 >= 0.0, 1.0, -1.0)
    aa = -1.0 / (sign + n2 + jnp.where(n2 >= 0.0, _COL_EPS, -_COL_EPS))
    bb = n0 * n1 * aa
    t1 = jnp.concatenate([1.0 + sign * n0 * n0 * aa, sign * bb,
                          -sign * n0])
    t2 = jnp.concatenate([bb, sign + n1 * n1 * aa, -n1])
    return t1, t2, nr


def _point_cols_s(km, Rs, ps, link, x):
    """Arm q̇-columns (base coords) of a traced point ``x`` (3,B) rigidly
    attached to ``link``: dict {j: (3,B)} over ancestors(link)∪{link} —
    the traced-point analog of the foot columns in
    :func:`_ff_contact_rows_s`. ``link == -1`` (base geom): empty dict."""
    if link < 0:
        return {}
    support = set(km.topology.ancestors[link]) | {link}
    cols = {}
    for j in sorted(support):
        a_ang = _mv3s(Rs[j], km.S[j][:3])
        a_lin = _mv3s(Rs[j], km.S[j][3:])
        cols[j] = _cross3s(a_ang, x - ps[j]) + a_lin
    return cols


def collision_static(cm):
    """Bake a :class:`..collision.CollisionModel` into plain-float static
    data for the fused kernels (like ``offsets``: geometry becomes trace
    literals, so it must be concrete — the XLA body keeps it traceable)."""
    g = cm.geoms
    return dict(
        links=tuple(int(l) for l in g.links),
        a=np.asarray(g.a, np.float64),
        d=np.asarray(g.b, np.float64) - np.asarray(g.a, np.float64),
        r=np.asarray(g.r, np.float64),
        pairs=tuple((int(i), int(j)) for i, j in cm.pairs),
        obs_a=(None if cm.obstacles is None
               else np.asarray(cm.obstacles.a, np.float64)),
        obs_d=(None if cm.obstacles is None
               else np.asarray(cm.obstacles.b, np.float64)
               - np.asarray(cm.obstacles.a, np.float64)),
        obs_r=(None if cm.obstacles is None
               else np.asarray(cm.obstacles.r, np.float64)),
        obs_pairs=tuple((int(i), int(w)) for i, w in cm.obs_pairs),
    )


def _collision_rows_s(km, X, R, pos, cs):
    """Collision contact rows in (1,B)-entry style: returns (rows — list
    over 3c of (6+n)-column entry lists — and gaps — list of c (1,B)).
    Mirrors :func:`..collision.fb_collision_rows_bl`: self pairs carry only
    the arm-column difference (base columns cancel at coincident points),
    obstacle pairs carry the full base block like the foot rows."""
    n = km.topology.n
    m = 6 + n
    Rs, ps = _fk_s(km, X)

    starts, vecs = [], []
    one = ps[0][0:1] * 0.0 + 1.0                # (1,B) lane template
    const3 = lambda v: jnp.concatenate([one * float(c) for c in v])
    for i, l in enumerate(cs["links"]):
        if l < 0:                               # base geom: base-frame consts
            starts.append(const3(cs["a"][i]))
            vecs.append(const3(cs["d"][i]))
            continue
        starts.append(ps[l] + _mv3s_c(Rs[l], [float(v)
                                              for v in cs["a"][i]]))
        vecs.append(_mv3s_c(Rs[l], [float(v) for v in cs["d"][i]]))

    rows, gaps = [], []

    def emit(gap, nrm_b, base_cols, arm_cols):
        """base_cols: None (self pair) or 3 angular (3,B) world columns;
        arm_cols: dict {j: (3,B) base-coords column}."""
        frame = _frame_rows_s(_mv3s(R, nrm_b))
        wcols = {j: _mv3s(R, col) for j, col in arm_cols.items()}
        gaps.append(gap)
        for r in range(3):
            row = [None] * m
            if base_cols is not None:
                for j in range(3):
                    row[j] = jnp.sum(frame[r] * base_cols[j], axis=0,
                                     keepdims=True)
                for j in range(3):              # v_b columns: C @ R[:, j]
                    row[3 + j] = jnp.sum(
                        frame[r] * jnp.concatenate(
                            [R[i2, j:j + 1, :] for i2 in range(3)]),
                        axis=0, keepdims=True)
            for j, col in wcols.items():
                row[6 + j] = jnp.sum(frame[r] * col, axis=0, keepdims=True)
            rows.append(row)

    for gi, gj in cs["pairs"]:
        gap, nrm_b, pt_b = _pair_geometry_s(
            starts[gi], vecs[gi], float(cs["r"][gi]),
            starts[gj], vecs[gj], float(cs["r"][gj]))
        ci = _point_cols_s(km, Rs, ps, cs["links"][gi], pt_b)
        cj = _point_cols_s(km, Rs, ps, cs["links"][gj], pt_b)
        arm = {j: (ci.get(j, 0.0) - cj[j]) if j in cj else ci[j]
               for j in set(ci) | set(cj)}
        emit(gap, nrm_b, None, arm)

    for gi, w in cs["obs_pairs"]:
        aw = [float(v) for v in cs["obs_a"][w]]
        dw = [float(v) for v in cs["obs_d"][w]]
        # obstacle world → base coords: Rᵀ(a_w − pos), Rᵀ d_w
        a_rel = jnp.concatenate([aw[d2] - pos[d2:d2 + 1]
                                 for d2 in range(3)])
        a_b = _mv3s(R, a_rel, tA=True)
        d_b = _mtv3s_c(R, dw)
        gap, nrm_b, pt_b = _pair_geometry_s(
            starts[gi], vecs[gi], float(cs["r"][gi]),
            a_b, d_b, float(cs["obs_r"][w]))
        # base angular columns: R (e_j × pt_b) — the foot-row pattern
        zero1 = pt_b[0:1] * 0.0
        ex = [jnp.concatenate([zero1, -pt_b[2:3], pt_b[1:2]]),
              jnp.concatenate([pt_b[2:3], zero1, -pt_b[0:1]]),
              jnp.concatenate([-pt_b[1:2], pt_b[0:1], zero1])]
        emit(gap, nrm_b, [_mv3s(R, e) for e in ex],
             _point_cols_s(km, Rs, ps, cs["links"][gi], pt_b))

    return rows, gaps


# --------------------------------------------------------------------------
# loop-closure rows, (1,B)-entry style
# --------------------------------------------------------------------------
def loops_static(n, loops):
    """Bake a ``loops=(pairs, offsets_a, offsets_b)`` spec into plain-float
    static data for the fused kernels (geometry becomes trace literals,
    like ``offsets``/:func:`collision_static`; the XLA body keeps it
    traceable)."""
    from ..loops import _check_fb_pairs

    lpairs, loa, lob = loops
    lpairs = _check_fb_pairs(n, lpairs, loa, lob)
    return dict(pairs=tuple((int(a), int(b)) for a, b in lpairs),
                oa=np.asarray(loa, np.float64),
                ob=np.asarray(lob, np.float64))


def _loop_rows_s(km, X, R, pos, ls):
    """Loop-closure (bilateral) rows in (1,B)-entry style: returns
    (rows — list over 3·k_loop of (6+n)-column entry lists — and gaps —
    list of 3·k_loop (1,B) world-frame gap components). Mirrors
    :func:`..loops._fb_loop_rows_bl` + the gap assembly of
    :func:`..contact.fb_step_ground_batched`: link↔link pairs carry NO
    base linear-velocity columns (both points ride the same base — the
    cancellation is structural, ``None``, not a numerical difference);
    the angular columns are R·(e_j × (x_a − x_b)); world pairs (b = −1)
    measure against the literal anchor and carry the full base block."""
    m = 6 + km.topology.n
    Rs, ps = _fk_s(km, X)

    def side(link, off):
        off_f = [float(off[d]) for d in range(3)]
        x_b = ps[link] + _mv3s_c(Rs[link], off_f)
        support = set(km.topology.ancestors[link]) | {link}
        cols = {}
        for j in sorted(support):
            a_ang = _mv3s(Rs[j], km.S[j][:3])
            a_lin = _mv3s(Rs[j], km.S[j][3:])
            cols[j] = _cross3s(a_ang, x_b - ps[j]) + a_lin
        return x_b, cols

    rows, gaps = [], []
    for i, (a, b) in enumerate(ls["pairs"]):
        xa, ca = side(a, ls["oa"][i])
        if b >= 0:
            xb, cb = side(b, ls["ob"][i])
            rel = xa - xb
            arm = {j: (ca[j] - cb[j] if (j in ca and j in cb)
                       else (ca[j] if j in ca else -cb[j]))
                   for j in set(ca) | set(cb)}
            gap = _mv3s(R, rel)
        else:
            rel = xa
            arm = ca
            anchor = [float(ls["ob"][i][d]) for d in range(3)]
            gw = _mv3s(R, xa)
            gap = jnp.concatenate([pos[d:d + 1] + gw[d:d + 1] - anchor[d]
                                   for d in range(3)])
        zero1 = rel[0:1] * 0.0
        ex = [jnp.concatenate([zero1, -rel[2:3], rel[1:2]]),
              jnp.concatenate([rel[2:3], zero1, -rel[0:1]]),
              jnp.concatenate([-rel[1:2], rel[0:1], zero1])]
        wcols = [_mv3s(R, e) for e in ex]
        armw = {j: _mv3s(R, c) for j, c in arm.items()}
        for r in range(3):
            row = [None] * m
            for j in range(3):
                row[j] = wcols[j][r:r + 1]
            if b < 0:                           # world pair: v_b = R[:, j]
                for j in range(3):
                    row[3 + j] = R[r, j:j + 1, :]
            for j, col in armw.items():
                row[6 + j] = col[r:r + 1]
            rows.append(row)
            gaps.append(gap[r:r + 1])
    return rows, gaps


# --------------------------------------------------------------------------
# geom-vs-ground rows, (1,B)-entry style
# --------------------------------------------------------------------------
def _terrain_surface_s(ts, tables, px, py, dtype):
    """(h, (nx, ny, nz), C) of the baked heightfield at world (px, py)
    ((1,B) slices) — the in-kernel ``terrain.terrain_surface`` +
    ``contact_frame``. The per-point bilinear lookup rides the MXU: ONE
    one-hot mask (iota == flat cell index, (HWp, B)) against four
    statically-ROLLED copies of the flattened height grid gives all four
    corners in a single (4, HWp) @ (HWp, B) matmul."""
    W, Hn, cell = ts["W"], ts["H"], ts["cell"]
    HWp = tables.shape[1]
    u = (px - ts["x0"]) / cell
    vq = (py - ts["y0"]) / cell
    iu = jnp.clip(jnp.floor(u), 0, Hn - 2)
    iv = jnp.clip(jnp.floor(vq), 0, W - 2)
    fu = u - iu
    fv = vq - iv
    idx = iu * W + iv                  # exact small ints in f32
    # int iota converted to float for the == : Mosaic rejects a
    # float-typed tpu.iota outright ('result #0 must be vector of
    # integer or index values', v5e 2026-08-19 — interpret mode
    # accepted it, hardware lowering does not)
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (HWp, idx.shape[-1]), 0).astype(dtype)
    onehot = (iota == idx).astype(dtype)          # (HWp, B)
    # HIGHEST precision: the MXU's default f32 matmul truncates
    # inputs to bf16 (the onehot side is exact 0/1, but the
    # height table loses ~2^-9 relative), and the gather error
    # amplifies through the Baumgarte bias (erp·pen/dt, dt=1e-3
    # → ×200). Measured v5e: 7.6e-5 step error at default vs
    # the 3e-5 f32 pipeline floor; the (4,HWp)×(HWp,B) matmul
    # is a trivial share of the kernel, so exactness is free.
    corners = jnp.dot(tables, onehot,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=dtype)  # (4, B)
    h00, h10, h01, h11 = (corners[d:d + 1] for d in range(4))
    h = ((1 - fu) * (1 - fv) * h00 + fu * (1 - fv) * h10
         + (1 - fu) * fv * h01 + fu * fv * h11)
    hx = ((1 - fv) * (h10 - h00) + fv * (h11 - h01)) / cell
    hy = ((1 - fu) * (h01 - h00) + fu * (h11 - h10)) / cell
    inv = 1.0 / jnp.sqrt(hx * hx + hy * hy + 1.0)
    nx, ny, nz = -hx * inv, -hy * inv, inv
    it = 1.0 / jnp.sqrt(nz * nz + nx * nx)
    t1 = (nz * it, jnp.zeros_like(nz), -nx * it)
    t2 = (ny * t1[2] - nz * t1[1],
          nz * t1[0] - nx * t1[2],
          nx * t1[1] - ny * t1[0])
    return h, (nx, ny, nz), (t1, t2, (nx, ny, nz))


def ground_geoms_static(geoms):
    """Bake a :class:`..collision.Geoms` set into the static ground-contact
    list ((link, endpoint float3, radius) per contact — one per sphere,
    two per capsule; :func:`..collision._ground_contact_list`) for the
    fused kernels. Geometry must be concrete (trace literals, like
    ``offsets``)."""
    from ..collision import _ground_contact_list

    a = np.asarray(geoms.a, np.float64)
    b = np.asarray(geoms.b, np.float64)
    r = np.asarray(geoms.r, np.float64)
    return tuple(
        (int(geoms.links[i]),
         tuple(float(v) for v in (a[i] if e == 0 else b[i])), float(r[i]))
        for i, e in _ground_contact_list(geoms))


def _ground_geom_rows_s(km, X, R, pos, contacts, *, ground_z,
                        terrain_static, tables, dtype):
    """Geom-vs-ground contact rows in (1,B)-entry style: returns (rows —
    list over 3c of (6+n)-column entry lists — and gaps — list of c
    (1,B)). Mirrors :func:`..collision.fb_ground_geom_rows`: per endpoint
    sphere (center e, radius r) the gap is measured along the local
    normal minus r, and the Jacobian is the point Jacobian of the
    material point x_c = e − r·n (full base block; zero arm columns for
    base geoms, link -1)."""
    topo = km.topology
    n = topo.n
    m = 6 + n
    Rs, ps = _fk_s(km, X)
    one = ps[0][0:1] * 0.0 + 1.0                # (1,B) lane template
    const3 = lambda v: jnp.concatenate([one * float(c) for c in v])
    rows, gaps = [], []
    for l, e0, r in contacts:
        x_b = (const3(e0) if l < 0
               else ps[l] + _mv3s_c(Rs[l], [float(v) for v in e0]))
        p_w = [pos[d:d + 1]
               + sum(R[d, j:j + 1, :] * x_b[j:j + 1] for j in range(3))
               for d in range(3)]
        if terrain_static is None:
            gap = p_w[2] - r - ground_z
            # world normal e_z in base coords: Rᵀ e_z = R's third row
            n_b = jnp.concatenate([R[2, j:j + 1, :] for j in range(3)])
            C = None
        else:
            h, nw, C = _terrain_surface_s(terrain_static, tables,
                                          p_w[0], p_w[1], dtype)
            gap = (p_w[2] - h) * nw[2] - r
            # world normal → base coords: (Rᵀ n)_j = Σ_d R[d, j]·n_d
            n_b = jnp.concatenate(
                [sum(R[d, j:j + 1, :] * nw[d] for d in range(3))
                 for j in range(3)])
        x_c = x_b - r * n_b                     # material point, base coords
        zero1 = x_c[0:1] * 0.0
        ex = [jnp.concatenate([zero1, -x_c[2:3], x_c[1:2]]),
              jnp.concatenate([x_c[2:3], zero1, -x_c[0:1]]),
              jnp.concatenate([-x_c[1:2], x_c[0:1], zero1])]
        wcols = [_mv3s(R, e) for e in ex]
        acols = {}
        if l >= 0:
            for j in sorted(set(topo.ancestors[l]) | {l}):
                a_ang = _mv3s(Rs[j], km.S[j][:3])
                a_lin = _mv3s(Rs[j], km.S[j][3:])
                acols[j] = _mv3s(R, _cross3s(a_ang, x_c - ps[j]) + a_lin)
        wrows = []
        for rr in range(3):
            row = [None] * m
            for j in range(3):
                row[j] = wcols[j][rr:rr + 1]
            for j in range(3):                  # v_b columns: R[:, j]
                row[3 + j] = R[rr, j:j + 1, :]
            for j, col in acols.items():
                row[6 + j] = col[rr:rr + 1]
            wrows.append(row)
        if C is not None:                       # rotate into [t1, t2, n]
            rot = []
            for rr in range(3):
                row = []
                for c in range(m):
                    terms = [C[rr][w] * wrows[w][c] for w in range(3)
                             if wrows[w][c] is not None]
                    row.append(_sum_terms(terms) if terms else None)
                rot.append(row)
            wrows = rot
        rows.extend(wrows)
        gaps.append(gap)
    return rows, gaps


# --------------------------------------------------------------------------
# kernel bodies
# --------------------------------------------------------------------------
def _stance_prelude(km, I_base, quat, q, vb, qd, tau, gravity):
    """Shared front half: transforms, bias, mass Cholesky, contact rows and
    their velocity product (for the jvp'd bias / b-vector)."""
    X = blops.joint_transforms_bl(km, q)
    R = _quat_rot_s(quat)
    f_b, c_j = _fb_bias_s(km, I_base, X, R, vb, qd, gravity)
    M = _fb_mass_s(km, I_base, X)
    return X, R, f_b, c_j, M


def _vfull_list(km, vb, qd):
    n = km.topology.n
    return ([vb[c:c + 1] for c in range(6)]
            + [qd[i:i + 1] for i in range(n)])


def _stance_body(km, I_base, quat, pos, q, vb, qd, tau, *, links, offsets,
                 anchors, gravity, baumgarte, reg):
    """Stance FD on one lane tile: returns (dvb (6,B), qdd (n,B), lam (3k,B)).
    Mirrors :func:`..contact.fb_constrained_fd_batched` term by term; the
    Delassus chain runs on (3k, B) row stacks (see :func:`_stack_rows`)."""
    n = km.topology.n
    m = 6 + n
    k = len(links)
    X, R, f_b, c_j, M = _stance_prelude(km, I_base, quat, q, vb, qd, tau,
                                        gravity)
    Lm = _chol_factor_ev(M, m)
    rhs_free = ([-f_b[c:c + 1] for c in range(6)]
                + [tau[i:i + 1] - c_j[i:i + 1] for i in range(n)])

    J, xs = _ff_contact_rows_s(km, X, R, links, offsets)
    vfull = _vfull_list(km, vb, qd)
    JT = _jt_stacks(J, m, q[0:1])              # per-column (3k, B) stacks

    # ONE merged multi-rhs solve: rows 0..3k-1 = M⁻¹Jᵀ, row 3k = y_free
    zero3k = jnp.zeros((3 * k,) + q.shape[1:], q.dtype)
    sol = _chol_apply_e(Lm, [
        jnp.concatenate([JT[c] if JT[c] is not None else zero3k,
                         rhs_free[c]])
        for c in range(m)])
    MiJt = [sol[c][:3 * k] for c in range(m)]
    y_free = [sol[c][3 * k:3 * k + 1] for c in range(m)]

    # bias = J̇·[vb; q̇]: exact jvp of the velocity map along the state flow,
    # assembled as ONE (3k, B) array
    def vel(quat_, q_):
        X_ = blops.joint_transforms_bl(km, q_)
        R_ = _quat_rot_s(quat_)
        J_, _ = _ff_contact_rows_s(km, X_, R_, links, offsets)
        JT_ = _jt_stacks(J_, m, q_[0:1])
        return _sum_terms([JT_[c] * vfull[c] for c in range(m)
                           if JT_[c] is not None])

    w, xq, yq, zq = quat[0:1], quat[1:2], quat[2:3], quat[3:4]
    ox, oy, oz = vb[0:1], vb[1:2], vb[2:3]
    dquat = 0.5 * jnp.concatenate([
        -xq * ox - yq * oy - zq * oz,
        w * ox + yq * oz - zq * oy,
        w * oy + zq * ox - xq * oz,
        w * oz + xq * oy - yq * ox,
    ])
    _, bias = jax.jvp(vel, (quat, q), (dquat, qd))    # (3k, B)

    alpha, beta = baumgarte
    a_star = None                                     # (3k, B) or None
    if alpha != 0.0:
        Jv = _sum_terms([JT[c] * vfull[c] for c in range(m)
                         if JT[c] is not None])
        a_star = -2.0 * alpha * Jv
    # anchors=None pins each point to its CURRENT position (pure
    # velocity-level constraint): the position drift is identically zero,
    # so the β term only exists for explicit anchors — same semantics as
    # ..contact.fb_constrained_forward_dynamics
    if beta != 0.0 and anchors is not None:
        drifts = []
        for ci in range(k):
            x_w = pos + _mv3s(R, xs[ci])                       # world foot
            drifts.extend(x_w[d:d + 1] - float(anchors[ci][d])
                          for d in range(3))
        a_star = _sum_terms([a_star,
                             -beta * beta * jnp.concatenate(drifts)])

    # Delassus rows as (3k, B) broadcast-accumulates over the live J entries
    G_rows = [
        _sum_terms([J[r][c] * MiJt[c] for c in range(m)
                    if J[r][c] is not None])
        for r in range(3 * k)]
    Jyf = _sum_terms([JT[c] * y_free[c] for c in range(m)
                      if JT[c] is not None])
    rhs_arr = -(Jyf + bias - (0.0 if a_star is None else a_star))
    G = [[G_rows[r][s:s + 1] for s in range(3 * k)] for r in range(3 * k)]
    # active-region factor + wide single-rhs solve: ~(3k)²/2 wide
    # instructions instead of (3k)³/6 scalar entry ops
    Lg = _chol_factor_act(G, 3 * k, reg=reg)
    lam_out = _chol_solve_act(Lg, rhs_arr[:, None])[:, 0]
    y = [y_free[c] + jnp.sum(MiJt[c] * lam_out, axis=0, keepdims=True)
         for c in range(m)]
    dvb = jnp.concatenate(y[:6])
    qdd = jnp.concatenate(y[6:])
    return dvb, qdd, lam_out


def _step_ground_body(km, I_base, quat, pos, q, vb, qd, tau, mu,
                      tables=None, push=None, *, links, offsets, dt,
                      ground_z, gravity, iters, erp, margin, restitution,
                      terrain_static=None, collision_static=None,
                      mu_coll=0.8, ground_static=None, mu_grd=0.8,
                      loop_static=None, softness=None):
    """One frictional ground step on a lane tile. Mirrors
    :func:`..contact.fb_step_ground_batched`: free velocity step, gap-gated
    PGS cone solve on the Delassus operator, semi-implicit manifold
    integration. Returns (quat2, pos2, q2, vb2, qd2, imp (3k,B)).

    Heightfield mode (``terrain_static`` dict + ``tables`` (4, HWp)): the
    per-foot bilinear lookup rides the MXU — ONE one-hot mask per foot
    (iota == flat cell index, (HWp, B)) against four statically-ROLLED
    copies of the flattened height grid (rows [h00, h10, h01, h11] =
    flat[idx], flat[idx+W], flat[idx+1], flat[idx+W+1]) gives all four
    bilinear corners in a single (4, HWp) @ (HWp, B) matmul. Contact rows
    are then rotated into the local [t1, t2, n] frame and the gap
    measured along n — numerics mirror ``ops/terrain.py`` term by term."""
    n = km.topology.n
    m = 6 + n
    k = len(links)
    X, R, f_b, c_j, M = _stance_prelude(km, I_base, quat, q, vb, qd, tau,
                                        gravity)
    Lm = _chol_factor_ev(M, m)
    # push: optional (6, B) external base wrench (RL perturbation forces)
    rhs_free = ([(-f_b[c:c + 1] if push is None
                  else push[c:c + 1] - f_b[c:c + 1]) for c in range(6)]
                + [tau[i:i + 1] - c_j[i:i + 1] for i in range(n)])
    v = _vfull_list(km, vb, qd)

    J, xs = _ff_contact_rows_s(km, X, R, links, offsets)
    # world foot heights → activation masks (k × (1,B)); heightfield mode
    # also rotates each foot's 3 world rows into its local contact frame
    active = []
    gaps = []
    for ci in range(k):
        p_w = [pos[d:d + 1]
               + sum(R[d, j:j + 1, :] * xs[ci][j:j + 1] for j in range(3))
               for d in range(3)]
        if terrain_static is None:
            gap = p_w[2] - ground_z
        else:
            h, (nx, ny, nz), C = _terrain_surface_s(
                terrain_static, tables, p_w[0], p_w[1], q.dtype)
            old = [J[3 * ci + w] for w in range(3)]
            for r in range(3):
                row = []
                for c in range(m):
                    terms = [C[r][w] * old[w][c] for w in range(3)
                             if old[w][c] is not None]
                    row.append(_sum_terms(terms) if terms else None)
                J[3 * ci + r] = row
            gap = (p_w[2] - h) * nz
        gaps.append(gap)
        active.append((gap < margin).astype(q.dtype))
    if collision_static is not None:
        # collision cone triplets appended after the feet (same order as
        # ..contact.fb_step_ground_batched): rebind k to the total contact
        # count — everything below (Delassus, b, v_star, PGS, impulses)
        # treats collision rows exactly like foot rows
        c_rows, c_gaps = _collision_rows_s(km, X, R, pos, collision_static)
        J = J + c_rows
        for g_ in c_gaps:
            gaps.append(g_)
            active.append((g_ < margin).astype(q.dtype))
        # mu for the collision rows: the static coefficient, derived from
        # a real input slice (Mosaic miscompiles purely constant chains)
        if len(c_gaps):
            mu = jnp.concatenate(
                [mu] + [mu[0:1] * 0.0 + mu_coll] * len(c_gaps))
        k = k + len(c_gaps)
    if ground_static is not None:
        # geom-vs-ground cone triplets after the collision block (same
        # order as ..contact.fb_step_ground_batched)
        g_rows, g_gaps = _ground_geom_rows_s(
            km, X, R, pos, ground_static, ground_z=ground_z,
            terrain_static=terrain_static, tables=tables, dtype=q.dtype)
        J = J + g_rows
        for g_ in g_gaps:
            gaps.append(g_)
            active.append((g_ < margin).astype(q.dtype))
        if len(g_gaps):
            mu = jnp.concatenate(
                [mu] + [mu[0:1] * 0.0 + mu_grd] * len(g_gaps))
        k = k + len(g_gaps)
    n_eq = 0
    if loop_static is not None:
        # loop-closure cuts: bilateral rows after the cone triplets (the
        # fused path has no limit rows, so they follow the feet/collision
        # blocks directly — same order as ..contact.fb_step_ground_batched
        # without impulse limits)
        l_rows, l_gaps = _loop_rows_s(km, X, R, pos, loop_static)
        J = J + l_rows
        n_eq = len(l_rows)
    rows_t = 3 * k + n_eq
    JT = _jt_stacks(J, m, q[0:1])          # per-column (rows_t, B) stacks

    # ONE merged multi-rhs solve: rows 0..rows_t-1 = M⁻¹Jᵀ, last = M⁻¹ rhs
    zero_rows = jnp.zeros((rows_t,) + q.shape[1:], q.dtype)
    sol = _chol_apply_e(Lm, [
        jnp.concatenate([JT[c] if JT[c] is not None else zero_rows,
                         rhs_free[c]])
        for c in range(m)])
    MiJt = [sol[c][:rows_t] for c in range(m)]
    v_free = [v[c] + dt * sol[c][rows_t:rows_t + 1] for c in range(m)]

    G_rows = [
        _sum_terms([J[r][c] * MiJt[c] for c in range(m)
                    if J[r][c] is not None])
        for r in range(rows_t)]
    if softness is None:
        eye_reg = 1e-9
    else:
        # compliant contact: per-row Delassus compliance baked as
        # literals (scalar or per-contact over ALL cone triplets — feet,
        # collision, ground-geom; see ..contact.soft_contact_params)
        s_rows = np.broadcast_to(np.asarray(softness, np.float64), (k,))
        eye_reg = ([1e-9 + float(s_rows[i // 3]) for i in range(3 * k)]
                   + [1e-9] * n_eq)
    Jv = _sum_terms([JT[c] * v[c] for c in range(m) if JT[c] is not None])
    b = _sum_terms([JT[c] * v_free[c] for c in range(m)
                    if JT[c] is not None])
    brows = [b[r:r + 1] for r in range(rows_t)]
    for ci in range(k):
        vn_now = Jv[3 * ci + 2:3 * ci + 3]
        v_star = (-erp * jnp.minimum(gaps[ci], 0.0) / dt
                  - restitution * jnp.minimum(vn_now, 0.0))
        brows[3 * ci + 2] = brows[3 * ci + 2] - v_star
    for j in range(n_eq):                      # erp gap recovery (loops)
        brows[3 * k + j] = brows[3 * k + j] + erp * l_gaps[j] / dt
    b = jnp.concatenate(brows)

    p_imp_arr = _pgs_rows(G_rows, b, mu, active, k, iters, eye_reg,
                          eq=n_eq)

    v_new = [
        v_free[c] + jnp.sum(MiJt[c] * p_imp_arr, axis=0, keepdims=True)
        for c in range(m)]
    p_imp = [p_imp_arr[r:r + 1] for r in range(3 * k)]
    vb2 = jnp.concatenate(v_new[:6])
    qd2 = jnp.concatenate(v_new[6:])
    quat2 = _quat_mul_s(quat, _quat_exp_s(vb2[:3] * dt))
    quat2 = quat2 / jnp.sqrt(jnp.sum(quat2 * quat2, axis=0, keepdims=True))
    R2 = _quat_rot_s(quat2)
    pos2 = pos + dt * _mv3s(R2, vb2[3:])
    q2 = q + dt * qd2
    imp = jnp.concatenate(p_imp)
    return quat2, pos2, q2, vb2, qd2, imp


def _pgs_rows(G_rows, b, mu, active, k, iters, reg, eq: int = 0):
    """Projected Gauss-Seidel on row stacks: G_rows list of 3k+eq
    (3k+eq,B) arrays (WITHOUT the ridge — ``reg`` is applied
    algebraically: (G+reg·I)p = Gp + reg·p), b (3k+eq,B), mu (k,B),
    active list of k (1,B) → impulses (3k+eq,B). Carry = ONE array; each
    residual is a full-register multiply + sublane reduction instead of
    3k scalar-lane FMAs. ``eq`` trailing BILATERAL rows (loop-closure
    cuts: sign-free impulses, plain unprojected Gauss-Seidel) follow the
    cone blocks. ``reg``: a scalar ridge, or a per-row sequence
    (rows_t,) — soft contact bakes per-row Delassus compliance here
    (:func:`..contact.soft_contact_params`). Numerics mirror
    :func:`..contact.pgs_solve_bl` (``eq_rows=``) exactly."""
    rows_t = 3 * k + eq
    regs = (list(reg) if isinstance(reg, (list, tuple, np.ndarray))
            else [reg] * rows_t)
    diag = [jnp.clip(G_rows[d][d:d + 1] + regs[d], 1e-9, None)
            for d in range(rows_t)]

    def sweep(_, p):
        for i in range(k):
            s = 3 * i
            cand = []
            for d in range(3):
                r = (jnp.sum(G_rows[s + d] * p, axis=0, keepdims=True)
                     + regs[s + d] * p[s + d:s + d + 1]
                     + b[s + d:s + d + 1])
                cand.append(p[s + d:s + d + 1] - r / diag[s + d])
            pn = jnp.maximum(cand[2], 0.0) * active[i]
            norm_t = jnp.sqrt(cand[0] ** 2 + cand[1] ** 2 + 1e-30)
            scale = jnp.minimum(1.0, mu[i:i + 1] * pn / norm_t)
            # skip empty edge slices: Mosaic rejects zero-size vectors
            parts = ([p[:s]] if s > 0 else [])
            parts += [cand[0] * scale, cand[1] * scale, pn]
            if s + 3 < rows_t:
                parts.append(p[s + 3:])
            p = jnp.concatenate(parts)
        for j in range(eq):
            s = 3 * k + j
            r = (jnp.sum(G_rows[s] * p, axis=0, keepdims=True)
                 + regs[s] * p[s:s + 1] + b[s:s + 1])
            parts = [p[:s], p[s:s + 1] - r / diag[s]]
            if s + 1 < rows_t:
                parts.append(p[s + 1:])
            p = jnp.concatenate(parts)
        return p

    return jax.lax.fori_loop(0, iters, sweep, jnp.zeros_like(b))


# --------------------------------------------------------------------------
# dispatcher: lane-tile pallas_call over (…, B) free-flyer states
# --------------------------------------------------------------------------
def ff_workset_ok(n: int, k: int, extra_ws: float = 0.0) -> bool:
    """Whether the stance/step working set fits a 128-state lane tile.
    Model (floats/state): X+IC+FK+v/a/f ≈ 102n, mass+chol ≈ 1.5(6+n)²,
    contact rows (×2 for the jvp'd copy) ≈ 2·3k(6+n)+24n, Delassus/PGS ≈
    (3k)(6+n)+2(3k)²; calibrated by the same Mosaic stack factor as the
    fixed-base kernels (:data:`..staged._CAL`). ``extra_ws``: additional
    per-state floats a body variant needs (e.g. the terrain kernel's
    (HWp, B) one-hot gather mask — HWp floats per state)."""
    m = 6 + n
    ws = (102.0 * n + 1.5 * m * m + 2 * (3 * k * m) + 24.0 * n
          + 3 * k * m + 2 * (3 * k) ** 2 + 200.0 + extra_ws)
    return ws * _CAL <= _LANE_BUDGET


def _ff_model_args(ffm, dtype):
    """Arm constants + base inertia, pre-batchified to the 128-lane tile
    (real tiled inputs — Mosaic miscompiles purely constant-derived chains,
    see :mod:`.fused`)."""
    args = []
    for fname in _MODEL_FIELDS:
        arr = getattr(ffm.arm, fname)
        if fname in ("damping", "armature"):
            args.append(jnp.asarray(arr, dtype)[:, None])
        else:
            args.append(jnp.broadcast_to(
                jnp.asarray(arr, dtype)[..., None],
                arr.shape + (_LANES,)))
    args.append(jnp.broadcast_to(
        jnp.asarray(ffm.I_base, dtype)[..., None], (6, 6, _LANES)))
    return args


def _ff_ns(ffm, vals):
    """Duck-typed arm namespace over the (VMEM-resident or plain-XLA)
    pre-batchified constant arrays; returns (arm_namespace, I_base)."""
    arm = ffm.arm
    km = SimpleNamespace(
        n=arm.n, topology=arm.topology, joint_types=arm.joint_types,
        prismatic=None, accurate_trig=getattr(arm, "accurate_trig", False),
        **dict(zip(_MODEL_FIELDS, vals)))
    return km, vals[len(_MODEL_FIELDS)]


def _pallas_ff_call(ffm, body, states, out_dims, interpret=False,
                    consts=()):
    """Run ``body(km, I_base, *state_tiles, *consts) -> tuple of (d, B)``
    over 128-state lane tiles. states: (d_i, B) batch-last arrays;
    consts: extra VMEM-resident arrays shared by every tile (e.g. the
    terrain kernel's rolled height tables)."""
    dtype = states[0].dtype
    B = states[0].shape[-1]
    pad = (-B) % _LANES
    if pad:
        states = [jnp.pad(s, ((0, 0),) * (s.ndim - 1) + ((0, pad),))
                  for s in states]
    Bp = B + pad
    grid = (Bp // _LANES,)
    model_args = _ff_model_args(ffm, dtype)
    n_model = len(model_args)
    consts = list(consts)

    def kernel(*refs):
        mrefs = refs[:n_model]
        srefs = refs[n_model:n_model + len(states)]
        crefs = refs[n_model + len(states):
                     n_model + len(states) + len(consts)]
        orefs = refs[n_model + len(states) + len(consts):]
        km, I_base = _ff_ns(ffm, [r[:] for r in mrefs])
        outs = body(km, I_base, *[r[:] for r in srefs],
                    *[r[:] for r in crefs])
        for o_ref, o in zip(orefs, outs):
            o_ref[:] = o

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_model
        + [pl.BlockSpec(s.shape[:-1] + (_LANES,),
                        (lambda i, nd=s.ndim: (0,) * (nd - 1) + (i,)),
                        memory_space=pltpu.VMEM) for s in states]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(consts)
    )
    out_specs = [
        pl.BlockSpec((d, _LANES), (lambda i: (0, i)),
                     memory_space=pltpu.VMEM)
        for d in out_dims
    ]
    out_shape = [jax.ShapeDtypeStruct((d, Bp), dtype) for d in out_dims]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*model_args, *states, *consts)
    if pad:
        outs = [o[..., :B] for o in outs]
    return list(outs)


def _xla_fallback(ffm, body, states, consts=()):
    """Robots whose working set exceeds the lane tile run the identical
    (1,B)-entry body as plain XLA on the full batch."""
    dtype = states[0].dtype
    B_sh = states[0].shape[-1:]
    refs = []
    for fname in _MODEL_FIELDS:
        arr = jnp.asarray(getattr(ffm.arm, fname), dtype)
        if fname in ("damping", "armature"):
            refs.append(arr[:, None])
        else:
            refs.append(jnp.broadcast_to(arr[..., None], arr.shape + B_sh))
    refs.append(jnp.broadcast_to(
        jnp.asarray(ffm.I_base, dtype)[..., None], (6, 6) + B_sh))
    km, I_base = _ff_ns(ffm, refs)
    return list(body(km, I_base, *states, *consts))


def _run_ff(ffm, body, states, out_dims, interpret, consts=()):
    extra_ws = float(getattr(body, "_extra_ws", 0.0))
    if ff_workset_ok(ffm.n, _body_k(body), extra_ws):
        return _pallas_ff_call(ffm, body, states, out_dims, interpret,
                               consts)
    return _xla_fallback(ffm, body, states, consts)


def _body_k(body):
    return getattr(body, "_k_contacts", 1)


def _fb_fd_body(km, I_base, quat, q, vb, qd, tau, *, gravity):
    """Unconstrained free-flyer FD on a lane tile: bias + mass Cholesky
    solve → (v̇b (6,B), q̈ (n,B)). The front half of the stance kernel."""
    n = km.topology.n
    m = 6 + n
    X = blops.joint_transforms_bl(km, q)
    R = _quat_rot_s(quat)
    f_b, c_j = _fb_bias_s(km, I_base, X, R, vb, qd, gravity)
    M = _fb_mass_s(km, I_base, X)
    Lm = _chol_factor_ev(M, m)
    rhs = ([-f_b[c:c + 1] for c in range(6)]
           + [tau[i:i + 1] - c_j[i:i + 1] for i in range(n)])
    y = _chol_apply_e(Lm, rhs)
    return jnp.concatenate(y[:6]), jnp.concatenate(y[6:])


# --------------------------------------------------------------------------
# public fused entries (batch-last signatures, like ops/kernels/fused.py)
# --------------------------------------------------------------------------
def fb_fd_fused(ffm, quat, q, vb, qd, tau, gravity=-9.81, interpret=False):
    """Fused unconstrained free-flyer FD: batch-last quat (4,B), q (n,B),
    vb (6,B), qd (n,B), tau (n,B) → (v̇b (6,B), q̈ (n,B)). The batched/TPU
    counterpart of :func:`..freeflyer.fb_forward_dynamics`."""
    n = ffm.n

    def body(km, I_base, quat, q, vb, qd, tau):
        return _fb_fd_body(km, I_base, quat, q, vb, qd, tau,
                           gravity=float(gravity))

    body._k_contacts = 0
    return tuple(_run_ff(ffm, body, [quat, q, vb, qd, tau], [6, n],
                         interpret))


def _fb_aba_body(km, I_base, quat, q, vb, qd, tau, *, gravity):
    """Floating-base ABA on a lane tile (``ops/aba.py::fb_aba`` in
    batch-last form): (v̇b (6,B), q̈ (n,B)) without assembling the (6+n)²
    mass matrix — the base closes with one 6×6 Cholesky."""
    topo = km.topology
    n = topo.n
    X = blops.joint_transforms_bl(km, q)
    R = _quat_rot_s(quat)
    g = float(gravity)
    a0_lin = jnp.concatenate([-g * R[2, i:i + 1, :] for i in range(3)])

    v = [None] * n
    zeta = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Sqd = km.S[i] * qd[i:i + 1]
        v[i] = blops.matvec6(X[i], vb if p < 0 else v[p]) + Sqd
        zeta[i] = blops.crm_apply_bl(v[i], Sqd)
    IA = [km.inertia[i] for i in range(n)]
    pA = [blops.crf_apply_bl(v[i], blops.matvec6(km.inertia[i], v[i]))
          for i in range(n)]
    IA_b = I_base
    pA_b = blops.crf_apply_bl(vb, blops.matvec6(I_base, vb))

    U = [None] * n
    Dinv = [None] * n
    ubar = [None] * n
    for i in range(n - 1, -1, -1):
        S = km.S[i]
        Ui = sum(IA[i][:, c] * S[c:c + 1] for c in range(6))
        # + armature: reflected rotor inertia in the joint-space D term
        # (ships (n, 1) like damping; a (1,1) slice broadcasts against (1,B))
        Di = 1.0 / (sum(S[c:c + 1] * Ui[c:c + 1] for c in range(6))
                    + km.armature[i:i + 1, 0:1])
        SpA = sum(S[c:c + 1] * pA[i][c:c + 1] for c in range(6))
        ui = tau[i:i + 1] - km.damping[i:i + 1, 0:1] * qd[i:i + 1] - SpA
        U[i], Dinv[i], ubar[i] = Ui, Di, ui
        UDi = Ui * Di
        Ia = IA[i] - UDi[:, None] * Ui[None]
        pa = pA[i] + blops.matvec6(Ia, zeta[i]) + UDi * ui
        IaX = sum(Ia[:, c][:, None] * X[i][c][None] for c in range(6))
        XIaX = sum(X[i][c][:, None] * IaX[c][None] for c in range(6))
        p = topo.parents[i]
        if p >= 0:
            IA[p] = IA[p] + XIaX
            pA[p] = pA[p] + blops.matvec6_T(X[i], pa)
        else:
            IA_b = IA_b + XIaX
            pA_b = pA_b + blops.matvec6_T(X[i], pa)

    # base: ā_b = −(Iᴬ_b)⁻¹ pᴬ_b, 6×6 SPD entry-view Cholesky
    E = [[IA_b[r, c:c + 1, :] for c in range(6)] for r in range(6)]
    L = _chol_factor_ev(E, 6)
    ab = jnp.concatenate(
        _chol_apply_e(L, [-pA_b[c:c + 1] for c in range(6)]))

    a = [None] * n
    qdd = [None] * n
    for i in range(n):
        p = topo.parents[i]
        a_prime = blops.matvec6(X[i], ab if p < 0 else a[p]) + zeta[i]
        Ua = sum(U[i][c:c + 1] * a_prime[c:c + 1] for c in range(6))
        qdd[i] = Dinv[i] * (ubar[i] - Ua)
        a[i] = a_prime + km.S[i] * qdd[i]
    # v̇b = ā_b − a₀ with a₀ = [0₃; a0_lin]
    dvb = jnp.concatenate([ab[:3], ab[3:] - a0_lin])
    return dvb, jnp.concatenate(qdd)


def fb_aba_fused(ffm, quat, q, vb, qd, tau, gravity=-9.81, interpret=False):
    """Fused floating-base ABA FD — same signature/outputs as
    :func:`fb_fd_fused`, O(n) per state. A/B'd on hardware
    (``benchmarks/bench_aba.py --freeflyer``); the linear working set
    (≈110n floats/state) keeps humanoid-scale robots on the lane tile."""
    n = ffm.n

    def body(km, I_base, quat, q, vb, qd, tau):
        return _fb_aba_body(km, I_base, quat, q, vb, qd, tau,
                            gravity=float(gravity))

    body._k_contacts = 0
    if (110.0 * n + 300.0) * _CAL <= _LANE_BUDGET:
        return tuple(_pallas_ff_call(ffm, body, [quat, q, vb, qd, tau],
                                     [6, n], interpret))
    return tuple(_xla_fallback(ffm, body, [quat, q, vb, qd, tau]))


def stance_fd_fused(ffm, quat, pos, q, vb, qd, tau, links, offsets,
                    anchors=None, gravity=-9.81, baumgarte=(0.0, 0.0),
                    reg=0.0, interpret=False):
    """Fused floating-base stance FD: batch-last states quat (4,B), pos
    (3,B), q (n,B), vb (6,B), qd (n,B), tau (n,B) → (v̇b (6,B), q̈ (n,B),
    λ (3k,B)). One kernel per 128-state lane tile; numerics mirror
    :func:`..contact.fb_constrained_fd_batched`."""
    links = tuple(int(l) for l in links)
    off = np.asarray(offsets, np.float64)
    anch = None if anchors is None else np.asarray(anchors, np.float64)
    n = ffm.n
    k = len(links)

    def body(km, I_base, quat, pos, q, vb, qd, tau):
        return _stance_body(km, I_base, quat, pos, q, vb, qd, tau,
                            links=links, offsets=off, anchors=anch,
                            gravity=float(gravity),
                            baumgarte=(float(baumgarte[0]),
                                       float(baumgarte[1])),
                            reg=float(reg))

    body._k_contacts = k
    dvb, qdd, lam = _run_ff(ffm, body, [quat, pos, q, vb, qd, tau],
                            [6, n, 3 * k], interpret)
    return dvb, qdd, lam


def step_ground_fused(ffm, quat, pos, q, vb, qd, tau, mu, dt, links, offsets,
                      ground_z=0.0, gravity=-9.81, iters: int = 30,
                      erp: float = 0.2, margin: float = 1e-3,
                      restitution: float = 0.0, collision=None,
                      mu_collision=None, ground_geoms=None, mu_ground=None,
                      loops=None, push=None, softness=None,
                      interpret=False):
    """Fused frictional ground step — the parallel-RL flagship op as ONE
    kernel per lane tile: batch-last states + mu (k,B) → next state
    (quat2 (4,B), pos2 (3,B), q2 (n,B), vb2 (6,B), qd2 (n,B)) and impulses
    (3k,B). Numerics mirror :func:`..contact.fb_step_ground_batched`.

    ``collision``: optional :class:`...collision.CollisionModel` — its
    candidate pairs become extra cone triplets in the same VMEM-resident
    PGS solve (obstacle-rich RL stays on the kernel path). The geometry
    is baked as trace-time literals (like ``offsets``); ``mu_collision``
    must be a static python scalar (defaults to 0.8).

    ``loops``: optional ``(pairs, offsets_a, offsets_b)`` loop-closure
    cuts (closed-chain linkage legs) — bilateral rows in the same
    VMEM-resident PGS solve (:func:`_loop_rows_s`); the cut geometry is
    baked as trace-time literals.

    ``ground_geoms``/``mu_ground``: optional :class:`...collision.Geoms`
    — geom-vs-ground cone triplets (capsule feet, fallen-torso contact;
    :func:`_ground_geom_rows_s`) after the collision block, endpoint
    geometry baked as literals."""
    links = tuple(int(l) for l in links)
    off = np.asarray(offsets, np.float64)
    n = ffm.n
    k = len(links)
    cs = None
    kt = k
    mu_c = 0.8 if mu_collision is None else float(mu_collision)
    if collision is not None and collision.n_contacts:
        from ..collision import _check_geoms
        _check_geoms(n, collision)
        cs = collision_static(collision)
        kt = k + collision.n_contacts
    gs = None
    mu_g = 0.8 if mu_ground is None else float(mu_ground)
    if ground_geoms is not None:
        gs = ground_geoms_static(ground_geoms)
        kt = kt + len(gs)
    ls = None if loops is None else loops_static(n, loops)

    def body(km, I_base, quat, pos, q, vb, qd, tau, mu, *rest):
        return _step_ground_body(km, I_base, quat, pos, q, vb, qd, tau, mu,
                                 None, *rest,
                                 links=links, offsets=off, dt=float(dt),
                                 ground_z=float(ground_z),
                                 gravity=float(gravity), iters=int(iters),
                                 erp=float(erp), margin=float(margin),
                                 restitution=float(restitution),
                                 collision_static=cs, mu_coll=mu_c,
                                 ground_static=gs, mu_grd=mu_g,
                                 loop_static=ls, softness=softness)

    body._k_contacts = kt + (0 if ls is None else len(ls["pairs"]))
    states = [quat, pos, q, vb, qd, tau, mu]
    if push is not None:
        states.append(push)
    return _run_ff(ffm, body, states, [4, 3, n, 6, n, 3 * kt], interpret)


def terrain_fused_ok(ffm, terrain, k: int) -> bool:
    """Whether the heightfield step fits the lane tile: the plane-step
    working set plus one (HWp, B) one-hot mask per state."""
    H, W = terrain.heights.shape
    HWp = -(-(H * W) // _LANES) * _LANES
    return ff_workset_ok(ffm.n, k, extra_ws=float(HWp))


def step_ground_terrain_fused(ffm, quat, pos, q, vb, qd, tau, mu, dt,
                              links, offsets, terrain, gravity=-9.81,
                              iters: int = 30, erp: float = 0.2,
                              margin: float = 1e-3,
                              restitution: float = 0.0, collision=None,
                              mu_collision=None, ground_geoms=None,
                              mu_ground=None, loops=None, push=None,
                              softness=None, interpret=False):
    """Fused frictional ground step on a bilinear HEIGHTFIELD — one kernel
    per lane tile, the uneven-terrain parallel-RL shape. Same contract as
    :func:`step_ground_fused` plus ``terrain`` (:class:`...terrain.
    Terrain`); the node-height table enters as a kernel input (4 rolled
    copies of the flattened grid), so the heights may be traced values.
    Grids too large for VMEM (see :func:`terrain_fused_ok`) run the
    identical body as plain XLA."""
    links = tuple(int(l) for l in links)
    off = np.asarray(offsets, np.float64)
    n = ffm.n
    k = len(links)
    cs = None
    kt = k
    mu_c = 0.8 if mu_collision is None else float(mu_collision)
    if collision is not None and collision.n_contacts:
        from ..collision import _check_geoms
        _check_geoms(n, collision)
        cs = collision_static(collision)
        kt = k + collision.n_contacts
    gs = None
    mu_g = 0.8 if mu_ground is None else float(mu_ground)
    if ground_geoms is not None:
        gs = ground_geoms_static(ground_geoms)
        kt = kt + len(gs)
    ls = None if loops is None else loops_static(n, loops)
    dtype = q.dtype
    H, W = terrain.heights.shape
    HW = H * W
    HWp = -(-HW // _LANES) * _LANES
    flat = jnp.pad(jnp.asarray(terrain.heights, dtype).reshape(-1),
                   (0, HWp - HW))
    # rolled corner tables: rows [idx, idx+W, idx+1, idx+W+1]; clipped
    # cell indices guarantee idx+W+1 <= HW-1, so the zero tail is never
    # selected
    tables = jnp.stack([
        flat,
        jnp.pad(flat[W:], (0, W)),
        jnp.pad(flat[1:], (0, 1)),
        jnp.pad(flat[W + 1:], (0, W + 1)),
    ])
    ts = dict(W=W, H=H, cell=float(terrain.cell),
              x0=float(terrain.origin[0]), y0=float(terrain.origin[1]))

    def body(km, I_base, quat, pos, q, vb, qd, tau, mu, *rest):
        push_t, tables = (rest if len(rest) == 2 else (None, rest[0]))
        return _step_ground_body(km, I_base, quat, pos, q, vb, qd, tau, mu,
                                 tables, push_t, links=links, offsets=off,
                                 dt=float(dt), ground_z=0.0,
                                 gravity=float(gravity), iters=int(iters),
                                 erp=float(erp), margin=float(margin),
                                 restitution=float(restitution),
                                 terrain_static=ts, collision_static=cs,
                                 mu_coll=mu_c, ground_static=gs,
                                 mu_grd=mu_g, loop_static=ls,
                                 softness=softness)

    body._k_contacts = kt + (0 if ls is None else len(ls["pairs"]))
    body._extra_ws = float(HWp)
    states = [quat, pos, q, vb, qd, tau, mu]
    if push is not None:
        states.append(push)
    return _run_ff(ffm, body, states, [4, 3, n, 6, n, 3 * kt], interpret,
                   consts=[tables])
