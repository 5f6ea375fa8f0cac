"""Forward dynamics — Featherstone's articulated-body algorithm (ABA).

A third, O(n) formulation of q̈ = FD(q, q̇, u), complementing the engine's
M⁻¹-composition path (``ops/fd.py``, the reference's design:
``/root/reference/algorithms/_forward_dynamics.py:72-112`` composes
``minv_inner`` + ``id_inner`` + a symmetric-upper matmul) and the dense
CRBA+Cholesky staged path (``ops/kernels/staged.py``). The reference never
emits ABA — its FD always materializes M⁻¹ because downstream ∇FD needs it
(``_forward_dynamics_gradient.py:47-57``) — but for the *plain* FD query
M⁻¹ is wasted work: the M⁻¹ recursion propagates (6, n) force-matrix blocks
F per joint (``_direct_minv.py:133-164``), O(n²) state, while ABA carries
only a 6×6 articulated inertia and a 6-vector bias per joint.

Same conventions as the rest of the engine: gravity as the fictitious base
acceleration [0,…,0,−g] (``_test.py:13-14``), viscous damping folded into
the bias torque (golden-model semantics, ``_test.py:103-105``), trace-time
unrolling over the kinematic tree.

Three passes:
  1. forward:  v_i = X_i v_p + S_i q̇_i;  ζ_i = v_i × S_i q̇_i (local bias
     acceleration);  pA_i = v_i ×* I_i v_i (bias force).
  2. backward (leaves→root): U = Iᴬ S, D = Sᵀ U, ū = τ − d·q̇ − Sᵀ pᴬ;
     Iᵃ = Iᴬ − U D⁻¹ Uᵀ,  pᵃ = pᴬ + Iᵃ ζ + U D⁻¹ ū;
     Iᴬ_p += X_iᵀ Iᵃ X_i,  pᴬ_p += X_iᵀ pᵃ.
  3. forward:  a′ = X_i a_p + ζ_i;  q̈_i = D⁻¹ (ū_i − Uᵀ a′);
     a_i = a′ + S_i q̈_i.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.robot import RobotModel
from .rnea import gravity_accel
from .spatial import crm_apply, crf_apply, xform_apply, xform_T_apply


def aba(model: RobotModel, q, qd, u, gravity=-9.81, f_ext=None):
    """Single-state ABA: q/q̇/u (n,) → q̈ (n,). Bitwise-independent of the
    M⁻¹ path (different recursion), so it doubles as an in-family
    cross-check of ``ops/fd.py::forward_dynamics``. ``f_ext``: optional
    (n, 6) link-local external wrenches, entering the bias force
    pᴬ_i = v ×* Iv − f_ext_i (Featherstone's standard fext slot)."""
    topo = model.topology
    n = topo.n
    X = model.joint_transforms(q)

    # pass 1 — velocities, bias accelerations, bias forces
    v = [None] * n
    zeta = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Sqd = model.S[i] * qd[i]
        v[i] = Sqd if p < 0 else xform_apply(X[i], v[p]) + Sqd
        zeta[i] = crm_apply(v[i], Sqd)
    IA = [model.inertia[i] for i in range(n)]
    pA = [crf_apply(v[i], model.inertia[i] @ v[i]) for i in range(n)]
    if f_ext is not None:
        pA = [pA[i] - f_ext[i] for i in range(n)]

    # pass 2 — articulated inertias up the tree
    U = [None] * n
    Dinv = [None] * n
    ubar = [None] * n
    for i in range(n - 1, -1, -1):
        S = model.S[i]
        Ui = IA[i] @ S
        # D = SᵀU + armature (reflected rotor inertia — joint-space only)
        Di = 1.0 / (jnp.dot(S, Ui) + model.armature[i])
        ui = u[i] - model.damping[i] * qd[i] - jnp.dot(S, pA[i])
        U[i], Dinv[i], ubar[i] = Ui, Di, ui
        p = topo.parents[i]
        if p >= 0:
            Ia = IA[i] - Di * jnp.outer(Ui, Ui)
            pa = pA[i] + Ia @ zeta[i] + Ui * (Di * ui)
            IA[p] = IA[p] + X[i].T @ Ia @ X[i]
            pA[p] = pA[p] + xform_T_apply(X[i], pa)

    # pass 3 — accelerations down the tree
    a_base = gravity_accel(gravity, X.dtype)
    a = [None] * n
    qdd = [None] * n
    for i in range(n):
        p = topo.parents[i]
        a_prime = xform_apply(X[i], a_base if p < 0 else a[p]) + zeta[i]
        qdd[i] = Dinv[i] * (ubar[i] - jnp.dot(U[i], a_prime))
        a[i] = a_prime + model.S[i] * qdd[i]
    return jnp.stack(qdd)


# --------------------------------------------------------------- free-flyer
def fb_aba(ffm, quat, q, vb, qd, tau, gravity=-9.81, f_ext=None,
           f_base=None):
    """Floating-base ABA: returns (v̇b (6,), q̈ (n,)), exactly
    :func:`..freeflyer.fb_forward_dynamics` without ever assembling the
    (6+n)² mass matrix — the articulated recursion runs in the engine's
    gravity-offset coordinates (every acceleration carries the fictitious
    base field a₀ = [0₃; −g_b], the same convention as ``fb_bias``), so the
    base closes with one 6×6 solve ā_b = −(Iᴬ_b)⁻¹ pᴬ_b and the returned
    twist derivative is ā_b − a₀."""
    from .freeflyer import quat_to_rot, _gravity_world

    arm = ffm.arm
    topo = arm.topology
    n = topo.n
    X = arm.joint_transforms(q)
    dtype = X.dtype
    g_b = quat_to_rot(quat).T @ _gravity_world(gravity, dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -g_b])

    v = [None] * n
    zeta = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Sqd = arm.S[i] * qd[i]
        v[i] = (xform_apply(X[i], vb if p < 0 else v[p])) + Sqd
        zeta[i] = crm_apply(v[i], Sqd)
    IA = [arm.inertia[i] for i in range(n)]
    pA = [crf_apply(v[i], arm.inertia[i] @ v[i]) for i in range(n)]
    if f_ext is not None:
        pA = [pA[i] - f_ext[i] for i in range(n)]
    IA_b = ffm.I_base
    pA_b = crf_apply(vb, ffm.I_base @ vb)
    if f_base is not None:
        pA_b = pA_b - f_base

    U = [None] * n
    Dinv = [None] * n
    ubar = [None] * n
    for i in range(n - 1, -1, -1):
        S = arm.S[i]
        Ui = IA[i] @ S
        Di = 1.0 / (jnp.dot(S, Ui) + arm.armature[i])
        ui = tau[i] - arm.damping[i] * qd[i] - jnp.dot(S, pA[i])
        U[i], Dinv[i], ubar[i] = Ui, Di, ui
        Ia = IA[i] - Di * jnp.outer(Ui, Ui)
        pa = pA[i] + Ia @ zeta[i] + Ui * (Di * ui)
        p = topo.parents[i]
        if p >= 0:
            IA[p] = IA[p] + X[i].T @ Ia @ X[i]
            pA[p] = pA[p] + xform_T_apply(X[i], pa)
        else:
            IA_b = IA_b + X[i].T @ Ia @ X[i]
            pA_b = pA_b + xform_T_apply(X[i], pa)

    ab = -jnp.linalg.solve(IA_b, pA_b)       # offset base acceleration ā_b
    a = [None] * n
    qdd = [None] * n
    for i in range(n):
        p = topo.parents[i]
        a_prime = xform_apply(X[i], ab if p < 0 else a[p]) + zeta[i]
        qdd[i] = Dinv[i] * (ubar[i] - jnp.dot(U[i], a_prime))
        a[i] = a_prime + arm.S[i] * qdd[i]
    return ab - a0, jnp.stack(qdd)


# --------------------------------------------------------------- batch-last
def aba_bl(model: RobotModel, q, qd, u, gravity=-9.81, X=None):
    """Batch-last ABA: q/q̇/u (n, *b) → q̈ (n, *b). Same unrolled-broadcast
    style as :mod:`.blops` (batch on the vector lanes; all contractions are
    explicit ≤6-term sums — lowers under plain XLA and inside Pallas
    kernel bodies)."""
    from .blops import (batchify1, batchify2, crf_apply_bl, crm_apply_bl,
                        joint_transforms_bl, matvec6, matvec6_T,
                        _armature_col, _damping_col)

    topo = model.topology
    n = topo.n
    dtype = q.dtype
    if X is None:
        X = joint_transforms_bl(model, q)
    ones1B = jnp.ones((1,) + q.shape[1:], dtype)
    Sb = [batchify1(model.S[i], ones1B) for i in range(n)]
    bnd = q.ndim - 1
    damp = _damping_col(model, bnd)
    armc = _armature_col(model, bnd)

    v = [None] * n
    zeta = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Sqd = Sb[i] * qd[i:i + 1]
        v[i] = Sqd if p < 0 else matvec6(X[i], v[p]) + Sqd
        zeta[i] = crm_apply_bl(v[i], Sqd)
    IA = [batchify2(model.inertia[i], ones1B) for i in range(n)]
    pA = [crf_apply_bl(v[i], matvec6(IA[i], v[i])) for i in range(n)]

    U = [None] * n
    Dinv = [None] * n
    ubar = [None] * n
    for i in range(n - 1, -1, -1):
        S = Sb[i]
        Ui = sum(IA[i][:, c] * S[c:c + 1] for c in range(6))      # (6,*b)
        d = sum(S[c:c + 1] * Ui[c:c + 1] for c in range(6))       # (1,*b)
        Di = 1.0 / (d + armc[i:i + 1])
        SpA = sum(S[c:c + 1] * pA[i][c:c + 1] for c in range(6))  # (1,*b)
        ui = u[i:i + 1] - damp[i:i + 1] * qd[i:i + 1] - SpA
        U[i], Dinv[i], ubar[i] = Ui, Di, ui
        p = topo.parents[i]
        if p >= 0:
            # Iᵃ = Iᴬ − D⁻¹·U Uᵀ, rank-1 outer as (6,1,*b)·(1,6,*b)
            UDi = Ui * Di
            Ia = IA[i] - UDi[:, None] * Ui[None]
            pa = pA[i] + matvec6(Ia, zeta[i]) + UDi * ui
            # Xᵀ Iᵃ X: two 6×6 batch-last matmuls
            IaX = sum(Ia[:, c][:, None] * X[i][c][None] for c in range(6))
            IA[p] = IA[p] + sum(
                X[i][c][:, None] * IaX[c][None] for c in range(6))
            pA[p] = pA[p] + matvec6_T(X[i], pa)

    minus_g = jnp.asarray(-gravity, dtype)
    a = [None] * n
    qdd = [None] * n
    for i in range(n):
        p = topo.parents[i]
        if p < 0:
            a_prime = X[i][:, 5] * minus_g + zeta[i]
        else:
            a_prime = matvec6(X[i], a[p]) + zeta[i]
        Ua = sum(U[i][c:c + 1] * a_prime[c:c + 1] for c in range(6))
        qdd[i] = Dinv[i] * (ubar[i] - Ua)
        a[i] = a_prime + Sb[i] * qdd[i]
    return jnp.concatenate(qdd, axis=0)
