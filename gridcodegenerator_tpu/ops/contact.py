"""Constrained (contact) forward dynamics — bilateral point constraints.

Beyond the reference's scope (it ships unconstrained dynamics only) but the
natural next layer of a production engine: solve the equality-constrained
equations of motion for a set of points pinned to world anchors (stance feet,
loop-closure grasps, end-effectors in rigid contact),

    M(q) q̈ = u − c(q, q̇) + Jᵀ λ,        J q̈ + J̇q̇ = a*          (KKT)

by elimination through the **Delassus operator** G = J·M⁻¹·Jᵀ:

    λ  = −G⁻¹ (J q̈_free + J̇q̇ − a*),     q̈ = q̈_free + M⁻¹ Jᵀ λ,

where q̈_free is the engine's unconstrained forward dynamics and a* the
Baumgarte stabilization acceleration. This composition is exactly where the
engine's *analytic* M⁻¹ recursion (``ops/minv.py``, reference
``_direct_minv.py``) pays off: M⁻¹ is already a first-class output, so the
Delassus assembly is two dense (3k, n)·(n, n) matmuls — MXU food — with no
extra factorization of M.

Layers (all trace-time specialized to the static contact-link list,
jit-friendly, differentiable):
* fixed-base bilateral pins (single-state; the batched api entry
  ``api.constrained_forward_dynamics`` runs batch-last over the fused
  kernels);
* floating-base stance (:func:`fb_constrained_forward_dynamics` single-state
  + :func:`fb_constrained_fd_batched` batch-last) with MPC linearization;
* unilateral Coulomb ground contact (:func:`fb_step_ground` /
  :func:`fb_step_ground_batched`: PGS cone solver, velocity stepping with
  lift-off/stick/slide — the parallel-RL simulation shape);
* batch-last small linear algebra shared by all of it (unrolled
  lane-parallel Cholesky and matmuls — see BENCHMARKS.md "Contact layer"
  for why batch-first forms are 18–36× slower on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.robot import RobotModel
from .fd import forward_dynamics
from .kinematics import fk, point_bias_acceleration, world_jacobian
from .minv import densify, minv_inner
from .rnea import rnea_bwd, rnea_fwd


def _impl_auto(impl: str, x=None) -> str:
    """'auto' → fused Pallas kernels on TPU, the batch-last XLA path
    elsewhere. One policy for the whole library: delegates to
    ``api._resolve_impl`` (imported lazily — api imports this module only
    inside functions, so there is no cycle at import time)."""
    from ..api import _resolve_impl

    return _resolve_impl(impl, x)


def _check_contacts(n_links_valid, links, offsets):
    """Fail fast on malformed contact geometry (the api._check_states analog
    for the contact layer): non-empty static links within range, offsets
    shaped (k, 3)."""
    links = tuple(links)
    if not links:
        raise ValueError("contact set is empty: pass at least one link")
    for l in links:
        if not (0 <= int(l) < n_links_valid):
            raise ValueError(
                f"contact link index {l} out of range [0, {n_links_valid})")
    shp = jnp.shape(offsets)
    if shp != (len(links), 3):
        raise ValueError(
            f"offsets must be ({len(links)}, 3) body-frame points, got {shp}")


def contact_jacobian(model: RobotModel, q, links, offsets):
    """Stacked world *linear* point Jacobian (3k, n) for k contact points
    (``links``: static tuple of link indices; ``offsets``: (k, 3) body-frame
    attachment points)."""
    _check_contacts(model.n, links, offsets)
    offsets = jnp.asarray(offsets, q.dtype)
    rows = [world_jacobian(model, q, l, offsets[i])[3:]
            for i, l in enumerate(links)]
    return jnp.concatenate(rows, axis=0)


def contact_bias(model: RobotModel, q, qd, links, offsets):
    """Stacked classical bias accelerations J̇q̇ (3k,)."""
    offsets = jnp.asarray(offsets, q.dtype)
    rows = [point_bias_acceleration(model, q, qd, l, offsets[i])[3:]
            for i, l in enumerate(links)]
    return jnp.concatenate(rows, axis=0)


def constrained_forward_dynamics(model: RobotModel, q, qd, u, links, offsets,
                                 anchors=None, gravity=-9.81,
                                 baumgarte=(0.0, 0.0), reg=0.0):
    """Equality-constrained FD: returns ``(q̈ (n,), λ (3k,))``.

    ``λ`` is the world-frame constraint force at each point (stacked), i.e.
    the force the world exerts on the robot; the generalized torques it
    contributes are ``Jᵀ λ`` (verified by the ID round-trip
    ``inverse_dynamics(q̈) == u + Jᵀλ``, tests/test_contact.py).

    ``anchors`` (k, 3) are the world pin positions (default: the points'
    current positions — pure velocity-level constraint). ``baumgarte``
    = (α, β): a* = −2α(Jq̇) − β²(x − anchor) drives position/velocity drift
    to zero during integration. ``reg`` adds a ridge to the Delassus
    operator for redundant contact sets (G singular when constraints are
    linearly dependent)."""
    _check_contacts(model.n, links, offsets)
    k = len(links)
    offsets = jnp.asarray(offsets, q.dtype)
    qdd_free = forward_dynamics(model, q, qd, u, gravity)
    Minv = densify(minv_inner(model, model.joint_transforms(q)))
    J = contact_jacobian(model, q, links, offsets)
    jdqd = contact_bias(model, q, qd, links, offsets)

    alpha, beta = baumgarte
    a_star = jnp.zeros(3 * k, q.dtype)
    if alpha != 0.0:
        a_star = a_star - 2.0 * alpha * (J @ qd)
    if beta != 0.0:
        R, p = fk(model, q)
        x = jnp.concatenate([p[l] + R[l] @ offsets[i]
                             for i, l in enumerate(links)])
        anch = (x if anchors is None
                else jnp.asarray(anchors, q.dtype).reshape(-1))
        a_star = a_star - beta * beta * (x - anch)

    MiJt = Minv @ J.T                                   # (n, 3k)
    G = J @ MiJt + reg * jnp.eye(3 * k, dtype=q.dtype)  # Delassus
    rhs = -(J @ qdd_free + jdqd - a_star)
    L = jnp.linalg.cholesky(G)
    lam = jax.scipy.linalg.cho_solve((L, True), rhs)
    return qdd_free + MiJt @ lam, lam


def constrained_inverse_dynamics(model: RobotModel, q, qd, qdd, lam, links,
                                 offsets, gravity=-9.81):
    """Actuation torques realizing ``q̈`` under the given contact forces:
    ``u = ID(q, q̇, q̈) − Jᵀ λ`` — the consistency counterpart used by the
    round-trip tests and by torque-control stacks."""
    X = model.joint_transforms(q)
    v, a, f = rnea_fwd(model, X, qd, qdd, gravity)
    c, _ = rnea_bwd(model, X, f, qd)
    J = contact_jacobian(model, q, links, offsets)
    return c - J.T @ lam


def project_velocity(model: RobotModel, q, qd, links, offsets, reg=0.0):
    """Project q̇ onto the constraint manifold (J q̇ = 0) minimizing kinetic
    energy of the correction — the impulsive-contact velocity map
    ``q̇⁺ = q̇ − M⁻¹Jᵀ G⁻¹ J q̇`` (also the perfectly-inelastic impact law).
    Use it to make initial conditions consistent before a pinned rollout."""
    Minv = densify(minv_inner(model, model.joint_transforms(q)))
    J = contact_jacobian(model, q, links, offsets)
    G = J @ Minv @ J.T + reg * jnp.eye(J.shape[0], dtype=q.dtype)
    L = jnp.linalg.cholesky(G)
    imp = jax.scipy.linalg.cho_solve((L, True), J @ qd)
    return qd - Minv @ (J.T @ imp)


def constrained_step(model: RobotModel, q, qd, u, dt, links, offsets,
                     anchors=None, gravity=-9.81, baumgarte=(10.0, 10.0),
                     reg=0.0):
    """One semi-implicit Euler step of the pinned system."""
    qdd, lam = constrained_forward_dynamics(
        model, q, qd, u, links, offsets, anchors, gravity, baumgarte, reg)
    qd2 = qd + dt * qdd
    return q + dt * qd2, qd2, lam


def simulate_constrained(model: RobotModel, q0, qd0, taus, dt, links, offsets,
                         anchors=None, gravity=-9.81, baumgarte=(10.0, 10.0),
                         reg=0.0):
    """``lax.scan`` rollout of the pinned system — one device dispatch for a
    whole trajectory (``taus``: (T, n)). Returns ((q_T, q̇_T), per-step
    (q, q̇, λ) stacks)."""
    def step(carry, tau):
        q, qd = carry
        q2, qd2, lam = constrained_step(
            model, q, qd, tau, dt, links, offsets, anchors, gravity,
            baumgarte, reg)
        return (q2, qd2), (q2, qd2, lam)

    return jax.lax.scan(step, (q0, qd0), taus)


# --------------------------------------------------------------------------
# Free-flyer (floating-base) contact: stance dynamics
# --------------------------------------------------------------------------
def _fb_point_base(ffm, q, link, offset):
    """Contact point and its arm Jacobian, both in BASE coordinates."""
    from .kinematics import fk as _fk, world_jacobian as _wj
    R_bl, p_bl = _fk(ffm.arm, q)
    x_b = p_bl[link] + R_bl[link] @ offset
    J_arm = _wj(ffm.arm, q, link, offset)[3:]    # (3, n) linear, base frame
    return x_b, J_arm


def fb_contact_jacobian(ffm, quat, q, links, offsets):
    """World-frame linear contact Jacobian (3k, 6+n) for the free-flyer:
    columns over the tangent velocities [vb (body twist); q̇]. The point's
    world velocity is ``R_wb (v_b + ω_b × x_b + J_arm q̇)`` with x_b the
    point in base coordinates, so the vb block is ``R_wb [−x̂_b | I₃]``."""
    from .freeflyer import quat_to_rot
    from .spatial import skew as _skew
    offsets = jnp.asarray(offsets, q.dtype)
    R = quat_to_rot(quat)
    rows = []
    for i, l in enumerate(links):
        x_b, J_arm = _fb_point_base(ffm, q, l, offsets[i])
        vb_block = jnp.concatenate([-_skew(x_b), jnp.eye(3, dtype=q.dtype)],
                                   axis=1)                       # (3, 6)
        rows.append(R @ jnp.concatenate([vb_block, J_arm], axis=1))
    return jnp.concatenate(rows, axis=0)                         # (3k, 6+n)


def fb_contact_bias(ffm, quat, q, vb, qd, links, offsets):
    """Stacked bias accelerations of the contact points (3k,): the world
    point acceleration at zero (v̇b, q̈), i.e. J̇·[vb; q̇]. Exact forward-mode
    derivative of the velocity map along the state flow (quaṫ = ½q⊗[0,ω_b],
    q̇ = qd); the world position term drops out of velocities."""
    from .freeflyer import quat_mul, quat_to_rot

    def vel(quat_, q_):
        R = quat_to_rot(quat_)
        out = []
        for i, l in enumerate(links):
            x_b, J_arm = _fb_point_base(ffm, q_, l, offsets[i])
            out.append(R @ (vb[3:] + jnp.cross(vb[:3], x_b) + J_arm @ qd))
        return jnp.concatenate(out)

    dquat = 0.5 * quat_mul(quat, jnp.concatenate(
        [jnp.zeros(1, quat.dtype), vb[:3]]))
    _, bias = jax.jvp(vel, (quat, q), (dquat, qd))
    return bias


def fb_constrained_forward_dynamics(ffm, quat, pos, q, vb, qd, tau, links,
                                    offsets, anchors=None, gravity=-9.81,
                                    baumgarte=(0.0, 0.0), reg=0.0):
    """Stance-phase free-flyer FD: the quadruped/humanoid deployment shape
    (floating base + feet pinned to world anchors). Returns
    ``(v̇b (6,), q̈ (n,), λ (3k,))`` with λ the world contact forces.

    Same Delassus elimination as the fixed-base solver, over the (6+n)
    free-flyer mass matrix (:func:`..freeflyer.fb_mass_matrix`); the base
    rows make ground-reaction forces move the base. Consistency identity
    (tested): ``fb_inverse_dynamics(v̇b, q̈) == ([0;τ] + J_fbᵀ λ)`` split as
    (torque rows, base-wrench rows)."""
    from .freeflyer import fb_bias, fb_mass_matrix, quat_to_rot

    _check_contacts(ffm.n, links, offsets)
    offsets = jnp.asarray(offsets, q.dtype)
    n = ffm.n
    k = len(links)
    # one shared mass factorization serves the free solve AND the Delassus
    # assembly (fb_forward_dynamics would factor M a second time)
    X = ffm.arm.joint_transforms(q)
    R_wb = quat_to_rot(quat)
    p_b, c_j = fb_bias(ffm, X, R_wb, vb, qd, gravity)
    M = fb_mass_matrix(ffm, X)
    Lm = jnp.linalg.cholesky(M)
    msolve = lambda rhs: jax.scipy.linalg.cho_solve((Lm, True), rhs)
    y_free = msolve(jnp.concatenate([-p_b, tau - c_j]))

    J = fb_contact_jacobian(ffm, quat, q, links, offsets)        # (3k, 6+n)
    bias = fb_contact_bias(ffm, quat, q, vb, qd, links, offsets)

    alpha, beta = baumgarte
    a_star = jnp.zeros(3 * k, q.dtype)
    if alpha != 0.0:
        a_star = a_star - 2.0 * alpha * (J @ jnp.concatenate([vb, qd]))
    if beta != 0.0:
        x = jnp.concatenate([
            pos + R_wb @ _fb_point_base(ffm, q, l, offsets[i])[0]
            for i, l in enumerate(links)])
        anch = (x if anchors is None
                else jnp.asarray(anchors, q.dtype).reshape(-1))
        a_star = a_star - beta * beta * (x - anch)

    MiJt = msolve(J.T)                                           # (6+n, 3k)
    G = J @ MiJt + reg * jnp.eye(3 * k, dtype=q.dtype)
    Lg = jnp.linalg.cholesky(G)
    lam = jax.scipy.linalg.cho_solve(
        (Lg, True), -(J @ y_free + bias - a_star))
    y = y_free + MiJt @ lam
    return y[:6], y[6:], lam


def fb_stance_inverse_dynamics(ffm, quat, pos, q, vb, qd, vbdot_des,
                               qdd_des, links, offsets, gravity=-9.81,
                               reg=1e-9):
    """Whole-body stance inverse dynamics: actuation torques and contact
    forces realizing a desired acceleration on a floating base with feet
    in contact — the torque-control primitive of walking-robot stacks
    (the reference stops at unconstrained ID, `_inverse_dynamics.py`;
    this is its stance-phase generalization).

    Solves ``M·v̇_des + h = [0; τ] + Jᵀλ`` for (τ, λ): the 6 unactuated
    base rows determine λ (underdetermined for 3k > 6 — internal foot
    forces don't affect motion — resolved MINIMUM-NORM via the 6×6
    normal equations), the n actuated rows then give τ exactly. Returns
    ``(τ (n,), λ (3k,), base_residual (6,))`` — the residual is 0 when
    the stance can realize the requested base wrench (generic k ≥ 2) and
    reports the unrealizable component otherwise (e.g. a single point
    foot cannot apply a moment about itself).

    Exactness contract (tested): if (v̇b_des, q̈_des) is stance-consistent
    (J·v̇ = −J̇·v), then :func:`fb_constrained_forward_dynamics` under the
    returned τ reproduces (v̇b_des, q̈_des, λ) to round-off — given τ the
    KKT pair (v̇, λ) is unique, so the round trip closes on this (τ, λ)
    even though OTHER (τ', λ') pairs realize the same motion."""
    from .freeflyer import fb_bias, fb_mass_matrix, quat_to_rot

    _check_contacts(ffm.n, links, offsets)
    offsets = jnp.asarray(offsets, q.dtype)
    X = ffm.arm.joint_transforms(q)
    R_wb = quat_to_rot(quat)
    p_b, c_j = fb_bias(ffm, X, R_wb, vb, qd, gravity)
    M = fb_mass_matrix(ffm, X)
    F = M @ jnp.concatenate([vbdot_des, qdd_des]) + jnp.concatenate(
        [p_b, c_j])                                  # required gen. force
    J = fb_contact_jacobian(ffm, quat, q, links, offsets)        # (3k, 6+n)
    A = J[:, :6].T                                               # (6, 3k)
    AAt = A @ A.T
    Lr = jnp.linalg.cholesky(AAt + reg * jnp.eye(6, dtype=q.dtype))
    solve = lambda rhs: jax.scipy.linalg.cho_solve((Lr, True), rhs)
    u = solve(F[:6])
    u = u + solve(F[:6] - AAt @ u)       # refine away the Tikhonov bias
    lam = A.T @ u                        # min-norm contact set
    tau = F[6:] - J[:, 6:].T @ lam
    return tau, lam, F[:6] - A @ lam


def fb_stance_inverse_dynamics_batched(ffm, quat, pos, q, vb, qd,
                                       vbdot_des, qdd_des, links, offsets,
                                       gravity=-9.81, reg=1e-9):
    """vmap of :func:`fb_stance_inverse_dynamics` over a leading batch
    axis on every state/target array (imitation-learning torque
    labeling; the per-call cost is one (6+n) mass assembly + a 6×6
    solve, so plain vmap suffices — no batch-last body needed)."""
    return jax.vmap(
        lambda a, b, c, d, e, f, g_: fb_stance_inverse_dynamics(
            ffm, a, b, c, d, e, f, g_, links, offsets, gravity, reg)
    )(quat, pos, q, vb, qd, vbdot_des, qdd_des)


def fb_constrained_linearize(ffm, quat, pos, q, vb, qd, tau, links, offsets,
                             anchors=None, gravity=-9.81,
                             baumgarte=(0.0, 0.0), reg=0.0):
    """Tangent-space Jacobians of the stance FD outputs [v̇b; q̈] — the
    whole-body-MPC linearization. Attitude perturbs as quat ⊗ exp(½δφ);
    returns a dict of (6+n, k) blocks: ``dphi`` (3), ``dpos`` (3), ``dq``
    (n), ``dvb`` (6), ``dqd`` (n), ``dtau`` (n). Forward-mode AD through
    the Delassus solve (Cholesky is AD-friendly); jit/vmap-compatible.
    An analytic path would compose :func:`..freeflyer.fb_id_grad` with the
    constraint-manifold projector; AD over the already-analytic primal is
    within 2× of that and exact."""
    from .freeflyer import quat_exp_body, quat_mul

    def out(dphi, pos_, q_, vb_, qd_, tau_):
        qt = quat_mul(quat, quat_exp_body(dphi))
        dvb, qdd, _ = fb_constrained_forward_dynamics(
            ffm, qt, pos_, q_, vb_, qd_, tau_, links, offsets, anchors,
            gravity, baumgarte, reg)
        return jnp.concatenate([dvb, qdd])

    zero = jnp.zeros(3, q.dtype)
    jac = jax.jacfwd(out, argnums=(0, 1, 2, 3, 4, 5))(
        zero, pos, q, vb, qd, tau)
    return dict(zip(("dphi", "dpos", "dq", "dvb", "dqd", "dtau"), jac))


# --------------------------------------------------------------------------
# Batch-last small linear algebra (lane-parallel, for the batched entries)
# --------------------------------------------------------------------------
def matmul_bl(A, B):
    """(p, q, Batch) @ (q, r, Batch) → (p, r, Batch), unrolled over the
    small structure dims so every op is a full-lane-width FMA (XLA's
    trailing-batch dot_general would transpose to tiny per-state matmuls —
    the layout problem the batch-last forms exist to avoid)."""
    p, qdim = A.shape[0], A.shape[1]
    r = B.shape[1]
    rows = []
    for i in range(p):
        cols = []
        for j in range(r):
            s = A[i, 0] * B[0, j]
            for k in range(1, qdim):
                s = s + A[i, k] * B[k, j]
            cols.append(s)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def matvec_bl(A, x):
    """(p, q, Batch) @ (q, Batch) → (p, Batch), unrolled."""
    p, qdim = A.shape[0], A.shape[1]
    out = []
    for i in range(p):
        s = A[i, 0] * x[0]
        for k in range(1, qdim):
            s = s + A[i, k] * x[k]
        out.append(s)
    return jnp.stack(out)


def chol_factor_bl(G, reg=0.0):
    """Batch-last unrolled Cholesky of G (m, m, B): returns L as a python
    lower-triangular list-of-lists of (B,) lanes. Every step is a
    lane-parallel vector op — batched ``jnp.linalg.cholesky``/``cho_solve``
    on (B, m, m) measured ~160 ms at B = 262k on the v5e even for m = 3;
    this form is bandwidth-bound at a few ms for m ≤ ~20."""
    m = G.shape[0]
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            s = G[i, j] + (reg if i == j else 0.0)
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def chol_apply_bl(L, r):
    """Solve (L Lᵀ) x = r from a :func:`chol_factor_bl` factor; r (m, B)."""
    m = len(L)
    y = [None] * m
    for i in range(m):
        s = r[i]
        for p in range(i):
            s = s - L[i][p] * y[p]
        y[i] = s / L[i][i]
    x = [None] * m
    for i in reversed(range(m)):
        s = y[i]
        for p in range(i + 1, m):
            s = s - L[p][i] * x[p]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def chol_solve_bl(G, r, reg=0.0):
    """Batch-last SPD solve: G (m, m, B), r (m, B) → (m, B)."""
    return chol_apply_bl(chol_factor_bl(G, reg), r)


# --------------------------------------------------------------------------
# Batch-last free-flyer stance (the production batched/TPU path)
# --------------------------------------------------------------------------
def _quat_to_rot_bl(quat):
    """(4, B) unit quaternions → (3, 3, B) rotations, elementwise."""
    w, x, y, z = quat[0], quat[1], quat[2], quat[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)]),
    ])


def _cmv6(Mc, v):
    """Constant (6,6) @ (6,B) → (6,B)."""
    return jnp.stack([sum(float(Mc[r, c]) * v[c] for c in range(6))
                      for r in range(6)])


def _fb_bias_bl(ffm, X, R, vb, qd, gravity):
    """Batch-last :func:`..freeflyer.fb_bias`: (p_b (6,B), c_j (n,B))."""
    from .blops import crf_apply_bl, crm_apply_bl, matvec6, matvec6_T

    arm = ffm.arm
    topo = arm.topology
    n = topo.n
    B = vb.shape[-1]
    dtype = vb.dtype
    I_base = np.asarray(ffm.I_base)
    g_b = _mv3_T(R, jnp.stack([jnp.zeros((B,), dtype),
                               jnp.zeros((B,), dtype),
                               jnp.full((B,), gravity, dtype)]))
    a0 = jnp.concatenate([jnp.zeros((3, B), dtype), -g_b])

    S = np.asarray(arm.S)
    I = np.asarray(arm.inertia)
    v = [None] * n
    a = [None] * n
    f = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Sqd = jnp.asarray(S[i], dtype)[:, None] * qd[i][None, :]
        v[i] = matvec6(X[i], vb if p < 0 else v[p]) + Sqd
        a[i] = matvec6(X[i], a0 if p < 0 else a[p]) + crm_apply_bl(v[i], Sqd)
        Iv = _cmv6(I[i], v[i])
        f[i] = _cmv6(I[i], a[i]) + crf_apply_bl(v[i], Iv)
    f_b = _cmv6(I_base, a0) + crf_apply_bl(vb, _cmv6(I_base, vb))
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            f[p] = f[p] + matvec6_T(X[i], f[i])
        else:
            f_b = f_b + matvec6_T(X[i], f[i])
    damping = np.asarray(arm.damping)
    c_j = jnp.stack([
        sum(float(S[i, c]) * f[i][c] for c in range(6))
        + float(damping[i]) * qd[i] for i in range(n)])
    return f_b, c_j


def _mv3_T(A, x):
    """(3,3,B)ᵀ @ (3,B)."""
    return jnp.stack([A[0, i] * x[0] + A[1, i] * x[1] + A[2, i] * x[2]
                      for i in range(3)])


def _fb_mass_matrix_bl(ffm, X):
    """Batch-last :func:`..freeflyer.fb_mass_matrix`: (6+n, 6+n, B)."""
    from .blops import matmat6, matmat6_T, matvec6_T

    arm = ffm.arm
    topo = arm.topology
    n = topo.n
    B = X[0].shape[-1]
    dtype = X[0].dtype
    S = np.asarray(arm.S)

    def const66(Mc):
        return jnp.broadcast_to(jnp.asarray(Mc, dtype)[..., None], (6, 6, B))

    IC = [const66(np.asarray(arm.inertia)[i]) for i in range(n)]
    IC_b = const66(np.asarray(ffm.I_base))
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        contrib = matmat6_T(X[i], matmat6(IC[i], X[i]))
        if p >= 0:
            IC[p] = IC[p] + contrib
        else:
            IC_b = IC_b + contrib

    m = 6 + n
    E = [[None] * m for _ in range(m)]
    for r in range(6):
        for c in range(6):
            E[r][c] = IC_b[r, c]
    zero = jnp.zeros((B,), dtype)
    for r in range(m):
        for c in range(m):
            if E[r][c] is None:
                E[r][c] = zero
    for i in range(n):
        F = jnp.stack([sum(IC[i][r, c] * float(S[i, c]) for c in range(6))
                       for r in range(6)])
        # + reflected rotor inertia on the joint diagonal (base rows: none)
        E[6 + i][6 + i] = (sum(float(S[i, c]) * F[c] for c in range(6))
                           + jnp.reshape(arm.armature[i], ()))
        j = i
        while topo.parents[j] >= 0:
            F = matvec6_T(X[j], F)
            j = topo.parents[j]
            val = sum(F[c] * float(S[j, c]) for c in range(6))
            E[6 + i][6 + j] = val
            E[6 + j][6 + i] = val
        F = matvec6_T(X[j], F)
        for c in range(6):
            E[6 + i][c] = F[c]
            E[c][6 + i] = F[c]
    return jnp.stack([jnp.stack(row) for row in E])


def _fb_contact_rows_bl(ffm, quat, q_bl, links, offsets):
    """Batch-last free-flyer contact rows: (J (3k, 6+n, B), x_w-independent
    foot points in base coords x_b (3k-stacked, B))."""
    from .kinematics import _cross_bl, _mv3, contact_rows_bl, fk_bl

    arm = ffm.arm
    n = arm.n
    B = q_bl.shape[-1]
    dtype = q_bl.dtype
    R = _quat_to_rot_bl(quat)
    Rs, ps = fk_bl(arm, q_bl)
    J_arm = contact_rows_bl(arm, q_bl, links, offsets)      # (3k, n, B)
    rows = []
    xs = []
    for i, l in enumerate(links):
        off = jnp.broadcast_to(jnp.asarray(offsets[i], dtype)[:, None],
                               (3, B))
        x_b = ps[l] + _mv3(Rs[l], off)
        xs.append(x_b)
        cols = []
        for j in range(3):                                  # ω_b columns
            e = np.zeros(3)
            e[j] = 1.0
            e_bl = jnp.broadcast_to(jnp.asarray(e, dtype)[:, None], (3, B))
            cols.append(_mv3(R, _cross_bl(e_bl, x_b)))      # R (e_j × x_b)
        for j in range(3):                                  # v_b columns
            cols.append(R[:, j])
        for j in range(n):                                  # q̇ columns
            cols.append(_mv3(R, J_arm[3 * i:3 * i + 3, j]))
        rows.append(jnp.stack(cols, axis=1))                # (3, 6+n, B)
    return jnp.concatenate(rows, axis=0), jnp.concatenate(xs)


def fb_constrained_fd_batched(ffm, quat, pos, q, vb, qd, tau, links, offsets,
                              anchors=None, gravity=-9.81,
                              baumgarte=(0.0, 0.0), reg=0.0, impl="auto"):
    """Batched stance FD over leading batch axes — the TPU production path:
    everything runs batch-last (batch on the vector lanes), mirroring the
    single-state :func:`fb_constrained_forward_dynamics` exactly (tested to
    f64 round-off). Inputs are batch-first user arrays ``(..., d)``; returns
    ``(v̇b (...,6), q̈ (...,n), λ (...,3k))``.

    ``impl``: ``"auto"`` routes to the fused Pallas lane-tile kernel
    (:func:`.kernels.contact_fused.stance_fd_fused`) on TPU and to the
    plain-XLA batch-last pipeline elsewhere; force with ``"pallas"`` /
    ``"vmap"``.

    The robot constants (inertias, S, damping) are baked into the program as
    literals — ``ffm`` must be a concrete closed-over model, not a traced
    ``jit`` argument (the single-state path supports traced models; use it
    for differentiating w.r.t. model parameters)."""
    n = ffm.n
    _check_contacts(n, links, offsets)
    k = len(links)
    offsets_raw, anchors_raw = offsets, anchors   # pre-jnp, for the kernel
    offsets = jnp.asarray(offsets, q.dtype)
    shape_b = q.shape[:-1]
    flat = lambda x: x.reshape((-1, x.shape[-1])).T      # (..., d) → (d, B)
    quat_bl, pos_bl, q_bl = flat(quat), flat(pos), flat(q)
    vb_bl, qd_bl, tau_bl = flat(vb), flat(qd), flat(tau)

    if _impl_auto(impl, q) == "pallas":
        # the fused kernel bakes the geometry as literals, so offsets /
        # anchors must be concrete (the raw arguments, before any traced
        # jnp conversion); the XLA path below keeps them traceable
        # (e.g. jax.grad w.r.t. foot offsets)
        from .kernels import contact_fused as _cf

        dvb, qdd2, lam2 = _cf.stance_fd_fused(
            ffm, quat_bl, pos_bl, q_bl, vb_bl, qd_bl, tau_bl, links,
            np.asarray(offsets_raw, np.float64),
            None if anchors_raw is None
            else np.asarray(anchors_raw, np.float64),
            gravity, baumgarte, reg)
        unflat2 = lambda arr: jnp.moveaxis(arr, 0, -1).reshape(
            shape_b + (arr.shape[0],))
        return unflat2(dvb), unflat2(qdd2), unflat2(lam2)
    B = q_bl.shape[-1]
    dtype = q_bl.dtype

    from .blops import joint_transforms_bl
    X = joint_transforms_bl(ffm.arm, q_bl)
    R = _quat_to_rot_bl(quat_bl)
    p_b, c_j = _fb_bias_bl(ffm, X, R, vb_bl, qd_bl, gravity)
    M = _fb_mass_matrix_bl(ffm, X)
    Lm = chol_factor_bl(M)
    y_free = chol_apply_bl(Lm, jnp.concatenate([-p_b, tau_bl - c_j]))

    J, x_b = _fb_contact_rows_bl(ffm, quat_bl, q_bl, links, offsets)

    # bias: exact jvp of the velocity map along the state flow (batch-last)
    def vel(quat_, q_):
        Jv, xb = _fb_contact_rows_bl(ffm, quat_, q_, links, offsets)
        vfull = jnp.concatenate([vb_bl, qd_bl])
        return jnp.stack([
            sum(Jv[r, c] * vfull[c] for c in range(6 + n))
            for r in range(3 * k)])

    # quaternion rate: quaṫ = ½ quat ⊗ [0, ω_b] — componentwise
    w, xq, yq, zq = quat_bl
    ox, oy, oz = vb_bl[0], vb_bl[1], vb_bl[2]
    dquat = 0.5 * jnp.stack([
        -xq * ox - yq * oy - zq * oz,
        w * ox + yq * oz - zq * oy,
        w * oy + zq * ox - xq * oz,
        w * oz + xq * oy - yq * ox,
    ])
    _, bias = jax.jvp(vel, (quat_bl, q_bl), (dquat, qd_bl))

    alpha, beta = baumgarte
    a_star = jnp.zeros((3 * k, B), dtype)
    vfull = jnp.concatenate([vb_bl, qd_bl])
    if alpha != 0.0:
        Jv = jnp.stack([sum(J[r, c] * vfull[c] for c in range(6 + n))
                        for r in range(3 * k)])
        a_star = a_star - 2.0 * alpha * Jv
    if beta != 0.0:
        x_w = jnp.concatenate([
            pos_bl + jnp.stack([sum(R[i, j] * x_b[3 * m_ + j]
                                    for j in range(3)) for i in range(3)])
            for m_ in range(k)])
        anch = (x_w if anchors is None
                else jnp.asarray(anchors, dtype).reshape(-1)[:, None])
        a_star = a_star - beta * beta * (x_w - anch)

    # Delassus via the shared mass factorization: columns of M⁻¹ Jᵀ
    MiJt_cols = [chol_apply_bl(Lm, J[r]) for r in range(3 * k)]  # (6+n, B)
    G = jnp.stack([
        jnp.stack([sum(J[r, c] * MiJt_cols[s][c] for c in range(6 + n))
                   for s in range(3 * k)])
        for r in range(3 * k)])
    rhs = -(jnp.stack([sum(J[r, c] * y_free[c] for c in range(6 + n))
                       for r in range(3 * k)]) + bias - a_star)
    lam = chol_solve_bl(G, rhs, reg=reg)
    y = y_free + sum(MiJt_cols[s] * lam[s][None, :] for s in range(3 * k))

    unflat = lambda arr: jnp.moveaxis(arr, 0, -1).reshape(
        shape_b + (arr.shape[0],))
    return unflat(y[:6]), unflat(y[6:]), unflat(lam)


# --------------------------------------------------------------------------
# Unilateral ground contact with Coulomb friction (velocity-stepping PGS)
# --------------------------------------------------------------------------
def _pgs_sweep(p, G, b, mu, active, lim_active, diag, k: int, m: int,
               relax: float = 1.0, eq: int = 0, fric=None):
    """One full (projected-SOR) Gauss-Seidel sweep of the cone solve
    (single state): the map T(p, θ) whose fixed point is the contact
    solution. Shared verbatim by the forward ``fori_loop`` and the
    implicit-diff backward pass (the IFT differentiates p* = T(p*, θ),
    so both must iterate the SAME map).

    ``relax`` < 1 under-relaxes each block update (p ← p + ω(proj − p);
    the blend of two cone points stays in the convex cone, and the fixed
    points are exactly those of the ω=1 map). Plain PGS (ω=1) can limit-
    cycle on strongly coupled high-μ systems — measured on a standing
    quadruped at μ=1: residual 1.4e-2, ρ(∂T/∂p)=1.18, the two unloaded
    feet never converging; ω=0.7 reaches the true fixed point (residual
    1e-16, ρ=0.84, all four feet loaded)."""
    dtype = p.dtype
    for i in range(k):
        s = 3 * i
        r = G[s:s + 3] @ p + b[s:s + 3]
        cand = p[s:s + 3] - r / diag[s:s + 3]
        pn = jnp.maximum(cand[2], 0.0) * active[i]
        pt = cand[:2]
        norm_t = jnp.sqrt(pt @ pt + 1e-30)
        scale = jnp.minimum(1.0, mu[i] * pn / norm_t)
        pnew = jnp.concatenate([pt * scale, pn[None]]).astype(dtype)
        if relax != 1.0:
            pnew = p[s:s + 3] + relax * (pnew - p[s:s + 3])
        p = p.at[s:s + 3].set(pnew)
    for j in range(m):
        row = 3 * k + j
        r = G[row] @ p + b[row]
        pj = jnp.maximum(p[row] - r / diag[row], 0.0) * lim_active[j]
        if relax != 1.0:
            pj = p[row] + relax * (pj - p[row])
        p = p.at[row].set(pj)
    for j in range(eq):
        # bilateral (equality) rows — loop-closure cuts: plain unprojected
        # Gauss-Seidel (sign-free impulse), convergent on the SPD Delassus
        row = 3 * k + m + j
        r = G[row] @ p + b[row]
        pj = p[row] - r / diag[row]
        if relax != 1.0:
            pj = p[row] + relax * (pj - p[row])
        p = p.at[row].set(pj)
    for j in range(0 if fric is None else fric.shape[0]):
        # BOX rows — joint dry friction (MuJoCo frictionloss): bilateral
        # impulse clamped to ±bound (= frictionloss·dt); inside the box
        # the joint sticks (row drives its velocity to zero), at the box
        # face it slides against the constant Coulomb torque
        row = 3 * k + m + eq + j
        r = G[row] @ p + b[row]
        pj = jnp.clip(p[row] - r / diag[row], -fric[j], fric[j])
        if relax != 1.0:
            pj = p[row] + relax * (pj - p[row])
        p = p.at[row].set(pj)
    return p


def pgs_solve(G, b, mu, active, iters: int = 30, lim_active=None,
              implicit_diff: bool = False, relax: float = 1.0,
              eq_rows: int = 0, fric_bound=None):
    """Projected Gauss-Seidel for the contact LCP/cone problem: find
    impulses p minimizing ½pᵀGp + pᵀb subject to, per contact i (rows
    ordered [t1, t2, n]): p_n ≥ 0 (only pushing), ‖p_t‖ ≤ μ p_n (Coulomb
    cone), p ≡ 0 where ``active`` is False.

    Static shapes: k contacts per call; ``lax.fori_loop`` over sweeps, the
    per-contact update unrolled (k is small). The per-contact step is a
    diagonal-block preconditioned descent followed by cone projection — the
    standard game-physics/MuJoCo-style PGS that converges linearly for the
    SPD G produced by J M⁻¹ Jᵀ.

    ``lim_active`` (m,) appends m trailing NORMAL-ONLY rows (hard
    joint-limit impulses, λ ≥ 0, no friction) after the 3k contact rows —
    G/b must then be sized (3k+m, …).

    ``implicit_diff=True`` swaps reverse-mode AD from unrolling the sweeps
    (O(iters) stored iterates, gradient of the TRUNCATED iteration) to
    implicit fixed-point differentiation (see :func:`_pgs_implicit`):
    exact gradients of the converged solution w.r.t. (G, b, μ) at O(1)
    memory. ``relax`` < 1 under-relaxes the sweeps (projected SOR, same
    fixed points) — required for convergence on strongly coupled high-μ
    systems, and therefore for valid implicit gradients there (see
    :func:`_pgs_sweep`).

    ``eq_rows`` appends that many trailing BILATERAL rows (λ sign-free,
    no projection — loop-closure cuts, :mod:`.loops`) after the limit
    rows; on those rows PGS degenerates to plain Gauss-Seidel.

    ``fric_bound`` (f,) appends f trailing BOX rows (joint dry friction /
    MuJoCo ``frictionloss``: λ ∈ [−bound, bound], bound = loss·dt) after
    the eq rows — sticking inside the box, constant Coulomb torque at its
    face; differentiable in the bound (friction identification)."""
    m = 0 if lim_active is None else lim_active.shape[0]
    f = 0 if fric_bound is None else fric_bound.shape[0]
    k = (b.shape[0] - m - eq_rows - f) // 3
    lim = (jnp.zeros((0,) + b.shape[1:], b.dtype) if lim_active is None
           else lim_active)
    fr = (jnp.zeros((0,) + b.shape[1:], b.dtype) if fric_bound is None
          else jnp.asarray(fric_bound, b.dtype))
    if implicit_diff:
        return _pgs_implicit("single", k, m, int(eq_rows), int(iters),
                             float(relax), G, b, mu, active, lim, fr)
    diag = jnp.clip(jnp.diagonal(G), 1e-9, None)
    return jax.lax.fori_loop(
        0, iters,
        lambda _, p: _pgs_sweep(p, G, b, mu, active, lim, diag, k, m,
                                relax, eq_rows, fr),
        jnp.zeros_like(b))


def _pgs_step_of_theta(layout: str, p, G, b, mu, active, lim_active,
                       k: int, m: int, relax: float = 1.0, eq: int = 0,
                       fric=None):
    """T(p, θ) with the diagonal preconditioner folded in as the function
    of G it is (the IFT needs T's full θ-dependence, including diag)."""
    if layout == "single":
        diag = jnp.clip(jnp.diagonal(G), 1e-9, None)
        return _pgs_sweep(p, G, b, mu, active, lim_active, diag, k, m,
                          relax, eq, fric)
    f = 0 if fric is None else fric.shape[0]
    diag = jnp.clip(jnp.stack([G[d, d] for d in range(3 * k + m + eq + f)]),
                    1e-9, None)
    return _pgs_sweep_bl(p, G, b, mu, active, lim_active, diag, k, m,
                         relax, eq, fric)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _pgs_implicit(layout, k, m, eq, iters, relax, G, b, mu, active,
                  lim_active, fric=None):
    """PGS with implicit fixed-point gradients. Forward: the plain solver.
    Backward: at the converged p* = T(p*, θ), the IFT gives
    ∂p*/∂θ = (I − ∂T/∂p)⁻¹ ∂T/∂θ, so the VJP is θ̄ = (∂T/∂θ)ᵀ u with
    (I − ∂T/∂p)ᵀ u = p̄. The linear system is solved DIRECTLY: the row
    count is tiny (3k+m ≤ a few dozen), so ∂T/∂p is built densely with
    ``jacfwd`` through one sweep and factored per state. A transposed
    Neumann iteration (the usual jaxopt recipe) is NOT safe here — the
    linearized projected-GS sweep can have spectral radius ≥ 1 in the
    high-μ sticking regime even though the forward (globally stabilized
    by the projections) converges; measured: Neumann gradients diverged
    to 1e102 at μ=1.5 on a standing quadruped while the direct solve
    matches finite differences. O(1) memory in ``iters``; gradient of the
    SOLUTION, not of a truncated unroll."""
    p0 = jnp.zeros_like(b)
    return jax.lax.fori_loop(
        0, iters,
        lambda _, p: _pgs_step_of_theta(layout, p, G, b, mu, active,
                                        lim_active, k, m, relax, eq, fric),
        p0)


def _pgs_implicit_fwd(layout, k, m, eq, iters, relax, G, b, mu, active,
                      lim_active, fric=None):
    p = _pgs_implicit(layout, k, m, eq, iters, relax, G, b, mu, active,
                      lim_active, fric)
    return p, (p, G, b, mu, active, lim_active, fric)


def _pgs_implicit_bwd(layout, k, m, eq, iters, relax, res, pbar):
    p, G, b, mu, active, lim_active, fric = res
    rows = 3 * k + m + eq + (0 if fric is None else fric.shape[0])
    T = lambda p_: _pgs_step_of_theta(layout, p_, G, b, mu, active,
                                      lim_active, k, m, relax, eq, fric)
    eye = jnp.eye(rows, dtype=p.dtype)
    if layout == "single":
        A = jax.jacfwd(T)(p)                       # (rows, rows)
        u = jnp.linalg.solve(eye - A.T, pbar)
    else:
        # per-environment columns A·e_i (each one jvp broadcast over the
        # lanes), assembled into (B, rows, rows) and solved batched
        cols = [jax.jvp(T, (p,),
                        (jnp.broadcast_to(eye[i][:, None], p.shape),))[1]
                for i in range(rows)]
        A = jnp.stack(cols, axis=-1)               # (rows_out, B, rows_in)
        A_env = jnp.moveaxis(A, 1, 0)              # (B, rows_out, rows_in)
        lhs = eye[None] - jnp.swapaxes(A_env, 1, 2)
        u = jnp.linalg.solve(lhs, pbar.T[..., None])[..., 0].T  # (rows, B)
    if fric is None:
        _, vjp_th = jax.vjp(
            lambda G_, b_, mu_, act_, lim_: _pgs_step_of_theta(
                layout, p, G_, b_, mu_, act_, lim_, k, m, relax, eq),
            G, b, mu, active, lim_active)
        return vjp_th(u) + (None,)
    _, vjp_th = jax.vjp(
        lambda G_, b_, mu_, act_, lim_, fr_: _pgs_step_of_theta(
            layout, p, G_, b_, mu_, act_, lim_, k, m, relax, eq, fr_),
        G, b, mu, active, lim_active, fric)
    return vjp_th(u)


_pgs_implicit.defvjp(_pgs_implicit_fwd, _pgs_implicit_bwd)


def joint_limit_torque(q, qd, lo, hi, kp=200.0, kd=5.0):
    """SOFT joint-limit torque (spring-damper, zero inside [lo, hi]):
    τ_lim = kp·(lo − q)⁺ − kp·(q − hi)⁺, plus −kd·q̇ while violating AND
    moving further out. A penalty utility for reward shaping / compliant
    models — equilibrium excess under a constant push τ is τ/kp, and kp is
    bounded by explicit-integration stability (kp ≲ I/dt² per joint). For
    HARD limits use the steppers' ``limits=`` projection instead.
    Elementwise over any shape broadcastable with (lo, hi) — single
    states, batches, batch-last alike."""
    over = jnp.maximum(q - hi, 0.0)
    under = jnp.maximum(lo - q, 0.0)
    outward = ((over > 0) & (qd > 0)) | ((under > 0) & (qd < 0))
    return kp * (under - over) - kd * qd * outward.astype(q.dtype)


def pd_torque(q, qd, q_target, kp, kd, qd_target=0.0):
    """Joint-space PD servo torque kp·(q* − q) − kd·(q̇ − q̇*) — the
    standard RL actuation map (actions = position targets). Elementwise
    over any layout; compose with :func:`clamp_effort` and feed the
    result to the steppers (works with every impl incl. the fused
    kernels, since it only shapes τ)."""
    return kp * (q_target - q) - kd * (qd - qd_target)


def clamp_effort(tau, effort):
    """URDF actuator saturation: clamp τ to ±effort (``desc.effort``;
    ``inf`` entries are no-ops)."""
    e = jnp.asarray(effort, tau.dtype)
    return jnp.clip(tau, -e, e)


def project_joint_limits(q, qd, lo, hi):
    """HARD joint limits as a position-level projection (the standard
    velocity-stepping treatment — unconditionally stable at any dt, unlike
    an explicit penalty spring): clamp q into [lo, hi] and zero the
    *outward* velocity component of joints at a bound. Applied to the
    integrator outputs, so it composes with every impl including the
    fused step kernels. Approximation (documented): the stopping impulse
    is not propagated to the base momentum within the step."""
    lo = jnp.asarray(lo, q.dtype)
    hi = jnp.asarray(hi, q.dtype)
    qc = jnp.clip(q, lo, hi)
    stop = ((q >= hi) & (qd > 0)) | ((q <= lo) & (qd < 0))
    return qc, jnp.where(stop, jnp.zeros_like(qd), qd)


def soft_contact_params(kp, kd, dt):
    """MuJoCo/ODE-style compliant contact: map a contact spring-damper
    (stiffness ``kp`` [N/m], damping ``kd`` [N·s/m]) to the velocity-
    stepping solver's ``(erp, softness)`` pair.

    Implicit-Euler discretization of F = −kp·x − kd·ẋ at the contact
    (Catto's soft-constraint relation, the ODE ERP/CFM correspondence):
    ``erp = dt·kp/(dt·kp + kd)`` and ``softness = 1/(dt·(dt·kp + kd))``
    — the diagonal compliance added to the impulse-level Delassus
    operator, so each cone row solves ``(G + softness·I)·λ = rhs``
    exactly like MuJoCo's regularized contact (R = solimp compliance).
    ``softness → 0`` recovers the rigid Stewart-Trinkle contact; at
    equilibrium a supported contact penetrates by
    ``x* = softness·λ*·dt/erp`` (tested analytically). Use::

        erp, soft = soft_contact_params(kp=5e4, kd=2e3, dt=dt)
        fb_step_ground_batched(..., erp=erp, softness=soft)
    """
    denom = dt * kp + kd
    try:                   # scalar OR per-contact array kp/kd
        bad = bool(np.any(np.asarray(denom) <= 0.0))
    except Exception:      # traced kp/kd (identification): caller's problem
        bad = False
    if bad:
        raise ValueError(
            f"soft_contact_params: dt*kp + kd = {np.asarray(denom)} must "
            "be positive everywhere (kp and kd cannot both be "
            "zero/negative) — erp and softness would be inf/NaN")
    return dt * kp / denom, 1.0 / (dt * denom)


def _softness_rows(softness, k, dtype):
    """(3k,) per-row Delassus compliance from a scalar or per-contact
    (k,) ``softness`` (each cone triplet shares its contact's value —
    tangent rows soften with the normal, MuJoCo-style)."""
    s = jnp.broadcast_to(jnp.asarray(softness, dtype), (k,))
    return jnp.repeat(s, 3)


def _limit_rows(q_sel, lo, hi, margin, cols, width, dtype):
    """Unilateral joint-limit rows shared by the fb and md single-state
    steppers: one normal-only row per scalar joint, direction −s·e_col
    (the direction that INCREASES the distance-to-bound "gap"): s = +1
    near the upper bound, −1 near the lower; gap g = hi−q or q−lo, ġ =
    −s·q̇, recovered with the same erp semantics as contacts. ±inf
    bounds never activate; their gap is kept finite for the math.
    Returns ``(J_l (m, width), lim_active (m,), lim_gap (m,))``."""
    lim_margin = 10.0 * margin
    s_hi = (q_sel > hi - lim_margin)
    s_lo = (q_sel < lo + lim_margin)
    # A range narrower than 2·lim_margin puts q inside BOTH bands; the
    # signs would cancel to a zero row while active=1 (a dynamically inert
    # huge λ off the 1e-9 diagonal). Resolve to the NEARER bound instead.
    both = s_hi & s_lo
    near_hi = (hi - q_sel) < (q_sel - lo)
    sign = jnp.where(both, jnp.where(near_hi, 1.0, -1.0),
                     s_hi.astype(dtype) - s_lo.astype(dtype)).astype(dtype)
    lim_active = (s_hi | s_lo).astype(dtype)
    lim_gap = jnp.where(sign < 0, q_sel - lo, hi - q_sel)
    lim_gap = jnp.where(jnp.isfinite(lim_gap), lim_gap, 1.0)
    m = q_sel.shape[0]
    J_l = jnp.zeros((m, width), dtype)
    J_l = J_l.at[jnp.arange(m), jnp.asarray(cols)].set(-sign)
    return J_l, lim_active, lim_gap


def _tendon_limit_rows(L, lo, hi, A, margin, dtype):
    """Unilateral fixed-tendon range rows shared by the fb and md
    single-state steppers — :func:`_limit_rows` generalized from one-hot
    columns to full coefficient rows: tendon length ``L = coef·q`` is a
    LINEAR function of the joint positions (MuJoCo's ``<tendon><fixed>``
    with a ``range``), so a near-bound tendon contributes one normal-only
    row −s·A_row (s = +1 near the upper bound, −1 near the lower; a λ ≥ 0
    impulse then drives L̇ back toward the range). ``A (t, width)`` is the
    coefficient matrix already expanded to the stepper's velocity
    coordinates. Gap g = hi−L or L−lo, recovered with the contact erp;
    ±inf bounds never activate. Returns ``(J_t (t, width), active (t,),
    gap (t,))``."""
    lim_margin = 10.0 * margin
    s_hi = (L > hi - lim_margin)
    s_lo = (L < lo + lim_margin)
    # Narrow ranges (< 2·lim_margin, plausible for differential couplings)
    # put L inside both bands — resolve to the nearer bound rather than
    # letting the signs cancel to a zero row with active=1 (ADVICE r4).
    both = s_hi & s_lo
    near_hi = (hi - L) < (L - lo)
    sign = jnp.where(both, jnp.where(near_hi, 1.0, -1.0),
                     s_hi.astype(dtype) - s_lo.astype(dtype)).astype(dtype)
    active = (s_hi | s_lo).astype(dtype)
    gap = jnp.where(sign < 0, L - lo, hi - L)
    gap = jnp.where(jnp.isfinite(gap), gap, 1.0)
    return -sign[:, None] * jnp.asarray(A, dtype), active, gap


def _fric_box_rows(frictionloss, cols, width, dt, dtype):
    """Dry-friction BOX rows shared by the fb and md single-state
    steppers (MuJoCo ``frictionloss``): one row per coordinate with
    loss > 0 selecting tangent column ``cols[i]``; bound = loss·dt.
    Static zero losses are dropped at trace time; traced losses keep
    every row (differentiable — friction identification). Returns
    ``(J_f, fr_bound)`` or ``(None, None)`` when no row survives."""
    cols = np.asarray(cols)
    if isinstance(frictionloss, jax.core.Tracer):
        fsel = np.arange(len(cols))
        fl = jnp.asarray(frictionloss, dtype)
    else:
        fl_np = np.asarray(frictionloss, np.float64)
        fsel = np.nonzero(fl_np)[0]
        fl = jnp.asarray(fl_np[fsel], dtype)
    if fsel.size == 0:
        return None, None
    J_f = jnp.zeros((len(fsel), width), dtype)
    J_f = J_f.at[jnp.arange(len(fsel)),
                 jnp.asarray(cols[fsel])].set(1.0)
    bound = (fl[jnp.asarray(fsel)]
             if isinstance(frictionloss, jax.core.Tracer) else fl) * dt
    return J_f, bound


def fb_step_ground(ffm, state, tau, dt, links, offsets, mu=0.8,
                   ground_z=0.0, gravity=-9.81, iters: int = 30,
                   erp: float = 0.2, margin: float = 1e-3,
                   restitution: float = 0.0, limits=None, effort=None,
                   limit_mode: str = "project", diff_mode: str = "unroll",
                   relax: float = 1.0, terrain=None, collision=None,
                   mu_collision=None, ground_geoms=None, mu_ground=None,
                   loops=None, welds=None, f_base=None, frictionloss=None,
                   softness=None, tendons=None):
    """One velocity-stepping simulation step of the free-flyer over a
    horizontal ground plane with unilateral frictional contacts at the
    given foot points — feet can lift off, stick, and slide.

    ``terrain``: an optional :class:`.terrain.Terrain` bilinear
    heightfield replacing the flat plane — each contact then uses the
    local surface frame [t1, t2, n] (n the surface normal at the foot's
    (x, y)) and the gap measured along n; ``ground_z`` is ignored. The
    heightfield is differentiable: gradients flow through the foot
    query point AND the terrain node heights (terrain identification).

    Semi-implicit impulse formulation (Stewart-Trinkle style): the free
    velocity ``v_free = v + dt·M⁻¹([0;τ] − bias)`` is corrected by contact
    impulses solved with :func:`pgs_solve` on the Delassus operator; the
    normal rows carry Baumgarte-style penetration recovery (``erp``) and
    optional restitution. Contacts activate when the foot's gap to the
    plane is below ``margin``. Returns ``(next_state, impulses (k,3))``
    with impulses in world [t1, t2, n] order per contact.

    Complementarity at the solution (tested): p_n ≥ 0,
    p_n·(v_n⁺ − v_n*) ≈ 0, ‖p_t‖ ≤ μ·p_n, and sliding feet oppose their
    tangential velocity.

    Joint limits (``limits=(lo, hi)``): ``limit_mode="project"`` clamps
    q and zeroes outward velocity after integration (fast, fused-impl
    compatible, drops the stopping impulse's base reaction);
    ``"impulse"`` appends one normal-only row per near-limit joint to
    the Delassus/PGS system — the momentum-consistent treatment (the
    stopping impulse reacts on the whole tree incl. the base).

    Tendon ranges (``tendons=(coef (t, n), lo, hi)`` — feed
    :meth:`~..models.mjcf.MjcfTendons.stepper_rows`): each fixed tendon
    ``L = coef·q`` near a bound contributes one normal-only impulse row
    on its coefficient direction (:func:`_tendon_limit_rows`) in the
    same solve — MuJoCo's tendon-limit constraint. Always
    momentum-consistent rows (coupled coordinates admit no projection);
    the coupled stopping impulse spreads over every joint the tendon
    touches.

    ``collision``: an optional :class:`.collision.CollisionModel` — its
    candidate self-collision and obstacle pairs are appended to the foot
    rows as additional frictional cone triplets (coefficient
    ``mu_collision``, defaulting to ``mu`` when that is a scalar), with the
    same margin-activation, penetration-recovery, and restitution
    semantics. The returned impulse array then covers
    ``k_feet + collision.n_contacts`` triplets, feet first.

    ``ground_geoms``: an optional :class:`.collision.Geoms` — each
    capsule/sphere geom (on a link or the base, link -1) contacts the
    SAME ground surface as the feet (plane or ``terrain``) at its
    endpoint spheres (:func:`.collision.fb_ground_geom_rows` — capsule
    feet, shin scraping, fallen-torso contact), appended as cone
    triplets with coefficient ``mu_ground`` (defaulting like
    ``mu_collision``). Impulse order: feet, collision, ground-geoms.

    ``softness``: optional compliant (soft) contact — a scalar or
    per-contact (k,) diagonal compliance added to the impulse-level
    Delassus rows of the cone triplets (MuJoCo's regularized-contact R;
    map a physical spring-damper with :func:`soft_contact_params`).
    ``None``/0 is the rigid contact; softness is differentiable
    (compliance identification) and composes with every row type.

    ``diff_mode``: how reverse-mode AD treats the PGS cone solve —
    ``"unroll"`` (default) differentiates through the stored sweeps;
    ``"implicit"`` uses exact fixed-point (IFT) gradients at O(1) memory
    (:func:`_pgs_implicit`). Everything else in the step (mass matrix,
    Jacobians, integration) is smooth, so with ``"implicit"`` the whole
    step is end-to-end differentiable in q, q̇, τ, μ, dt — the
    BPTT-through-contact training path. Implicit gradients assume the
    solve CONVERGED; on strongly coupled high-μ systems pass
    ``relax≈0.7`` (projected SOR, same solutions — see
    :func:`_pgs_sweep`) so it does.

    ``loops = (pairs, offsets_a, offsets_b)``: loop-closure cuts
    (:mod:`.loops` — closed-chain linkage legs, self-grasps) enforced as
    BILATERAL rows inside the same PGS solve (sign-free impulses, plain
    Gauss-Seidel rows after the cone/limit rows) with the same ``erp``
    gap recovery — a parallel-linkage robot stepping on frictional
    ground is one solve."""
    from .freeflyer import (fb_bias, fb_mass_matrix, quat_exp_body,
                            quat_mul, quat_to_rot)

    quat, pos, q, vb, qd = state
    _check_contacts(ffm.n, links, offsets)
    offsets = jnp.asarray(offsets, q.dtype)
    if effort is not None:
        tau = clamp_effort(tau, effort)
    if limit_mode not in ("project", "impulse"):
        raise ValueError(f"limit_mode must be 'project' or 'impulse', "
                         f"got {limit_mode!r}")
    if diff_mode not in ("unroll", "implicit"):
        raise ValueError(f"diff_mode must be 'unroll' or 'implicit', "
                         f"got {diff_mode!r}")
    impulse_limits = limits is not None and limit_mode == "impulse"
    k = len(links)
    n = ffm.n
    arm = ffm.arm
    R = quat_to_rot(quat)

    # free velocity step
    X = arm.joint_transforms(q)
    p_b, c_j = fb_bias(ffm, X, R, vb, qd, gravity)
    M = fb_mass_matrix(ffm, X)
    Lm = jnp.linalg.cholesky(M)
    msolve = lambda rhs: jax.scipy.linalg.cho_solve((Lm, True), rhs)
    v = jnp.concatenate([vb, qd])
    # f_base: optional (6,) external wrench on the base, base frame
    # ([moment; force] — RL push perturbations); differentiable, incl.
    # through diff_mode="implicit" (it enters the IFT fixed point only
    # via v_free)
    p_b_eff = p_b if f_base is None else p_b - f_base
    v_free = v + dt * msolve(jnp.concatenate([-p_b_eff, tau - c_j]))

    # contact rows: local [t1, t2, n] per foot (n = +z for the flat plane,
    # the surface normal at the foot's (x, y) for a heightfield)
    J6 = fb_contact_jacobian(ffm, quat, q, links, offsets)   # (3k, 6+n) xyz
    p_w = jnp.stack([pos + R @ _fb_point_base(ffm, q, l, offsets[i])[0]
                     for i, l in enumerate(links)])          # (k, 3) world
    if terrain is None:
        gaps = p_w[:, 2] - ground_z
        J = J6  # flat plane: frame rows are the world axes already
    else:
        from .terrain import contact_frame, terrain_surface
        h, nrm = terrain_surface(terrain, p_w[:, 0], p_w[:, 1])  # nrm (3,k)
        gaps = (p_w[:, 2] - h) * nrm[2]          # distance along the normal
        C = contact_frame(nrm)                                # (3, 3, k)
        J = jnp.concatenate([C[..., i] @ J6[3 * i:3 * i + 3]
                             for i in range(k)], axis=0)
    k_feet = k
    n_coll = 0
    if collision is not None:
        from .collision import fb_collision_rows
        c_gaps, c_J = fb_collision_rows(ffm, quat, pos, q, collision)
        J = jnp.concatenate([J, c_J], axis=0)
        gaps = jnp.concatenate([gaps, c_gaps])
        n_coll = collision.n_contacts
        k = k + n_coll
    if ground_geoms is not None:
        from .collision import fb_ground_geom_rows
        g_gaps, g_J = fb_ground_geom_rows(ffm, quat, pos, q, ground_geoms,
                                          ground_z=ground_z,
                                          terrain=terrain)
        J = jnp.concatenate([J, g_J], axis=0)
        gaps = jnp.concatenate([gaps, g_gaps])
        k = k + g_gaps.shape[0]
    active = (gaps < margin).astype(q.dtype)

    lim_active = lim_gap = None
    lim_parts = []           # (rows, active, gap) — joint limits, then
    if impulse_limits:       # tendon ranges, one shared normal-only block
        lim_parts.append(_limit_rows(
            q, jnp.asarray(limits[0], q.dtype),
            jnp.asarray(limits[1], q.dtype), margin,
            6 + np.arange(n), 6 + n, q.dtype))
    if tendons is not None:
        # fixed-tendon range rows (``tendons=(coef (t, n), lo, hi)`` —
        # MjcfTendons.stepper_rows): coefficient rows over the joint
        # columns, zero on the base twist
        A_t = jnp.asarray(tendons[0], q.dtype)
        lim_parts.append(_tendon_limit_rows(
            A_t @ q, jnp.asarray(tendons[1], q.dtype),
            jnp.asarray(tendons[2], q.dtype),
            jnp.concatenate([jnp.zeros((A_t.shape[0], 6), q.dtype), A_t],
                            axis=1), margin, q.dtype))
    if lim_parts:
        J = jnp.concatenate([J] + [p[0] for p in lim_parts], axis=0)
        lim_active = jnp.concatenate([p[1] for p in lim_parts])
        lim_gap = jnp.concatenate([p[2] for p in lim_parts])
    n_lim = J.shape[0] - 3 * k
    eq = 0
    eq_gaps = []
    if loops is not None:
        from .loops import fb_loop_gap, fb_loop_jacobian
        lpairs, loa, lob = loops
        J_loop = fb_loop_jacobian(ffm, quat, q, lpairs, loa, lob)
        eq_gaps.append(fb_loop_gap(ffm, quat, pos, q, lpairs, loa, lob))
        J = jnp.concatenate([J, J_loop], axis=0)
        eq = J_loop.shape[0]
    if welds is not None:
        # orientation rows of <equality><weld> cuts (the position rows
        # are the same connect machinery above — pass the weld anchor
        # through ``loops=``; make_ground_env does this merge)
        from .loops import fb_weld_gap, fb_weld_jacobian
        wpairs, wR0 = welds
        J_weld = fb_weld_jacobian(ffm, quat, q, wpairs)
        eq_gaps.append(fb_weld_gap(ffm, quat, q, wpairs, wR0))
        J = jnp.concatenate([J, J_weld], axis=0)
        eq = eq + J_weld.shape[0]
    fr_bound = None
    if frictionloss is not None:
        J_f, fr_bound = _fric_box_rows(frictionloss, 6 + np.arange(n),
                                       6 + n, dt, q.dtype)
        if J_f is not None:
            J = jnp.concatenate([J, J_f], axis=0)
    MiJt = msolve(J.T)
    G = J @ MiJt + 1e-9 * jnp.eye(J.shape[0], dtype=q.dtype)
    if softness is not None:
        # compliant (soft) contact: per-row Delassus compliance on the
        # cone triplets only (see soft_contact_params)
        idx = jnp.arange(3 * k)
        G = G.at[idx, idx].add(_softness_rows(softness, k, q.dtype))
    vn_now = (J[:3 * k] @ v).reshape(k, 3)[:, 2]
    # normal velocity target: penetration recovery + restitution
    v_star = (-erp * jnp.minimum(gaps, 0.0) / dt
              - restitution * jnp.minimum(vn_now, 0.0))
    b = J @ v_free
    b = b.at[2:3 * k:3].add(-v_star)
    if lim_active is not None:
        v_star_l = -erp * jnp.minimum(lim_gap, 0.0) / dt
        b = b.at[3 * k:3 * k + n_lim].add(-v_star_l)
    if eq:
        # bilateral rows: J v⁺ = −erp·gap/dt (two-sided gap recovery;
        # loop connect rows first, then weld orientation rows)
        b = b.at[3 * k + n_lim:3 * k + n_lim + eq].add(
            erp * jnp.concatenate(eq_gaps) / dt)

    mu_vec = jnp.broadcast_to(jnp.asarray(mu, q.dtype), (k_feet,))
    if n_coll:
        mu_c = mu if mu_collision is None else mu_collision
        mu_vec = jnp.concatenate([mu_vec, jnp.broadcast_to(
            jnp.asarray(mu_c, q.dtype), (n_coll,))])
    if k > k_feet + n_coll:                    # ground-geom rows
        mu_g = mu if mu_ground is None else mu_ground
        mu_vec = jnp.concatenate([mu_vec, jnp.broadcast_to(
            jnp.asarray(mu_g, q.dtype), (k - k_feet - n_coll,))])
    p_imp = pgs_solve(G, b, mu_vec, active, iters, lim_active=lim_active,
                      implicit_diff=(diff_mode == "implicit"), relax=relax,
                      eq_rows=eq, fric_bound=fr_bound)

    v_new = v_free + MiJt @ p_imp
    p_imp = p_imp[:3 * k]
    vb2, qd2 = v_new[:6], v_new[6:]
    quat2 = quat_mul(quat, quat_exp_body(vb2[:3] * dt))
    quat2 = quat2 / jnp.linalg.norm(quat2)
    pos2 = pos + dt * (quat_to_rot(quat2) @ vb2[3:])
    q2 = q + dt * qd2
    if limits is not None and limit_mode == "project":
        q2, qd2 = project_joint_limits(q2, qd2, limits[0], limits[1])
    return (quat2, pos2, q2, vb2, qd2), p_imp.reshape(k, 3)


def _quat_mul_bl(a, b):
    """(4,B) ⊗ (4,B)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by + ay * bw + az * bx - ax * bz,
        aw * bz + az * bw + ax * by - ay * bx,
    ])


def _quat_exp_bl(w_dt):
    """(3,B) body rotation vectors → (4,B) unit quaternions exp(½·)."""
    half = 0.5 * w_dt
    ang = jnp.sqrt(half[0] ** 2 + half[1] ** 2 + half[2] ** 2 + 1e-30)
    s = jnp.sin(ang) / ang
    return jnp.stack([jnp.cos(ang), s * half[0], s * half[1], s * half[2]])


def _mu_to_bl(mu, k, B, dtype):
    """Friction coefficients to batch-last (k, B): accepts a static scalar,
    a traced scalar, a (k,) per-foot array, or a (B,) / (B, k)
    per-environment array (batch-first user layout). A 1-D array is
    ambiguous when B == k, so that case must be passed as explicit (B, k)
    (fail-fast instead of a silent per-foot reinterpretation)."""
    mu_arr = jnp.asarray(mu, dtype)
    if mu_arr.ndim == 2:                       # (B, k) → (k, B)
        return mu_arr.T
    if mu_arr.ndim == 1:
        if B == k and mu_arr.shape[0] == k:
            raise ValueError(
                f"mu with shape ({k},) is ambiguous when the batch size "
                f"equals the contact count (B == k == {k}): pass an "
                f"explicit (B, {k}) per-environment array or a scalar")
        if mu_arr.shape[0] == B and B != k:    # per-environment
            return jnp.broadcast_to(mu_arr[None, :], (k, B))
        return jnp.broadcast_to(mu_arr[:, None], (k, B))   # per-foot
    return jnp.broadcast_to(mu_arr, (k, B))


def _pgs_sweep_bl(p, G, b, mu, active, lim_active, diag, k: int, m: int,
                  relax: float = 1.0, eq: int = 0, fric=None):
    """Batch-last :func:`_pgs_sweep` — the lane-parallel T(p, θ)."""
    rows = 3 * k + m + eq + (0 if fric is None else fric.shape[0])
    for i in range(k):
        s = 3 * i
        r = matvec_bl(G[s:s + 3], p) + b[s:s + 3]
        cand = p[s:s + 3] - r / diag[s:s + 3]
        pn = jnp.maximum(cand[2], 0.0) * active[i]
        pt0, pt1 = cand[0], cand[1]
        norm_t = jnp.sqrt(pt0 * pt0 + pt1 * pt1 + 1e-30)
        scale = jnp.minimum(1.0, mu[i] * pn / norm_t)
        pnew = jnp.stack([pt0 * scale, pt1 * scale, pn])
        if relax != 1.0:
            pnew = p[s:s + 3] + relax * (pnew - p[s:s + 3])
        p = jnp.concatenate([p[:s], pnew, p[s + 3:]])
    for j in range(m):
        row = 3 * k + j
        r = sum(G[row, c] * p[c] for c in range(rows)) + b[row]
        pj = jnp.maximum(p[row] - r / diag[row], 0.0) * lim_active[j]
        if relax != 1.0:
            pj = p[row] + relax * (pj - p[row])
        p = jnp.concatenate([p[:row], pj[None], p[row + 1:]])
    for j in range(eq):
        # bilateral loop-cut rows: unprojected lane-parallel Gauss-Seidel
        row = 3 * k + m + j
        r = sum(G[row, c] * p[c] for c in range(rows)) + b[row]
        pj = p[row] - r / diag[row]
        if relax != 1.0:
            pj = p[row] + relax * (pj - p[row])
        p = jnp.concatenate([p[:row], pj[None], p[row + 1:]])
    for j in range(0 if fric is None else fric.shape[0]):
        # box (dry-friction) rows: lane-parallel clamp to ±bound
        row = 3 * k + m + eq + j
        r = sum(G[row, c] * p[c] for c in range(rows)) + b[row]
        pj = jnp.clip(p[row] - r / diag[row], -fric[j], fric[j])
        if relax != 1.0:
            pj = p[row] + relax * (pj - p[row])
        p = jnp.concatenate([p[:row], pj[None], p[row + 1:]])
    return p


def pgs_solve_bl(G, b, mu, active, iters: int = 30, lim_active=None,
                 implicit_diff: bool = False, relax: float = 1.0,
                 eq_rows: int = 0, fric_bound=None):
    """Batch-last :func:`pgs_solve`: G (3k,3k,B), b (3k,B), mu (k,) or
    (k,B) — static, traced, or per-environment — active (k,B) →
    impulses (3k,B); every sweep step a lane-parallel op. ``lim_active``
    (m,B) appends m normal-only joint-limit rows (G/b sized 3k+m).
    ``implicit_diff``/``relax`` as in :func:`pgs_solve` (exact fixed-point
    gradients; the IFT system is factored per environment).
    ``eq_rows`` trailing bilateral rows and ``fric_bound`` ((f,) or
    (f, B)) trailing box dry-friction rows as in :func:`pgs_solve`."""
    m = 0 if lim_active is None else lim_active.shape[0]
    f = 0 if fric_bound is None else fric_bound.shape[0]
    k = (b.shape[0] - m - eq_rows - f) // 3
    mu = jnp.asarray(mu, b.dtype)
    rows = 3 * k + m + eq_rows + f
    lim = (jnp.zeros((0,) + b.shape[1:], b.dtype) if lim_active is None
           else lim_active)
    fr = (jnp.zeros((0,) + b.shape[1:], b.dtype) if fric_bound is None
          else jnp.asarray(fric_bound, b.dtype))
    if implicit_diff:
        return _pgs_implicit("bl", k, m, int(eq_rows), int(iters),
                             float(relax), G, b, mu, active, lim, fr)
    diag = jnp.clip(jnp.stack([G[d, d] for d in range(rows)]), 1e-9, None)
    return jax.lax.fori_loop(
        0, iters,
        lambda _, p: _pgs_sweep_bl(p, G, b, mu, active, lim, diag, k, m,
                                   relax, eq_rows, fr),
        jnp.zeros_like(b))


def fb_step_ground_batched(ffm, state, tau, dt, links, offsets, mu=0.8,
                           ground_z=0.0, gravity=-9.81, iters: int = 30,
                           erp: float = 0.2, margin: float = 1e-3,
                           restitution: float = 0.0, impl="auto",
                           limits=None, effort=None,
                           limit_mode: str = "project",
                           diff_mode: str = "unroll", relax: float = 1.0,
                           terrain=None, collision=None, mu_collision=None,
                           ground_geoms=None, mu_ground=None, loops=None,
                           welds=None, f_base=None, frictionloss=None,
                           softness=None, tendons=None):
    """Batched :func:`fb_step_ground`: N independent frictional quadruped
    environments advanced in ONE step program — the massively-parallel
    RL-simulation shape. ``state = (quat (B,4), pos (B,3), q (B,n),
    vb (B,6), qd (B,n))``, ``tau (B,n)``; returns (next_state,
    impulses (B,k,3)). Runs fully batch-last internally (see
    :func:`fb_constrained_fd_batched`); per-environment contact activation
    and cone projection are lane-parallel masks inside the shared PGS.

    ``impl="auto"`` routes the whole step through ONE fused Pallas kernel
    per 128-environment lane tile on TPU
    (:func:`.kernels.contact_fused.step_ground_fused`).

    ``diff_mode="implicit"`` makes the step end-to-end reverse-mode
    differentiable with exact fixed-point (IFT) gradients through the
    cone solve (see :func:`fb_step_ground`); it forces the XLA batch-last
    body (the fused kernel has no AD rule).

    ``terrain``: optional :class:`.terrain.Terrain` heightfield replacing
    the flat plane (see :func:`fb_step_ground`). On TPU it runs the fused
    heightfield kernel (:func:`.kernels.contact_fused.
    step_ground_terrain_fused` — the bilinear lookup as an MXU one-hot
    gather) when the grid fits the VMEM gate, the XLA batch-last body
    otherwise.

    ``collision``: optional :class:`.collision.CollisionModel` appended as
    extra frictional cone triplets per environment (coefficient
    ``mu_collision``, see :func:`fb_step_ground`) — self-collision and
    obstacle contacts for every environment in one lane-parallel PGS.
    Rides the fused kernels when the friction coefficients are static
    python scalars (the kernel bakes geometry + mu as literals); traced
    or per-environment mu falls back to the XLA batch-last body. Impulses
    then cover ``k_feet + collision.n_contacts`` triplets.

    ``ground_geoms``/``mu_ground``: geom-vs-ground cone triplets (capsule
    feet, fallen-torso contact — see :func:`fb_step_ground`); rides the
    fused kernels under the same static-geometry/static-mu condition as
    ``collision``.

    ``loops = (pairs, offsets_a, offsets_b)``: loop-closure cuts as
    bilateral rows in the shared lane-parallel PGS (see
    :func:`fb_step_ground`) — parallel-linkage environments stepping on
    ground; runs the XLA batch-last body.

    ``welds = (pairs, R0)``: weld ORIENTATION rows (3 bilateral rows per
    pair, see :func:`..loops.fb_weld_gap`); the position half of a weld
    rides ``loops=``. Runs the vmap tier (per-state
    :func:`fb_step_ground` under ``jax.vmap``)."""
    quat, pos, q, vb, qd = state
    _check_contacts(ffm.n, links, offsets)
    if effort is not None:
        # composes with every impl (incl. the fused kernel): rewrites tau
        tau = clamp_effort(tau, effort)
    if limit_mode not in ("project", "impulse"):
        raise ValueError(f"limit_mode must be 'project' or 'impulse', "
                         f"got {limit_mode!r}")
    if diff_mode not in ("unroll", "implicit"):
        raise ValueError(f"diff_mode must be 'unroll' or 'implicit', "
                         f"got {diff_mode!r}")
    impulse_limits = limits is not None and limit_mode == "impulse"
    if welds is not None or tendons is not None:
        # weld orientation and tendon-range rows run the vmap tier (the
        # batch-last body has no rows for them)
        mu_arr = jnp.asarray(mu)

        def step1(quat1, pos1, q1, vb1, qd1, tau1, mu1, f1):
            return fb_step_ground(
                ffm, (quat1, pos1, q1, vb1, qd1), tau1, dt, links,
                offsets, mu=mu1, ground_z=ground_z, gravity=gravity,
                iters=iters, erp=erp, margin=margin,
                restitution=restitution, limits=limits,
                limit_mode=limit_mode, diff_mode=diff_mode, relax=relax,
                terrain=terrain, collision=collision,
                mu_collision=mu_collision, ground_geoms=ground_geoms,
                mu_ground=mu_ground, loops=loops, welds=welds, f_base=f1,
                frictionloss=frictionloss, softness=softness,
                tendons=tendons)

        in_axes = (0, 0, 0, 0, 0, 0,
                   0 if mu_arr.ndim == 1 else None,
                   0 if f_base is not None else None)
        return jax.vmap(step1, in_axes=in_axes)(quat, pos, q, vb, qd, tau,
                                                mu_arr, f_base)
    B = q.shape[0]
    n = ffm.n
    k = len(links)
    offsets_raw = offsets                          # pre-jnp, for the kernel
    offsets = jnp.asarray(offsets, q.dtype)
    flat = lambda x: x.T
    quat_bl, pos_bl, q_bl = flat(quat), flat(pos), flat(q)
    vb_bl, qd_bl, tau_bl = flat(vb), flat(qd), flat(tau)
    dtype = q_bl.dtype

    # the fused step kernel has no limit rows — impulse-mode limits run
    # the identical XLA batch-last body below. Collision sets ride the
    # kernel when the friction coefficient AND the geometry are concrete
    # (the kernel bakes both as literals); traced/per-env mu or traced
    # geometry (jax.grad w.r.t. geom placement) falls back to XLA.
    mu_coll_static = (collision is None
                      or (isinstance(mu_collision
                                     if mu_collision is not None else mu,
                                     (int, float))
                          and not any(isinstance(leaf, jax.core.Tracer)
                                      for leaf in jax.tree_util.tree_leaves(
                                          (collision.geoms.a,
                                           collision.geoms.b,
                                           collision.geoms.r,
                                           collision.obstacles)))))
    # ground-geom rows ride the kernel under the same condition as
    # collision sets: static mu_ground + concrete endpoint geometry
    mu_ground_static = (ground_geoms is None
                        or (isinstance(mu_ground
                                       if mu_ground is not None else mu,
                                       (int, float))
                            and not any(isinstance(leaf, jax.core.Tracer)
                                        for leaf in
                                        jax.tree_util.tree_leaves(
                                            (ground_geoms.a, ground_geoms.b,
                                             ground_geoms.r)))))
    # loop-closure cuts ride the kernel when the cut geometry is concrete
    # (baked as literals like offsets); traced offsets (grad w.r.t. the
    # attachment points) fall back to XLA
    loops_concrete = (loops is None
                      or not any(isinstance(leaf, jax.core.Tracer)
                                 for leaf in jax.tree_util.tree_leaves(
                                     (loops[1], loops[2]))))
    # soft contact rides the kernel when the compliance is concrete (baked
    # per-row like the geometry); traced softness (compliance
    # identification) falls back to XLA
    softness_concrete = (softness is None
                         or not any(isinstance(leaf, jax.core.Tracer)
                                    for leaf in
                                    jax.tree_util.tree_leaves(softness)))
    if (_impl_auto(impl, q) == "pallas" and not impulse_limits
            and frictionloss is None
            and diff_mode == "unroll" and relax == 1.0
            and mu_coll_static and mu_ground_static and loops_concrete
            and softness_concrete):
        # the fused kernel bakes offsets as literals (concrete required —
        # the raw argument, before any traced jnp conversion); the XLA
        # path below keeps them traceable
        from .kernels import contact_fused as _cf

        kt = k if collision is None else k + collision.n_contacts
        if ground_geoms is not None:
            from .collision import n_ground_contacts
            kt = kt + n_ground_contacts(ground_geoms)
        mu_bl = _mu_to_bl(mu, k, B, dtype)
        mu_c = (None if collision is None
                else float(mu_collision if mu_collision is not None
                           else mu))
        mu_g = (None if ground_geoms is None
                else float(mu_ground if mu_ground is not None else mu))
        push = None if f_base is None else jnp.asarray(f_base, dtype).T
        soft_np = (None if softness is None
                   else np.asarray(softness, np.float64))
        if terrain is None:
            q2, p2, qq2, vb2, qd2, imp = _cf.step_ground_fused(
                ffm, quat_bl, pos_bl, q_bl, vb_bl, qd_bl, tau_bl, mu_bl,
                dt, links, np.asarray(offsets_raw, np.float64), ground_z,
                gravity, iters, erp, margin, restitution,
                collision=collision, mu_collision=mu_c,
                ground_geoms=ground_geoms, mu_ground=mu_g, loops=loops,
                push=push, softness=soft_np)
        else:
            # heightfield kernel: the MXU one-hot bilinear gather; grids
            # past the VMEM gate run the same body as plain XLA inside
            q2, p2, qq2, vb2, qd2, imp = _cf.step_ground_terrain_fused(
                ffm, quat_bl, pos_bl, q_bl, vb_bl, qd_bl, tau_bl, mu_bl,
                dt, links, np.asarray(offsets_raw, np.float64), terrain,
                gravity, iters, erp, margin, restitution,
                collision=collision, mu_collision=mu_c,
                ground_geoms=ground_geoms, mu_ground=mu_g, loops=loops,
                push=push, softness=soft_np)
        if limits is not None:
            qq2, qd2 = project_joint_limits(qq2, qd2, limits[0][:, None],
                                            limits[1][:, None])
        nxt = (q2.T, p2.T, qq2.T, vb2.T, qd2.T)
        return nxt, jnp.moveaxis(imp, 0, -1).reshape(B, kt, 3)

    from .blops import joint_transforms_bl
    X = joint_transforms_bl(ffm.arm, q_bl)
    R = _quat_to_rot_bl(quat_bl)
    p_b, c_j = _fb_bias_bl(ffm, X, R, vb_bl, qd_bl, gravity)
    if f_base is not None:
        p_b = p_b - jnp.asarray(f_base, dtype).T
    M = _fb_mass_matrix_bl(ffm, X)
    Lm = chol_factor_bl(M)
    v = jnp.concatenate([vb_bl, qd_bl])
    v_free = v + dt * chol_apply_bl(
        Lm, jnp.concatenate([-p_b, tau_bl - c_j]))

    J, x_b = _fb_contact_rows_bl(ffm, quat_bl, q_bl, links, offsets)
    # world foot positions (batch-last per component) and activation
    p_w = [jnp.stack([pos_bl[c] + sum(R[c, j] * x_b[3 * i + j]
                                      for j in range(3))
                      for c in range(3)])                     # (3, B)
           for i in range(k)]
    if terrain is None:
        gaps = jnp.stack([p_w[i][2] - ground_z for i in range(k)])
    else:
        from .terrain import contact_frame, terrain_surface
        gap_rows = []
        J_rows = []
        for i in range(k):
            h, nrm = terrain_surface(terrain, p_w[i][0], p_w[i][1])
            gap_rows.append((p_w[i][2] - h) * nrm[2])
            C = contact_frame(nrm)                            # (3, 3, B)
            for r in range(3):
                J_rows.append(sum(C[r, c][None, :] * J[3 * i + c]
                                  for c in range(3)))
        gaps = jnp.stack(gap_rows)
        J = jnp.stack(J_rows)
    k_feet = k
    n_coll = 0
    if collision is not None:
        from .collision import fb_collision_rows_bl
        c_gaps, c_J = fb_collision_rows_bl(ffm, quat_bl, pos_bl, q_bl,
                                           collision)
        J = jnp.concatenate([J, c_J], axis=0)
        gaps = jnp.concatenate([gaps, c_gaps], axis=0)
        n_coll = collision.n_contacts
        k = k + n_coll
    if ground_geoms is not None:
        from .collision import fb_ground_geom_rows_bl
        g_gaps, g_J = fb_ground_geom_rows_bl(ffm, quat_bl, pos_bl, q_bl,
                                             ground_geoms,
                                             ground_z=ground_z,
                                             terrain=terrain)
        J = jnp.concatenate([J, g_J], axis=0)
        gaps = jnp.concatenate([gaps, g_gaps], axis=0)
        k = k + g_gaps.shape[0]
    active = (gaps < margin).astype(dtype)

    lim_active = None
    if impulse_limits:
        # normal-only limit rows: direction −s·e_{6+j} (see fb_step_ground)
        lo = jnp.asarray(limits[0], dtype)[:, None]
        hi = jnp.asarray(limits[1], dtype)[:, None]
        lim_margin = 10.0 * margin
        s_hi = (q_bl > hi - lim_margin)
        s_lo = (q_bl < lo + lim_margin)
        sign = s_hi.astype(dtype) - s_lo.astype(dtype)
        lim_active = (s_hi | s_lo).astype(dtype)
        lim_gap = jnp.where(s_lo, q_bl - lo, hi - q_bl)
        lim_gap = jnp.where(jnp.isfinite(lim_gap), lim_gap,
                            jnp.ones_like(lim_gap))
        zero_row = jnp.zeros((6 + n, B), dtype)
        J_l = [zero_row.at[6 + j].set(-sign[j]) for j in range(n)]
        J = jnp.concatenate([J, jnp.stack(J_l)], axis=0)
    n_lim = J.shape[0] - 3 * k
    eq = 0
    if loops is not None:
        from .kinematics import _mv3
        from .loops import _check_fb_pairs, _fb_loop_rows_bl
        lpairs, loa, lob = loops
        lpairs = _check_fb_pairs(n, lpairs, loa, lob)
        loa_j = jnp.asarray(loa, dtype)
        lob_j = jnp.asarray(lob, dtype)
        J_loop, xas, xbs = _fb_loop_rows_bl(ffm, quat_bl, q_bl, lpairs,
                                            loa_j, lob_j)
        gap_rows = []
        for i in range(len(lpairs)):
            if xbs[i] is not None:             # link↔link: pos cancels
                gap_rows.append(_mv3(R, xas[i] - xbs[i]))
            else:                              # world pair: vs anchor
                gap_rows.append(pos_bl + _mv3(R, xas[i])
                                - lob_j[i][:, None])
        gap_loop = jnp.concatenate(gap_rows)   # (3·k_loop, B)
        J = jnp.concatenate([J, J_loop], axis=0)
        eq = J_loop.shape[0]
    fr_bound = None
    if frictionloss is not None:
        # joint dry friction (see fb_step_ground): box rows selecting the
        # joint velocities, bound = loss·dt
        if isinstance(frictionloss, jax.core.Tracer):
            fsel = list(range(n))
            fl = jnp.asarray(frictionloss, dtype)
        else:
            fl_np = np.asarray(frictionloss, np.float64)
            fsel = [int(i) for i in np.nonzero(fl_np)[0]]
            fl = jnp.asarray(fl_np[fsel], dtype)
        if fsel:
            zero_row = jnp.zeros((6 + n, B), dtype)
            J_f = [zero_row.at[6 + j].set(1.0) for j in fsel]
            J = jnp.concatenate([J, jnp.stack(J_f)], axis=0)
            fr_bound = (fl * dt)[:, None]
    rows = J.shape[0]
    MiJt_cols = [chol_apply_bl(Lm, J[r]) for r in range(rows)]
    G = jnp.stack([
        jnp.stack([sum(J[r, c] * MiJt_cols[s][c] for c in range(6 + n))
                   for s in range(rows)])
        for r in range(rows)]) + 1e-9 * jnp.eye(rows, dtype=dtype)[..., None]
    if softness is not None:
        # compliant contact (see soft_contact_params): per-row Delassus
        # compliance on the cone triplets
        idx = jnp.arange(3 * k)
        G = G.at[idx, idx, :].add(_softness_rows(softness, k,
                                                 dtype)[:, None])
    Jv = jnp.stack([sum(J[r, c] * v[c] for c in range(6 + n))
                    for r in range(3 * k)])
    Jvf = jnp.stack([sum(J[r, c] * v_free[c] for c in range(6 + n))
                     for r in range(rows)])
    vn_now = jnp.stack([Jv[3 * i + 2] for i in range(k)])
    v_star = (-erp * jnp.minimum(gaps, 0.0) / dt
              - restitution * jnp.minimum(vn_now, 0.0))
    b = Jvf
    b = jnp.concatenate(
        [jnp.concatenate([b[3 * i:3 * i + 2],
                          (b[3 * i + 2] - v_star[i])[None]])
         for i in range(k)]
        + ([b[3 * k:3 * k + n_lim]
            + erp * jnp.minimum(lim_gap, 0.0) / dt]
           if impulse_limits else [])
        + ([b[3 * k + n_lim:3 * k + n_lim + eq] + erp * gap_loop / dt]
           if eq else [])
        + ([b[3 * k + n_lim + eq:]] if fr_bound is not None else []))

    mu_bl = _mu_to_bl(mu, k_feet, B, dtype)
    if n_coll:
        mu_c = mu if mu_collision is None else mu_collision
        mu_bl = jnp.concatenate(
            [mu_bl, _mu_to_bl(mu_c, n_coll, B, dtype)], axis=0)
    if k > k_feet + n_coll:                    # ground-geom rows
        mu_g = mu if mu_ground is None else mu_ground
        mu_bl = jnp.concatenate(
            [mu_bl, _mu_to_bl(mu_g, k - k_feet - n_coll, B, dtype)],
            axis=0)
    p_imp = pgs_solve_bl(G, b, mu_bl, active, iters,
                         lim_active=lim_active,
                         implicit_diff=(diff_mode == "implicit"),
                         relax=relax, eq_rows=eq, fric_bound=fr_bound)

    v_new = v_free + sum(MiJt_cols[s] * p_imp[s][None, :]
                         for s in range(rows))
    p_imp = p_imp[:3 * k]
    vb2, qd2 = v_new[:6], v_new[6:]
    quat2 = _quat_mul_bl(quat_bl, _quat_exp_bl(vb2[:3] * dt))
    quat2 = quat2 / jnp.sqrt(jnp.sum(quat2 * quat2, axis=0))
    R2 = _quat_to_rot_bl(quat2)
    pos2 = pos_bl + dt * jnp.stack([
        sum(R2[i, j] * vb2[3 + j] for j in range(3)) for i in range(3)])
    q2 = q_bl + dt * qd2
    if limits is not None and limit_mode == "project":
        q2, qd2 = project_joint_limits(q2, qd2, limits[0][:, None],
                                       limits[1][:, None])
    nxt = (quat2.T, pos2.T, q2.T, vb2.T, qd2.T)
    return nxt, jnp.moveaxis(p_imp, 0, -1).reshape(B, k, 3)


def fb_simulate_ground(ffm, state0, taus, dt, links, offsets, mu=0.8,
                       ground_z=0.0, gravity=-9.81, iters: int = 30,
                       erp: float = 0.2, margin: float = 1e-3,
                       restitution: float = 0.0, terrain=None, loops=None):
    """``lax.scan`` rollout of :func:`fb_step_ground` — a full frictional
    ground-contact simulation in one device dispatch."""
    def step(s, tau):
        nxt, imp = fb_step_ground(ffm, s, tau, dt, links, offsets, mu,
                                  ground_z, gravity, iters, erp, margin,
                                  restitution, terrain=terrain, loops=loops)
        return nxt, (nxt, imp)

    return jax.lax.scan(step, state0, taus)


def fb_simulate_ground_batched(ffm, state0, taus, dt, links, offsets,
                               mu=0.8, ground_z=0.0, gravity=-9.81,
                               iters: int = 30, erp: float = 0.2,
                               margin: float = 1e-3,
                               restitution: float = 0.0, impl="auto",
                               terrain=None, collision=None,
                               mu_collision=None, ground_geoms=None,
                               mu_ground=None, loops=None, f_bases=None):
    """``lax.scan`` rollout of :func:`fb_step_ground_batched` — T steps of
    N frictional environments in ONE device dispatch (the RL-training
    inner loop; on TPU each step is one fused Pallas kernel per lane
    tile). ``state0 = (quat (B,4), pos (B,3), q (B,n), vb (B,6),
    qd (B,n))``, ``taus (T, B, n)``. Returns (final state, per-step
    impulse stacks (T, B, k, 3)); ``terrain=``/``collision=``/
    ``ground_geoms=`` pass through to every step. ``f_bases``: optional
    (T, B, 6) per-step external base wrenches (push-perturbation
    schedules for robustness training)."""
    def step(s, x):
        tau, f_base = x
        nxt, imp = fb_step_ground_batched(
            ffm, s, tau, dt, links, offsets, mu, ground_z, gravity, iters,
            erp, margin, restitution, impl=impl, terrain=terrain,
            collision=collision, mu_collision=mu_collision,
            ground_geoms=ground_geoms, mu_ground=mu_ground, loops=loops,
            f_base=f_base)
        return nxt, imp

    return jax.lax.scan(step, state0, (taus, f_bases))


def fb_simulate_constrained(ffm, state0, taus, dt, links, offsets,
                            anchors=None, gravity=-9.81,
                            baumgarte=(10.0, 10.0), reg=0.0):
    """``lax.scan`` stance rollout of the free-flyer
    (``state = (quat, pos, q, vb, qd)``, semi-implicit manifold stepping —
    same integrator as :func:`..freeflyer.fb_step`). Returns the final
    state and per-step (state, λ) stacks."""
    from .freeflyer import quat_exp_body, quat_mul, quat_to_rot

    def step(state, tau):
        quat, pos, q, vb, qd = state
        dvb, qdd, lam = fb_constrained_forward_dynamics(
            ffm, quat, pos, q, vb, qd, tau, links, offsets, anchors,
            gravity, baumgarte, reg)
        vb = vb + dt * dvb
        qd = qd + dt * qdd
        quat = quat_mul(quat, quat_exp_body(vb[:3] * dt))
        quat = quat / jnp.linalg.norm(quat)
        pos = pos + dt * (quat_to_rot(quat) @ vb[3:])
        q = q + dt * qd
        nxt = (quat, pos, q, vb, qd)
        return nxt, (nxt, lam)

    return jax.lax.scan(step, state0, taus)
