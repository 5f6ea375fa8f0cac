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

All functions are single-state, trace-time specialized to the (static) list
of contact links, jit/vmap-friendly, and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.robot import RobotModel
from .fd import forward_dynamics
from .kinematics import fk, point_bias_acceleration, world_jacobian
from .minv import densify, minv_inner
from .rnea import rnea_bwd, rnea_fwd


def contact_jacobian(model: RobotModel, q, links, offsets):
    """Stacked world *linear* point Jacobian (3k, n) for k contact points
    (``links``: static tuple of link indices; ``offsets``: (k, 3) body-frame
    attachment points)."""
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
