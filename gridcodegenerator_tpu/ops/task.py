"""Operational-space (task-space) dynamics and control.

The reference stops at joint-space quantities (the five algorithm families,
``/root/reference/GRiDCodeGenerator.py:299-303``); every controller built on
GRiD-style engines composes them into *task-space* operators — the Khatib
operational-space formulation. This module provides those compositions on the
engine's own primitives (world Jacobians from :mod:`.kinematics`, M⁻¹ from
:mod:`.minv`, bias from :mod:`.rnea`), single-state and differentiable, so
``vmap``/``jit``/``grad`` all apply.

Quantities (J is the m×n task Jacobian, m = 3 position-only or 6 full):
  * task-space inertia      Λ = (J M⁻¹ Jᵀ)⁻¹
  * dynamically consistent  J̄ = M⁻¹ Jᵀ Λ      (the generalized inverse that
    pseudo-inverse                               minimizes kinetic energy)
  * nullspace projector     N = I − J̄ J        (configuration space; its
                                                 transpose filters torques)
  * OSC torque              τ = Jᵀ Λ (a_des − J̇q̇) + Nᵀ τ₀ + c(q, q̇)

With that τ, the closed loop achieves ẍ_task = a_des *exactly* (for any
posture torque τ₀: J M⁻¹ Nᵀ = 0 by construction), which is what the tests
pin via the engine's forward dynamics.

All functions take a static ``link``/``offset`` task frame (trace-time
specialization, like every topology decision in the engine) and ``rows``
selecting the task rows: ``"pos"`` (3 linear rows), ``"rot"`` (3 angular
rows) or ``"full"`` (6). Batched wrappers vmap over the state only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.robot import RobotModel
from . import kinematics as kin
from .minv import direct_minv
from .rnea import inverse_dynamics


def _rows_slice(rows: str):
    if rows == "pos":
        return slice(3, 6)
    if rows == "rot":
        return slice(0, 3)
    if rows == "full":
        return slice(0, 6)
    raise ValueError(f"rows must be 'pos' | 'rot' | 'full', got {rows!r}")


def task_jacobian(model: RobotModel, q, link: int, offset, rows: str = "pos"):
    """Task Jacobian J (m×n): the selected world-frame rows of the attached
    point's 6×n Jacobian (:func:`.kinematics.world_jacobian`)."""
    return kin.world_jacobian(model, q, link, offset)[_rows_slice(rows)]


def task_bias_acceleration(model: RobotModel, q, qd, link: int, offset,
                           rows: str = "pos"):
    """J̇q̇ restricted to the task rows (m,)."""
    return kin.point_bias_acceleration(model, q, qd, link, offset)[
        _rows_slice(rows)]


def task_space_inertia(model: RobotModel, q, link: int, offset,
                       rows: str = "pos", reg: float = 0.0):
    """Λ = (J M⁻¹ Jᵀ + reg·I)⁻¹ (m×m), with the auxiliaries every consumer
    needs anyway.

    Returns:
      (Λ, J, Minv): task-space inertia, task Jacobian, dense M⁻¹.

    ``reg`` > 0 Tikhonov-regularizes through singularities (at a singular
    configuration J loses rank and Λ blows up; the regularized operator
    stays finite at the cost of exactness along the lost direction).
    """
    J = task_jacobian(model, q, link, offset, rows)
    Minv = direct_minv(model, q, dense=True)
    JMJt = J @ Minv @ J.T
    if reg:
        JMJt = JMJt + reg * jnp.eye(J.shape[0], dtype=q.dtype)
    # m ∈ {3, 6}: a dense solve against I is the factorization XLA fuses best
    lam = jnp.linalg.solve(JMJt, jnp.eye(J.shape[0], dtype=q.dtype))
    return lam, J, Minv


def dynamically_consistent_pinv(model: RobotModel, q, link: int, offset,
                                rows: str = "pos", reg: float = 0.0):
    """J̄ = M⁻¹ Jᵀ Λ (n×m) and the nullspace projector N = I − J̄J (n×n)."""
    lam, J, Minv = task_space_inertia(model, q, link, offset, rows, reg)
    Jbar = Minv @ J.T @ lam
    N = jnp.eye(model.n, dtype=q.dtype) - Jbar @ J
    return Jbar, N


def osc_torque(model: RobotModel, q, qd, u_posture, acc_des, link: int,
               offset, rows: str = "pos", gravity: float = -9.81,
               reg: float = 0.0):
    """Operational-space control torque (n,).

    ``τ = Jᵀ Λ (a_des − J̇q̇) + Nᵀ u_posture + c(q, q̇)``: feeds the desired
    task acceleration exactly, compensates the full joint-space bias
    (gravity + Coriolis + damping via the engine's RNEA), and filters the
    posture torque through the dynamically consistent nullspace so it cannot
    disturb the task.
    """
    lam, J, Minv = task_space_inertia(model, q, link, offset, rows, reg)
    jdqd = task_bias_acceleration(model, q, qd, link, offset, rows)
    c = inverse_dynamics(model, q, qd, None, gravity)
    F = lam @ (acc_des - jdqd)
    Jbar = Minv @ J.T @ lam
    Nt = jnp.eye(model.n, dtype=q.dtype) - J.T @ Jbar.T
    return J.T @ F + Nt @ u_posture + c


def task_pd_acceleration(x, xd, x_des, xd_des, kp, kd):
    """The standard task-space PD law a_des = kp·(x* − x) + kd·(ẋ* − ẋ):
    a convenience for driving :func:`osc_torque` to a setpoint."""
    kp = jnp.asarray(kp, x.dtype)
    kd = jnp.asarray(kd, x.dtype)
    return kp * (x_des - x) + kd * (xd_des - xd)


# --------------------------------------------------------------------- batch

@functools.partial(jax.jit,
                   static_argnames=("link", "rows", "reg", "gravity"))
def _osc_batched(model, q, qd, u0, a_des, offset, link, rows, gravity, reg):
    f = lambda q_, qd_, u_, a_: osc_torque(model, q_, qd_, u_, a_, link,
                                           offset, rows, gravity, reg)
    for _ in range(jnp.ndim(q) - 1):
        f = jax.vmap(f)
    return f(q, qd, u0, a_des)


def osc_torque_batched(model: RobotModel, q, qd, u_posture, acc_des,
                       link: int, offset, rows: str = "pos",
                       gravity: float = -9.81, reg: float = 0.0):
    """Batched :func:`osc_torque`: any leading batch shape on
    (q, qd, u_posture, acc_des); the task frame is shared."""
    return _osc_batched(model, q, qd, u_posture, acc_des,
                        jnp.asarray(offset), link, rows, float(gravity),
                        float(reg))
