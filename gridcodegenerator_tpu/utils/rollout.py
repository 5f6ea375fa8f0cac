"""Batched trajectory rollout (the reference's serving use case).

The reference's batch axis exists to serve trajectory-optimization /
DDP inner loops over ``NUM_TIMESTEPS`` states
(``/root/reference/helpers/_code_generation_helpers.py:41-47``). This module
closes that loop: jitted, ``lax.scan``-based forward simulation of whole
batches of trajectories with the framework's forward dynamics, plus the
linearized dynamics along a trajectory (the ∇FD consumers' access pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.robot import RobotModel
from ..ops import fd as fd_ops


def _deriv(model, q, qd, u, gravity):
    # forward_dynamics_diff: identical primal, analytic custom VJP — so
    # jax.grad through a whole rollout back-propagates with the closed-form
    # ∂q̈/∂(q, q̇, u) at every step instead of reverse-mode through the
    # unrolled recursions (far smaller backward graph).
    return qd, fd_ops.forward_dynamics_diff(model, q, qd, u, gravity)


def _step_rk4(model, q, qd, u, dt, gravity):
    k1q, k1v = _deriv(model, q, qd, u, gravity)
    k2q, k2v = _deriv(model, q + 0.5 * dt * k1q, qd + 0.5 * dt * k1v, u, gravity)
    k3q, k3v = _deriv(model, q + 0.5 * dt * k2q, qd + 0.5 * dt * k2v, u, gravity)
    k4q, k4v = _deriv(model, q + dt * k3q, qd + dt * k3v, u, gravity)
    return (q + dt / 6 * (k1q + 2 * k2q + 2 * k3q + k4q),
            qd + dt / 6 * (k1v + 2 * k2v + 2 * k3v + k4v))


def _step_semi_implicit(model, q, qd, u, dt, gravity):
    qdd = fd_ops.forward_dynamics_diff(model, q, qd, u, gravity)
    qd2 = qd + dt * qdd
    return q + dt * qd2, qd2


_STEPPERS = {"rk4": _step_rk4, "semi_implicit": _step_semi_implicit}


# jit cache keyed on model identity: the model is CLOSED OVER (concrete
# arrays), not passed as a traced jit argument — that keeps the analytic
# custom VJP in the steppers well-formed (a custom_vjp closing over tracers
# is ill-defined) and avoids retracing on repeat calls. The cache holds a
# strong reference to each model so ids cannot be recycled.
_SIM_CACHE: dict = {}


def simulate(model: RobotModel, q0, qd0, u_traj, *, dt: float,
             gravity: float = -9.81, method: str = "rk4", steps=None):
    """Roll out dynamics under a torque trajectory.

    Args:
      q0, qd0: initial state, shape (..., n) — any batch shape.
      u_traj: torques, shape (T, ..., n) (per step) or (..., n) (constant;
        requires ``steps``).
    Returns:
      (q_traj, qd_traj): each (T, ..., n) — states *after* each step.

    ``jax.grad`` through a rollout back-propagates with the analytic
    closed-form ∂q̈/∂(q, q̇, u) per step (see ``ops/fd.py::
    forward_dynamics_diff``), not reverse-mode through the recursions.
    """
    if u_traj.ndim == q0.ndim:
        if steps is None:
            raise ValueError("constant torque input requires steps=")
        u_traj = jnp.broadcast_to(u_traj, (steps,) + u_traj.shape)

    key = (id(model), float(dt), float(gravity), method, q0.ndim)
    if key not in _SIM_CACHE:
        step = _STEPPERS[method]

        @jax.jit
        def _sim(q0, qd0, u_traj):
            stepper = lambda a, b, c: step(model, a, b, c, dt, gravity)
            for _ in range(q0.ndim - 1):
                stepper = jax.vmap(stepper)

            def body(carry, u):
                q2, qd2 = stepper(*carry, u)
                return (q2, qd2), (q2, qd2)

            _, (q_traj, qd_traj) = jax.lax.scan(body, (q0, qd0), u_traj)
            return q_traj, qd_traj

        _SIM_CACHE[key] = (model, _sim)
    return _SIM_CACHE[key][1](q0, qd0, u_traj)


@functools.partial(jax.jit, static_argnames=("dt", "gravity"))
def linearize_trajectory(model: RobotModel, q_traj, qd_traj, u_traj, *,
                         dt: float, gravity: float = -9.81):
    """Discrete-time linearization along a trajectory (the DDP/iLQR inner
    loop the analytic ∇FD exists for): for an Euler-discretized step
    ``x⁺ = [q + dt·q̇ ; q̇ + dt·q̈]``, returns (A, B) with
    ``A = ∂x⁺/∂x`` (..., 2n, 2n) and ``B = ∂x⁺/∂u`` (..., 2n, n)."""
    from ..ops import fd_grad as fdg
    from ..ops import minv as minv_ops

    n = q_traj.shape[-1]

    def one(q, qd, u):
        J = fdg.forward_dynamics_gradient(model, q, qd, u, gravity)  # (n, 2n)
        Minv = minv_ops.direct_minv(model, q, dense=True)
        I = jnp.eye(n, dtype=q.dtype)
        A = jnp.block([
            [I, dt * I],
            [dt * J[:, :n], I + dt * J[:, n:]],
        ])
        B = jnp.concatenate([jnp.zeros((n, n), q.dtype), dt * Minv])
        return A, B

    flat = lambda x: x.reshape(-1, n)
    A, B = jax.vmap(one)(flat(q_traj), flat(qd_traj), flat(u_traj))
    lead = q_traj.shape[:-1]
    return A.reshape(lead + (2 * n, 2 * n)), B.reshape(lead + (2 * n, n))
