"""Differentiable inverse kinematics (damped least squares).

The reference engine family (GRiD) feeds trajectory optimizers and RL loops
that need the inverse map as well as the forward one; this module closes that
loop on the engine's own FK/Jacobian layer (:mod:`.kinematics`).

Solver: damped-least-squares (Levenberg–Marquardt) iteration
``dq = Jᵀ (J Jᵀ + λ² I)⁻¹ e`` with a fixed trip count inside
``lax.fori_loop`` — static control flow, so the whole solve jits, vmaps
over seed/target batches, and differentiates (implicitly, through the
unrolled fixed-point — exact at convergence for the position residual).

Targets: a world point (:func:`ik_point`, 3-dof residual) or a full frame
pose (:func:`ik_frame`, 6-dof residual with the SO(3) log-map orientation
error). Joint limits clamp each iterate when provided (the URDF-parsed
``q_lower``/``q_upper`` from :class:`..models.urdf.RobotDescription`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.robot import RobotModel
from . import kinematics as kin


def rotation_log(R):
    """SO(3) log map: the rotation vector θ·axis of a rotation matrix (3,).

    Safe at θ → 0 (series for θ/sinθ); the θ → π antipode is outside the
    contraction region of an IK iteration anyway and is left to the
    clamped arccos.
    """
    w = 0.5 * jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                         R[1, 0] - R[0, 1]])            # sinθ · axis
    cos_t = jnp.clip(0.5 * (jnp.trace(R) - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)
    factor = jnp.where(sin_t > 1e-7, theta / jnp.where(sin_t > 1e-7, sin_t, 1.0),
                       1.0 + theta * theta / 6.0)
    return factor * w


def _dls_step(J, e, damping, dtype):
    """One damped-least-squares update: Jᵀ (J Jᵀ + λ² I)⁻¹ e. The normal
    matrix is m×m (m ∈ {3, 6}) — a tiny dense solve XLA keeps on registers."""
    m = J.shape[0]
    A = J @ J.T + (damping * damping) * jnp.eye(m, dtype=dtype)
    return J.T @ jnp.linalg.solve(A, e)


def _clamp(q, limits):
    if limits is None:
        return q
    lo, hi = limits
    return jnp.clip(q, lo, hi)


def ik_point(model: RobotModel, q0, target, link: int, offset, *,
             iters: int = 64, damping: float = 1e-4, step: float = 1.0,
             limits=None):
    """Solve FK(q)[link, offset] = target (world point, (3,)).

    Returns ``(q, err)``: the iterate after ``iters`` damped-least-squares
    steps and its final residual norm. Fixed trip count — jit/vmap/grad all
    apply; check ``err`` for convergence (a scalar per solve).
    """
    offset = jnp.asarray(offset, q0.dtype)
    target = jnp.asarray(target, q0.dtype)

    def body(_, q):
        x = kin.point_position(model, q, link, offset)
        J = kin.world_jacobian(model, q, link, offset)[3:]
        dq = _dls_step(J, target - x, damping, q.dtype)
        return _clamp(q + step * dq, limits)

    q = jax.lax.fori_loop(0, iters, body, q0)
    err = jnp.linalg.norm(target - kin.point_position(model, q, link, offset))
    return q, err


def ik_frame(model: RobotModel, q0, R_target, p_target, link: int,
             offset, *, iters: int = 64, damping: float = 1e-4,
             step: float = 1.0, limits=None):
    """Solve the full pose task: link frame → (R_target, p_target), with the
    point task anchored at body-frame ``offset``.

    Residual is the world-frame twist error ``[log(R* Rᵀ); p* − x]`` against
    the 6×n world Jacobian. Returns ``(q, err)`` with ``err`` the final
    6-residual norm (orientation part in radians).
    """
    offset = jnp.asarray(offset, q0.dtype)
    R_target = jnp.asarray(R_target, q0.dtype)
    p_target = jnp.asarray(p_target, q0.dtype)

    def residual(q):
        R, p = kin.fk(model, q)
        e_rot = rotation_log(R_target @ R[link].T)
        e_pos = p_target - (p[link] + R[link] @ offset)
        return jnp.concatenate([e_rot, e_pos])

    def body(_, q):
        e = residual(q)
        J = kin.world_jacobian(model, q, link, offset)
        dq = _dls_step(J, e, damping, q.dtype)
        return _clamp(q + step * dq, limits)

    q = jax.lax.fori_loop(0, iters, body, q0)
    return q, jnp.linalg.norm(residual(q))


# --------------------------------------------------------------------- batch

@functools.partial(
    jax.jit, static_argnames=("link", "iters", "damping", "step",
                              "has_limits"))
def _ik_point_batched(model, q0, target, offset, lo, hi, link, iters,
                      damping, step, has_limits):
    lim = (lo, hi) if has_limits else None
    f = lambda q_, t_: ik_point(model, q_, t_, link, offset, iters=iters,
                                damping=damping, step=step, limits=lim)
    for _ in range(jnp.ndim(q0) - 1):
        f = jax.vmap(f)
    return f(q0, target)


def ik_point_batched(model: RobotModel, q0, target, link: int, offset, *,
                     iters: int = 64, damping: float = 1e-4,
                     step: float = 1.0, limits=None):
    """Batched :func:`ik_point`: any leading batch shape on (q0, target) —
    many seeds, many targets, or both. One jitted solve, vmapped."""
    dtype = jnp.asarray(q0).dtype
    has_limits = limits is not None
    if has_limits:
        lo = jnp.asarray(limits[0], dtype)
        hi = jnp.asarray(limits[1], dtype)
    else:
        lo = hi = jnp.zeros((), dtype)
    return _ik_point_batched(model, q0, jnp.asarray(target, dtype),
                             jnp.asarray(offset, dtype), lo, hi, link,
                             int(iters), float(damping), float(step),
                             has_limits)
