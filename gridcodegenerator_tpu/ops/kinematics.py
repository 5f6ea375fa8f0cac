"""Forward kinematics and world-frame point Jacobians.

The reference has no kinematics layer (its `Xmat` machinery exists only to
feed the dynamics recursions, ``/root/reference/helpers/_topology_helpers.py``)
— this module is the capability step a *constrained*-dynamics layer needs
(:mod:`.contact`): world poses of every link frame, the 6×n world Jacobian of
any point rigidly attached to a link, and its classical bias acceleration
J̇q̇.

Conventions (match :mod:`..models.robot` / the golden model
``utils/golden.py::GoldenDynamics.fk``):
  * link frame i = the child frame of joint i, origin on joint i's axis;
  * ``X_i`` is the child←parent *motion* transform ``[[E,0],[−E·r̂,E]]``, so
    the parent-frame joint pose is recovered as ``E = X[:3,:3]``,
    ``r = unskew(−Eᵀ·X[3:,:3])``;
  * Jacobians are world-frame, rows ``[ω; v_point]`` (angular first, like
    every spatial vector in the engine).

Everything is trace-time unrolled over the kinematic tree (the same
specialization strategy as the dynamics recursions), jit/vmap-friendly, and
differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.robot import RobotModel


def _unskew(S):
    return jnp.stack([S[..., 2, 1], S[..., 0, 2], S[..., 1, 0]], axis=-1)


def fk(model: RobotModel, q):
    """World pose of every moving link frame.

    Args:
      q: (n,) joint positions (single state; ``vmap`` for batches).
    Returns:
      (R, p): (n, 3, 3) world←link rotations and (n, 3) world origins.
    """
    topo = model.topology
    n = topo.n
    X = model.joint_transforms(q)
    Rs = [None] * n
    ps = [None] * n
    for i in range(n):
        E = X[i, :3, :3]                    # child ← parent rotation
        r = _unskew(-E.T @ X[i, 3:, :3])    # joint origin in parent coords
        p = topo.parents[i]
        Rp = jnp.eye(3, dtype=q.dtype) if p < 0 else Rs[p]
        pp = jnp.zeros(3, q.dtype) if p < 0 else ps[p]
        Rs[i] = Rp @ E.T
        ps[i] = pp + Rp @ r
    return jnp.stack(Rs), jnp.stack(ps)


def point_position(model: RobotModel, q, link: int, offset):
    """World position of a point rigidly attached to ``link`` at body-frame
    ``offset`` (3,)."""
    R, p = fk(model, q)
    return p[link] + R[link] @ offset


def world_jacobian(model: RobotModel, q, link: int, offset):
    """World-frame 6×n Jacobian of the attached point: ``[ω; v_pt] = J q̇``.

    Column j is nonzero iff joint j is ``link`` itself or an ancestor:
    revolute — ``[a_w; a_w × (x_pt − p_j)]`` with ``a_w`` the world axis;
    prismatic — ``[0; a_w]``. (Static topology: the column set is resolved at
    trace time, like every sparsity decision in the engine — the reference's
    ``get_is_ancestor_of`` specialization,
    ``_inverse_dynamics_gradient.py:620``.)
    """
    topo = model.topology
    n = topo.n
    R, p = fk(model, q)
    x = p[link] + R[link] @ jnp.asarray(offset, q.dtype)
    support = set(topo.ancestors[link]) | {link}
    cols = []
    for j in range(n):
        if j not in support:
            cols.append(jnp.zeros(6, q.dtype))
            continue
        a_ang = R[j] @ model.S[j, :3]
        a_lin = R[j] @ model.S[j, 3:]
        # general fixed-axis joint: ω-col = a_ang, v-col = a_ang×(x−p_j)+a_lin
        cols.append(jnp.concatenate(
            [a_ang, jnp.cross(a_ang, x - p[j]) + a_lin]))
    return jnp.stack(cols, axis=1)


def point_velocity(model: RobotModel, q, qd, link: int, offset):
    """World linear velocity of the attached point (3,)."""
    return (world_jacobian(model, q, link, offset) @ qd)[3:]


def point_bias_acceleration(model: RobotModel, q, qd, link: int, offset):
    """Classical bias acceleration J̇q̇ of the attached point (6,): the
    world acceleration ``[ω̇; ẍ_pt]`` at q̈ = 0. Computed as the exact
    forward-mode derivative of ``J(q)·q̇`` along q̇ — one jvp through the
    trace-unrolled FK, which XLA fuses with the primal."""
    import jax

    def vel(q_):
        return world_jacobian(model, q_, link, offset) @ qd

    _, jdqd = jax.jvp(vel, (q,), (qd,))
    return jdqd
