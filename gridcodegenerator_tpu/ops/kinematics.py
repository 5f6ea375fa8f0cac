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


# --------------------------------------------------------------------------
# Batch-last kinematics (the TPU production layout)
# --------------------------------------------------------------------------
# Batch-FIRST kinematics under vmap puts the (3,3) structure dims on the
# (8,128) register tile — 97% lane waste; measured on the v5e, the vmapped
# contact Jacobian alone cost 50× more than the entire fused FD+M⁻¹
# (91 ms vs 1.7 ms at batch 262k). These batch-LAST forms keep the batch on
# the lanes (every op full-width), exactly like ops/blops.py.

def _mm33(A, B, tA=False, tB=False):
    """(3,3,B) @ (3,3,B), unrolled into 27 lane-width FMAs — a trailing-
    batch einsum/dot_general here makes XLA transpose to per-state 3×3
    matmuls (97% register waste; measured 70+ ms for one batch-262k FK)."""
    a = (lambda i, j: A[j, i]) if tA else (lambda i, j: A[i, j])
    b = (lambda i, j: B[j, i]) if tB else (lambda i, j: B[i, j])
    return jnp.stack([
        jnp.stack([a(i, 0) * b(0, j) + a(i, 1) * b(1, j) + a(i, 2) * b(2, j)
                   for j in range(3)])
        for i in range(3)])


def _mv3(A, x, tA=False):
    """(3,3,B) @ (3,B), unrolled."""
    a = (lambda i, j: A[j, i]) if tA else (lambda i, j: A[i, j])
    return jnp.stack([
        a(i, 0) * x[0] + a(i, 1) * x[1] + a(i, 2) * x[2] for i in range(3)])


def _cross_bl(a, b):
    """(3,B) × (3,B)."""
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]])


def fk_bl(model: RobotModel, q_bl):
    """Batch-last FK: q (n, B) → (R list of (3,3,B), p list of (3,B))."""
    from .blops import joint_transforms_bl

    topo = model.topology
    n = topo.n
    B = q_bl.shape[-1]
    dtype = q_bl.dtype
    X = joint_transforms_bl(model, q_bl)      # list of (6,6,B)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[..., None], (3, 3, B))
    Rs = [None] * n
    ps = [None] * n
    for i in range(n):
        E = X[i][:3, :3]                      # (3,3,B) child ← parent
        # r = unskew(−Eᵀ X_bl): joint origin in parent coords
        M = -_mm33(E, X[i][3:, :3], tA=True)
        r = jnp.stack([M[2, 1], M[0, 2], M[1, 0]])
        p = topo.parents[i]
        Rp = eye if p < 0 else Rs[p]
        pp = jnp.zeros((3, B), dtype) if p < 0 else ps[p]
        Rs[i] = _mm33(Rp, E, tB=True)         # Rp @ Eᵀ
        ps[i] = pp + _mv3(Rp, r)
    return Rs, ps


def contact_rows_bl(model: RobotModel, q_bl, links, offsets):
    """Batch-last stacked linear point Jacobians: (3k, n, B)."""
    topo = model.topology
    n = topo.n
    B = q_bl.shape[-1]
    dtype = q_bl.dtype
    Rs, ps = fk_bl(model, q_bl)
    rows = []
    for i, l in enumerate(links):
        off = jnp.broadcast_to(
            jnp.asarray(offsets[i], dtype)[:, None], (3, B))
        x = ps[l] + _mv3(Rs[l], off)
        support = set(topo.ancestors[l]) | {l}
        cols = []
        for j in range(n):
            if j not in support:
                cols.append(jnp.zeros((3, B), dtype))
                continue
            Sang = jnp.broadcast_to(
                model.S[j, :3].astype(dtype)[:, None], (3, B))
            Slin = jnp.broadcast_to(
                model.S[j, 3:].astype(dtype)[:, None], (3, B))
            a_ang = _mv3(Rs[j], Sang)
            a_lin = _mv3(Rs[j], Slin)
            cols.append(_cross_bl(a_ang, x - ps[j]) + a_lin)
        rows.append(jnp.stack(cols, axis=1))  # (3, n, B)
    return jnp.concatenate(rows, axis=0)      # (3k, n, B)


def contact_rows_and_bias_bl(model: RobotModel, q_bl, qd_bl, links, offsets):
    """Batch-last (J (3k,n,B), J̇q̇ (3k,B)) — the bias as the exact jvp of
    J(q)·q̇ along q̇, traced through the batch-last FK so every derivative
    op is also full-lane-width."""
    import jax

    def vel(q_):
        J = contact_rows_bl(model, q_, links, offsets)
        Jqd = jnp.stack([
            sum(J[r, c] * qd_bl[c] for c in range(model.n))
            for r in range(J.shape[0])])
        return J, Jqd

    (J, _), (_, bias) = jax.jvp(vel, (q_bl,), (qd_bl,))
    return J, bias


def point_force_fext(model: RobotModel, q, link: int, offset, force_world,
                     moment_world=None):
    """Build an (n, 6) link-local external-wrench array ``f_ext`` (the input
    of :func:`.rnea.rnea`/:func:`.fd.forward_dynamics` etc.) from a
    WORLD-frame force applied at a point rigidly attached to ``link`` at
    body-frame ``offset`` (3,) — the usual "push the robot here" idiom
    (MuJoCo's ``xfrc_applied``, Pinocchio's ``fext`` built by hand).

    The wrench about the link-frame origin, in link coordinates
    (engine convention ``[moment; force]``):
    ``f_local = R_linkᵀ f_world``, ``m_local = offset × f_local
    (+ R_linkᵀ m_world)``. All other rows are zero. Differentiable in
    ``q``, ``force_world``, ``moment_world``.
    """
    R, p = fk(model, q)
    f_l = R[link].T @ jnp.asarray(force_world, q.dtype)
    m_l = jnp.cross(jnp.asarray(offset, q.dtype), f_l)
    if moment_world is not None:
        m_l = m_l + R[link].T @ jnp.asarray(moment_world, q.dtype)
    w = jnp.concatenate([m_l, f_l])
    return jnp.zeros((model.n, 6), q.dtype).at[link].set(w)
