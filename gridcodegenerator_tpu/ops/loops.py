"""Loop-closure constraints — closed kinematic chains on a tree engine.

Beyond the reference's scope *by construction*: GRiDCodeGenerator supports
trees only (looped URDFs are explicitly unsupported so subtrees stay
race-free — ``/root/reference/algorithms/_direct_minv.py:132``; the URDF
format itself cannot express a loop). Real mechanisms close loops anyway:
four-bar linkages, parallel robots (Delta/Stewart), gear trains modeled as
linkages, a humanoid grasping its own wrist. The standard treatment — and
the one every tree-based engine uses (MuJoCo's ``connect`` equality
constraint) — is to cut each loop at a point and restore it as a bilateral
**relative point constraint** between the two cut faces:

    x_a(q) − x_b(q) = const        (3 rows per cut)

solved with the same Delassus elimination as the contact layer
(``ops/contact.py``):

    M q̈ = u − c + J_relᵀ λ,   J_rel q̈ + J̇_rel q̇ = a*,
    J_rel = J_a − J_b   (world point Jacobians of the two attachment points),

where λ is the world-frame force link b exerts on link a at the cut. The
engine's analytic M⁻¹ (``ops/minv.py``) makes the Delassus operator
G = J_rel M⁻¹ J_relᵀ two dense matmuls — the same MXU-shaped composition as
the contact layer, batch-ready under ``vmap``.

A pair with ``link_b = -1`` degenerates to a world pin (``offsets_b`` is
then the world anchor) and reproduces
:func:`..contact.constrained_forward_dynamics` exactly — tested.

Planar/redundant note: a planar linkage constrains nothing out of plane, so
the corresponding G row is structurally zero — pass ``reg`` (ridge) as every
redundant-constraint path here does; the null rows then carry exactly zero
force (tested: λ_y = 0 on the planar four-bar).

Single-state functions; batch with ``jax.vmap`` (static pair list, like the
contact layer's static link list). ``zoo.four_bar()`` ships a parallelogram
linkage fixture.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.robot import RobotModel
from .fd import forward_dynamics
from .kinematics import fk, world_jacobian
from .minv import densify, minv_inner
from .rnea import rnea_bwd, rnea_fwd


def _check_pairs(n_links, pairs, offsets_a, offsets_b):
    pairs = tuple(tuple(p) for p in pairs)
    if not pairs:
        raise ValueError("loop set is empty: pass at least one (a, b) pair")
    for a, b in pairs:
        if not (0 <= int(a) < n_links):
            raise ValueError(
                f"loop link a={a} out of range [0, {n_links})")
        if not (-1 <= int(b) < n_links):
            raise ValueError(
                f"loop link b={b} out of range [-1, {n_links}) "
                "(-1 = world anchor)")
        if int(a) == int(b):
            raise ValueError(f"loop pair ({a}, {b}) pins a link to itself")
    k = len(pairs)
    for name, off in (("offsets_a", offsets_a), ("offsets_b", offsets_b)):
        shp = jnp.shape(off)
        if shp != (k, 3):
            raise ValueError(f"{name} must be ({k}, 3), got {shp}")
    return pairs


def loop_gap(model: RobotModel, q, pairs, offsets_a, offsets_b):
    """Stacked constraint gap x_a − x_b (3k,) in world coordinates (for a
    world pair, x_b is the anchor ``offsets_b`` itself). Zero on the
    constraint manifold once the closed configuration is chosen."""
    pairs = _check_pairs(model.n, pairs, offsets_a, offsets_b)
    oa = jnp.asarray(offsets_a, q.dtype)
    ob = jnp.asarray(offsets_b, q.dtype)
    R, p = fk(model, q)
    rows = []
    for i, (a, b) in enumerate(pairs):
        xa = p[a] + R[a] @ oa[i]
        xb = ob[i] if b < 0 else p[b] + R[b] @ ob[i]
        rows.append(xa - xb)
    return jnp.concatenate(rows)


def loop_jacobian(model: RobotModel, q, pairs, offsets_a, offsets_b):
    """Stacked relative point Jacobian J_rel = J_a − J_b (3k, n):
    d/dt (x_a − x_b) = J_rel q̇. Columns under joints that drive both sides
    equally (common ancestors along the cut) cancel analytically — the
    dense subtraction realizes that at trace time."""
    pairs = _check_pairs(model.n, pairs, offsets_a, offsets_b)
    oa = jnp.asarray(offsets_a, q.dtype)
    ob = jnp.asarray(offsets_b, q.dtype)
    rows = []
    for i, (a, b) in enumerate(pairs):
        J = world_jacobian(model, q, a, oa[i])[3:]
        if b >= 0:
            J = J - world_jacobian(model, q, b, ob[i])[3:]
        rows.append(J)
    return jnp.concatenate(rows, axis=0)


def loop_bias(model: RobotModel, q, qd, pairs, offsets_a, offsets_b):
    """Stacked J̇_rel q̇ (3k,): the relative classical bias acceleration at
    q̈ = 0, as one exact jvp of J_rel(q)·q̇ along q̇ (the
    ``point_bias_acceleration`` trick, fused by XLA)."""
    def vel(q_):
        return loop_jacobian(model, q_, pairs, offsets_a, offsets_b) @ qd

    _, jdqd = jax.jvp(vel, (q,), (qd,))
    return jdqd


def transmission_rows(mimic, n, dtype=jnp.float64):
    """Constraint rows of linear joint couplings (URDF ``<mimic>``: gear
    trains, two-finger grippers, differentials): entries
    ``(j, k, multiplier, offset)`` meaning ``q_j = multiplier·q_k + offset``
    become ``(C (m, n), d (m,))`` with the constraint ``C q = d`` (row
    ``e_j − multiplier·e_k``, constant — so its bias J̇q̇ is identically
    zero). Feed as ``couplings=(C, d)`` to :func:`loop_forward_dynamics`;
    ``parse_urdf`` stores the tag in ``RobotDescription.mimic``."""
    mimic = tuple(mimic)
    if not mimic:
        raise ValueError("mimic/transmission set is empty")
    C = jnp.zeros((len(mimic), n), dtype)
    d = jnp.zeros(len(mimic), dtype)
    for r, (j, k, mult, off) in enumerate(mimic):
        if not (0 <= int(j) < n and 0 <= int(k) < n) or int(j) == int(k):
            raise ValueError(f"bad transmission entry ({j}, {k})")
        C = C.at[r, int(j)].set(1.0).at[r, int(k)].add(-float(mult))
        d = d.at[r].set(float(off))
    return C, d


def loop_forward_dynamics(model: RobotModel, q, qd, u, pairs=(),
                          offsets_a=None, offsets_b=None, gravity=-9.81,
                          baumgarte=(0.0, 0.0), reg=0.0, couplings=None):
    """Closed-chain FD: returns ``(q̈ (n,), λ (3k + m,))``.

    λ is the world-frame cut force (link b on link a) for the point rows;
    the generalized torque it contributes is ``J_relᵀ λ`` (ID round trip
    tested). ``couplings = (C, d)`` appends linear joint-space constraint
    rows ``C q̈ = a*`` (:func:`transmission_rows` — mimic joints, gears);
    their λ rows are the transmission generalized forces. ``baumgarte =
    (α, β)``: a* = −2α·(constraint velocity) − β²·(constraint error)
    stabilizes drift during integration. ``reg`` ridges G for planar /
    redundant constraint sets."""
    if pairs:
        pairs = _check_pairs(model.n, pairs, offsets_a, offsets_b)
    elif couplings is None:
        raise ValueError("pass loop pairs, couplings, or both")
    qdd_free = forward_dynamics(model, q, qd, u, gravity)
    Minv = densify(minv_inner(model, model.joint_transforms(q)))
    rows_J, rows_bias, rows_err = [], [], []
    if pairs:
        rows_J.append(loop_jacobian(model, q, pairs, offsets_a, offsets_b))
        rows_bias.append(loop_bias(model, q, qd, pairs, offsets_a,
                                   offsets_b))
        rows_err.append(loop_gap(model, q, pairs, offsets_a, offsets_b))
    if couplings is not None:
        C, d = couplings
        C = jnp.asarray(C, q.dtype)
        rows_J.append(C)
        rows_bias.append(jnp.zeros(C.shape[0], q.dtype))  # C constant
        rows_err.append(C @ q - jnp.asarray(d, q.dtype))
    J = jnp.concatenate(rows_J, axis=0)
    jdqd = jnp.concatenate(rows_bias)
    m = J.shape[0]

    alpha, beta = baumgarte
    a_star = jnp.zeros(m, q.dtype)
    if alpha != 0.0:
        a_star = a_star - 2.0 * alpha * (J @ qd)
    if beta != 0.0:
        a_star = a_star - beta * beta * jnp.concatenate(rows_err)

    MiJt = Minv @ J.T
    G = J @ MiJt + reg * jnp.eye(m, dtype=q.dtype)
    rhs = -(J @ qdd_free + jdqd - a_star)
    L = jnp.linalg.cholesky(G)
    lam = jax.scipy.linalg.cho_solve((L, True), rhs)
    return qdd_free + MiJt @ lam, lam


def loop_inverse_dynamics(model: RobotModel, q, qd, qdd, lam, pairs=(),
                          offsets_a=None, offsets_b=None, gravity=-9.81,
                          couplings=None):
    """Actuation torques realizing q̈ under the given cut/transmission
    forces: ``u = ID(q, q̇, q̈) − Jᵀ λ`` (row layout as in
    :func:`loop_forward_dynamics`)."""
    X = model.joint_transforms(q)
    v, a, f = rnea_fwd(model, X, qd, qdd, gravity)
    c, _ = rnea_bwd(model, X, f, qd, qdd)
    rows = []
    if pairs:
        rows.append(loop_jacobian(model, q, pairs, offsets_a, offsets_b))
    if couplings is not None:
        rows.append(jnp.asarray(couplings[0], q.dtype))
    J = jnp.concatenate(rows, axis=0)
    return c - J.T @ lam


def loop_project_velocity(model: RobotModel, q, qd, pairs=(), offsets_a=None,
                          offsets_b=None, reg=0.0, couplings=None):
    """Project q̇ onto the constraint manifold (J q̇ = 0 over loop AND
    coupling rows), minimum kinetic energy of the correction — use before a
    rollout so the initial state is constraint-consistent."""
    Minv = densify(minv_inner(model, model.joint_transforms(q)))
    rows = []
    if pairs:
        rows.append(loop_jacobian(model, q, pairs, offsets_a, offsets_b))
    if couplings is not None:
        rows.append(jnp.asarray(couplings[0], q.dtype))
    J = jnp.concatenate(rows, axis=0)
    G = J @ Minv @ J.T + reg * jnp.eye(J.shape[0], dtype=q.dtype)
    L = jnp.linalg.cholesky(G)
    imp = jax.scipy.linalg.cho_solve((L, True), J @ qd)
    return qd - Minv @ (J.T @ imp)


# --------------------------------------------------------------------------
# Batch-last closed-chain FD — the TPU production path for parallel
# mechanisms (the same batch-on-the-vector-lanes rewrite that bought the
# contact layer its 36×/18×; see ops/kinematics.py batch-last notes)
# --------------------------------------------------------------------------
def _loop_rows_bl(model: RobotModel, q_bl, pairs, oa, ob):
    """Batch-last loop constraint rows: q (n, B) → (J_rel (3k, n, B),
    gap (3k, B)). One shared FK; per-pair columns are the point-Jacobian
    difference, with columns outside ancestors(a) ∪ ancestors(b)
    structurally zero and common-ancestor columns cancelling numerically
    (the dense subtraction realizes it lane-wide)."""
    from .kinematics import _cross_bl, _mv3, fk_bl

    topo = model.topology
    n = topo.n
    B = q_bl.shape[-1]
    dtype = q_bl.dtype
    Rs, ps = fk_bl(model, q_bl)

    def point_and_cols(link, off):
        offb = jnp.broadcast_to(off[:, None], (3, B))
        x = ps[link] + _mv3(Rs[link], offb)
        support = set(topo.ancestors[link]) | {link}
        cols = [None] * n
        for j in support:
            Sang = jnp.broadcast_to(
                model.S[j, :3].astype(dtype)[:, None], (3, B))
            Slin = jnp.broadcast_to(
                model.S[j, 3:].astype(dtype)[:, None], (3, B))
            cols[j] = (_cross_bl(_mv3(Rs[j], Sang), x - ps[j])
                       + _mv3(Rs[j], Slin))
        return x, cols

    zeros = jnp.zeros((3, B), dtype)
    rows, gaps = [], []
    for i, (a, b) in enumerate(pairs):
        xa, ca = point_and_cols(a, oa[i])
        if b >= 0:
            xb, cb = point_and_cols(b, ob[i])
        else:
            xb = jnp.broadcast_to(ob[i][:, None], (3, B))
            cb = [None] * n
        cols = []
        for j in range(n):
            if ca[j] is None and cb[j] is None:
                cols.append(zeros)
            elif cb[j] is None:
                cols.append(ca[j])
            elif ca[j] is None:
                cols.append(-cb[j])
            else:
                cols.append(ca[j] - cb[j])
        rows.append(jnp.stack(cols, axis=1))           # (3, n, B)
        gaps.append(xa - xb)
    return jnp.concatenate(rows, axis=0), jnp.concatenate(gaps, axis=0)


def loop_fd_batched(model: RobotModel, q, qd, u, pairs=(), offsets_a=None,
                    offsets_b=None, gravity=-9.81, baumgarte=(0.0, 0.0),
                    reg=0.0, couplings=None):
    """Batched closed-chain FD over leading batch axes — the TPU production
    path. Inputs are batch-first user arrays ``(..., n)``; returns
    ``(q̈ (..., n), λ (..., 3k + m_c))``, matching
    :func:`loop_forward_dynamics` state-for-state (tested to f64
    round-off). Everything runs batch-last: lane-wide FK/Jacobian rows
    (:func:`_loop_rows_bl`), the analytic batch-last M⁻¹, and the
    lane-parallel Delassus Cholesky (``contact.chol_solve_bl``) — no
    per-state small matmuls anywhere."""
    from .blops import densify_rows, joint_transforms_bl, matvecN
    from .blops import minv_bl, rnea_bwd_bl, rnea_fwd_bl
    from .contact import chol_solve_bl

    n = model.n
    if pairs:
        pairs = _check_pairs(n, pairs, offsets_a, offsets_b)
    elif couplings is None:
        raise ValueError("pass loop pairs, couplings, or both")
    k = len(pairs)

    shape_b = q.shape[:-1]
    flat = lambda x: x.reshape((-1, x.shape[-1])).T      # (..., d) → (d, B)
    q_bl, qd_bl, u_bl = flat(q), flat(qd), flat(u)
    B = q_bl.shape[-1]
    dtype = q_bl.dtype

    X = joint_transforms_bl(model, q_bl)
    _, _, f = rnea_fwd_bl(model, X, qd_bl, None, gravity)
    c, _ = rnea_bwd_bl(model, X, f, qd_bl)
    Minv = densify_rows(minv_bl(model, X)[0])
    qdd_free = matvecN(Minv, u_bl - c)

    rows_J, rows_bias, rows_err = [], [], []
    if pairs:
        oa = jnp.asarray(offsets_a, dtype)
        ob = jnp.asarray(offsets_b, dtype)

        def vel(q_):
            J_, _ = _loop_rows_bl(model, q_, pairs, oa, ob)
            return jnp.stack([
                sum(J_[r, j] * qd_bl[j] for j in range(n))
                for r in range(3 * k)])

        (J_loop, gap) = _loop_rows_bl(model, q_bl, pairs, oa, ob)
        _, bias = jax.jvp(vel, (q_bl,), (qd_bl,))
        rows_J.append(J_loop)
        rows_bias.append(bias)
        rows_err.append(gap)
    if couplings is not None:
        C, d = couplings
        C = jnp.asarray(C, dtype)
        mc = C.shape[0]
        rows_J.append(jnp.broadcast_to(C[..., None], (mc, n, B)))
        rows_bias.append(jnp.zeros((mc, B), dtype))      # C constant
        rows_err.append(jnp.stack([
            sum(C[r, j] * q_bl[j] for j in range(n)) for r in range(mc)])
            - jnp.asarray(d, dtype)[:, None])
    J = jnp.concatenate(rows_J, axis=0)                  # (m, n, B)
    jdqd = jnp.concatenate(rows_bias)                    # (m, B)
    m = J.shape[0]

    alpha, beta = baumgarte
    a_star = jnp.zeros((m, B), dtype)
    if alpha != 0.0:
        Jqd = jnp.stack([sum(J[r, j] * qd_bl[j] for j in range(n))
                         for r in range(m)])
        a_star = a_star - 2.0 * alpha * Jqd
    if beta != 0.0:
        a_star = a_star - beta * beta * jnp.concatenate(rows_err)

    MiJt_cols = [matvecN(Minv, J[r]) for r in range(m)]  # each (n, B)
    G = jnp.stack([
        jnp.stack([sum(J[r, j] * MiJt_cols[s][j] for j in range(n))
                   for s in range(m)])
        for r in range(m)])                              # (m, m, B)
    rhs = -(jnp.stack([sum(J[r, j] * qdd_free[j] for j in range(n))
                       for r in range(m)]) + jdqd - a_star)
    lam = chol_solve_bl(G, rhs, reg=reg)
    qdd = qdd_free + sum(MiJt_cols[s] * lam[s:s + 1] for s in range(m))

    unflat = lambda arr: jnp.moveaxis(arr, 0, -1).reshape(
        shape_b + (arr.shape[0],))
    return unflat(qdd), unflat(lam)


def loop_step_batched(model: RobotModel, q, qd, u, dt, pairs=(),
                      offsets_a=None, offsets_b=None, gravity=-9.81,
                      baumgarte=(10.0, 10.0), reg=0.0, couplings=None):
    """One batched semi-implicit Euler step of the constrained chain
    (batch-first ``(..., n)`` arrays, like :func:`loop_fd_batched`)."""
    qdd, lam = loop_fd_batched(model, q, qd, u, pairs, offsets_a,
                               offsets_b, gravity, baumgarte, reg,
                               couplings=couplings)
    qd2 = qd + dt * qdd
    return q + dt * qd2, qd2, lam


# --------------------------------------------------------------------------
# Floating-base loop closure (parallel-leg robots: Minitaur-style linkage
# legs, humanoid self-grasps)
# --------------------------------------------------------------------------
def _check_fb_pairs(n_links, pairs, offsets_a, offsets_b):
    return _check_pairs(n_links, pairs, offsets_a, offsets_b)


def fb_loop_gap(ffm, quat, pos, q, pairs, offsets_a, offsets_b):
    """World-frame constraint gap (3k,) on a free-flyer. For link↔link
    pairs the base pose cancels up to the rotation: gap = R_wb (x_a − x_b)
    in base coordinates; world pairs (b = −1) measure against the world
    anchor and need ``pos``."""
    from .contact import _fb_point_base
    from .freeflyer import quat_to_rot

    pairs = _check_fb_pairs(ffm.n, pairs, offsets_a, offsets_b)
    oa = jnp.asarray(offsets_a, q.dtype)
    ob = jnp.asarray(offsets_b, q.dtype)
    R = quat_to_rot(quat)
    rows = []
    for i, (a, b) in enumerate(pairs):
        xa = pos + R @ _fb_point_base(ffm, q, a, oa[i])[0]
        xb = (ob[i] if b < 0
              else pos + R @ _fb_point_base(ffm, q, b, ob[i])[0])
        rows.append(xa - xb)
    return jnp.concatenate(rows)


def fb_loop_jacobian(ffm, quat, q, pairs, offsets_a, offsets_b):
    """Relative point Jacobian (3k, 6+n) over [vb (body twist); q̇]. For a
    link↔link pair the base linear-velocity block cancels analytically
    (both points ride the same base); the angular block is
    ``−R·skew(x_a − x_b)``. Built as the row difference of the contact
    layer's free-flyer point Jacobians, which realizes those cancellations
    at trace time."""
    from .contact import fb_contact_jacobian

    pairs = _check_fb_pairs(ffm.n, pairs, offsets_a, offsets_b)
    oa = jnp.asarray(offsets_a, q.dtype)
    ob = jnp.asarray(offsets_b, q.dtype)
    rows = []
    for i, (a, b) in enumerate(pairs):
        J = fb_contact_jacobian(ffm, quat, q, (a,), oa[i:i + 1])
        if b >= 0:
            J = J - fb_contact_jacobian(ffm, quat, q, (b,), ob[i:i + 1])
        rows.append(J)
    return jnp.concatenate(rows, axis=0)


def _rotvec_from_matrix(E):
    """World rotation vector (axis·angle) of a rotation matrix. Robust at
    the identity (the weld steady state); NOT valid within ~1e-3 of
    angle π — a stepper's weld drift never gets there, and a weld
    assembled π out of alignment is a modelling error."""
    w = 0.5 * jnp.stack([E[2, 1] - E[1, 2],
                         E[0, 2] - E[2, 0],
                         E[1, 0] - E[0, 1]])          # sinθ · axis
    c = 0.5 * (jnp.trace(E) - 1.0)
    s = jnp.sqrt(w @ w + 1e-30)
    th = jnp.arctan2(s, c)
    return w * jnp.where(s < 1e-12, 1.0, th / s)


def fb_weld_gap(ffm, quat, q, pairs, R0):
    """Orientation gap (3w,) of weld constraints on a free-flyer: for
    each pair (a, b) the world rotation vector of
    ``E = R_w_a · R0 · R_w_bᵀ`` — the drift of link b's orientation from
    where the weld (relative rotation ``R0 = R_w_a(0)ᵀ R_w_b(0)``,
    captured at assembly) says it should be. ``b = −1`` welds link a's
    ORIENTATION to the world (``R_w_b = I``, ``R0 = R_w_a(0)ᵀ``); pair
    the rows with a ``loops=`` connect cut at the same anchor to weld
    the full pose — MuJoCo's ``<equality><weld>`` maps to exactly that
    3+3 row split. ġ ≈ ω_a − ω_b (world) for small drift, matching
    :func:`fb_weld_jacobian`'s rows."""
    from .freeflyer import quat_to_rot
    from .kinematics import fk as _fk

    R_wb = quat_to_rot(quat)
    R_bl, _ = _fk(ffm.arm, q)
    R0 = jnp.asarray(R0, q.dtype)
    eye = jnp.eye(3, dtype=q.dtype)
    rows = []
    for i, (a, b) in enumerate(pairs):
        Ra = R_wb @ R_bl[a]
        Rb = eye if b < 0 else R_wb @ R_bl[b]
        rows.append(_rotvec_from_matrix(Ra @ R0[i] @ Rb.T))
    return jnp.concatenate(rows)


def fb_weld_jacobian(ffm, quat, q, pairs):
    """Relative ANGULAR Jacobian (3w, 6+n) over [vb (body twist); q̇]:
    rows are ω_a − ω_b in world coordinates. For a link↔link pair the
    base angular block cancels (both links ride the same base); a world
    weld (b = −1) keeps it: ``R_wb [I₃ | 0 | Jang_a]``."""
    from .freeflyer import quat_to_rot
    from .kinematics import world_jacobian as _wj

    n = ffm.n
    R_wb = quat_to_rot(quat)
    z3 = jnp.zeros(3, q.dtype)
    rows = []
    for a, b in pairs:
        Jang_a = _wj(ffm.arm, q, a, z3)[:3]           # (3, n) base frame
        if b >= 0:
            arm = Jang_a - _wj(ffm.arm, q, b, z3)[:3]
            base = jnp.zeros((3, 6), q.dtype)
        else:
            arm = Jang_a
            base = jnp.concatenate([jnp.eye(3, dtype=q.dtype),
                                    jnp.zeros((3, 3), q.dtype)], axis=1)
        rows.append(R_wb @ jnp.concatenate([base, arm], axis=1))
    return jnp.concatenate(rows, axis=0)


def fb_loop_bias(ffm, quat, q, vb, qd, pairs, offsets_a, offsets_b):
    """Relative bias acceleration J̇_rel·[vb; q̇] (3k,) at zero (v̇b, q̈) —
    the difference of the contact layer's point biases."""
    from .contact import fb_contact_bias

    pairs = _check_fb_pairs(ffm.n, pairs, offsets_a, offsets_b)
    oa = jnp.asarray(offsets_a, q.dtype)
    ob = jnp.asarray(offsets_b, q.dtype)
    rows = []
    for i, (a, b) in enumerate(pairs):
        bias = fb_contact_bias(ffm, quat, q, vb, qd, (a,), oa[i:i + 1])
        if b >= 0:
            bias = bias - fb_contact_bias(ffm, quat, q, vb, qd, (b,),
                                          ob[i:i + 1])
        rows.append(bias)
    return jnp.concatenate(rows)


def fb_loop_forward_dynamics(ffm, quat, pos, q, vb, qd, tau, pairs,
                             offsets_a, offsets_b, links=(), offsets=None,
                             anchors=None, gravity=-9.81,
                             baumgarte=(0.0, 0.0), reg=0.0):
    """Free-flyer FD with loop-closure constraints, optionally combined
    with stance world pins in ONE Delassus solve (``links``/``offsets``/
    ``anchors`` — the contact layer's stance rows): a standing
    parallel-leg robot is loops + stance simultaneously. Returns
    ``(v̇b (6,), q̈ (n,), λ (3(k_loop+k_stance),))`` with the loop rows
    first."""
    from .contact import (_check_contacts, _fb_point_base,
                          fb_contact_bias, fb_contact_jacobian)
    from .freeflyer import fb_bias, fb_mass_matrix, quat_to_rot

    pairs = _check_fb_pairs(ffm.n, pairs, offsets_a, offsets_b)
    X = ffm.arm.joint_transforms(q)
    R_wb = quat_to_rot(quat)
    p_b, c_j = fb_bias(ffm, X, R_wb, vb, qd, gravity)
    M = fb_mass_matrix(ffm, X)
    Lm = jnp.linalg.cholesky(M)
    msolve = lambda rhs: jax.scipy.linalg.cho_solve((Lm, True), rhs)
    y_free = msolve(jnp.concatenate([-p_b, tau - c_j]))

    J = fb_loop_jacobian(ffm, quat, q, pairs, offsets_a, offsets_b)
    bias = fb_loop_bias(ffm, quat, q, vb, qd, pairs, offsets_a, offsets_b)
    gap = fb_loop_gap(ffm, quat, pos, q, pairs, offsets_a, offsets_b)
    if links:
        _check_contacts(ffm.n, links, offsets)
        offsets = jnp.asarray(offsets, q.dtype)
        Js = fb_contact_jacobian(ffm, quat, q, links, offsets)
        J = jnp.concatenate([J, Js], axis=0)
        bias = jnp.concatenate([
            bias, fb_contact_bias(ffm, quat, q, vb, qd, links, offsets)])
        xs = jnp.concatenate([
            pos + R_wb @ _fb_point_base(ffm, q, l, offsets[i])[0]
            for i, l in enumerate(links)])
        anch = (xs if anchors is None
                else jnp.asarray(anchors, q.dtype).reshape(-1))
        gap = jnp.concatenate([gap, xs - anch])

    m = J.shape[0]
    alpha, beta = baumgarte
    a_star = jnp.zeros(m, q.dtype)
    if alpha != 0.0:
        a_star = a_star - 2.0 * alpha * (J @ jnp.concatenate([vb, qd]))
    if beta != 0.0:
        a_star = a_star - beta * beta * gap

    MiJt = msolve(J.T)
    G = J @ MiJt + reg * jnp.eye(m, dtype=q.dtype)
    Lg = jnp.linalg.cholesky(G)
    lam = jax.scipy.linalg.cho_solve(
        (Lg, True), -(J @ y_free + bias - a_star))
    y = y_free + MiJt @ lam
    return y[:6], y[6:], lam


# --------------------------------------------------------------------------
# Batch-last floating-base loop closure — parallel-leg robots at RL batch
# sizes (Minitaur-style linkage legs, standing parallel mechanisms)
# --------------------------------------------------------------------------
def _fb_loop_rows_bl(ffm, quat_bl, q_bl, pairs, oa, ob):
    """Batch-last free-flyer relative rows: (J (3k, 6+n, B), xa list,
    xb list of base-frame points — ``xb[i] is None`` for world pairs).
    Base linear-velocity columns cancel structurally for link↔link pairs
    (emitted as exact zeros, not a numerical difference); angular columns
    are R·(e_j × (xa − xb))."""
    import numpy as np

    from .contact import _quat_to_rot_bl
    from .kinematics import _cross_bl, _mv3, fk_bl

    arm = ffm.arm
    n = arm.n
    topo = arm.topology
    B = q_bl.shape[-1]
    dtype = q_bl.dtype
    R = _quat_to_rot_bl(quat_bl)
    Rs, ps = fk_bl(arm, q_bl)
    zeros = jnp.zeros((3, B), dtype)

    def side(link, off):
        offb = jnp.broadcast_to(off[:, None], (3, B))
        x_b = ps[link] + _mv3(Rs[link], offb)
        support = set(topo.ancestors[link]) | {link}
        qcols = [None] * n
        for j in support:
            Sang = jnp.broadcast_to(
                arm.S[j, :3].astype(dtype)[:, None], (3, B))
            Slin = jnp.broadcast_to(
                arm.S[j, 3:].astype(dtype)[:, None], (3, B))
            qcols[j] = (_cross_bl(_mv3(Rs[j], Sang), x_b - ps[j])
                        + _mv3(Rs[j], Slin))
        return x_b, qcols

    rows, xas, xbs = [], [], []
    for i, (a, b) in enumerate(pairs):
        xa, ca = side(a, oa[i])
        if b >= 0:
            xb, cb = side(b, ob[i])
            rel = xa - xb
        else:
            xb, cb = None, [None] * n
            rel = xa
        cols = []
        for j in range(3):                                  # ω_b columns
            e = np.zeros(3)
            e[j] = 1.0
            e_bl = jnp.broadcast_to(jnp.asarray(e, dtype)[:, None], (3, B))
            cols.append(_mv3(R, _cross_bl(e_bl, rel)))
        for j in range(3):                                  # v_b columns
            cols.append(zeros if b >= 0 else R[:, j])
        for j in range(n):                                  # q̇ columns
            va, vb_ = ca[j], cb[j]
            if va is None and vb_ is None:
                cols.append(zeros)
            else:
                d = (va if vb_ is None else
                     (-vb_ if va is None else va - vb_))
                cols.append(_mv3(R, d))
        rows.append(jnp.stack(cols, axis=1))                # (3, 6+n, B)
        xas.append(xa)
        xbs.append(xb)
    return jnp.concatenate(rows, axis=0), xas, xbs


def fb_loop_fd_batched(ffm, quat, pos, q, vb, qd, tau, pairs, offsets_a,
                       offsets_b, links=(), offsets=None, anchors=None,
                       gravity=-9.81, baumgarte=(0.0, 0.0), reg=0.0):
    """Batched free-flyer loop-closure FD over leading batch axes,
    optionally combined with stance world pins in ONE Delassus solve —
    the TPU production path for parallel-leg robots (mirrors
    :func:`fb_loop_forward_dynamics` state-for-state, tested to f64
    round-off; batch-last throughout, like
    :func:`..contact.fb_constrained_fd_batched`). Inputs batch-first
    ``(..., d)``; returns ``(v̇b (...,6), q̈ (...,n),
    λ (...,3(k_loop+k_stance)))``, loop rows first."""
    from .contact import (_check_contacts, _fb_bias_bl, _fb_contact_rows_bl,
                          _fb_mass_matrix_bl, _quat_to_rot_bl,
                          chol_apply_bl, chol_factor_bl, chol_solve_bl)

    n = ffm.n
    pairs = _check_fb_pairs(n, pairs, offsets_a, offsets_b)
    k = len(pairs)
    ks = len(links)
    if links:
        _check_contacts(n, links, offsets)

    shape_b = q.shape[:-1]
    flat = lambda x: x.reshape((-1, x.shape[-1])).T      # (..., d) → (d, B)
    quat_bl, pos_bl, q_bl = flat(quat), flat(pos), flat(q)
    vb_bl, qd_bl, tau_bl = flat(vb), flat(qd), flat(tau)
    B = q_bl.shape[-1]
    dtype = q_bl.dtype
    oa = jnp.asarray(offsets_a, dtype)
    ob = jnp.asarray(offsets_b, dtype)

    from .blops import joint_transforms_bl
    X = joint_transforms_bl(ffm.arm, q_bl)
    R = _quat_to_rot_bl(quat_bl)
    p_b, c_j = _fb_bias_bl(ffm, X, R, vb_bl, qd_bl, gravity)
    M = _fb_mass_matrix_bl(ffm, X)
    Lm = chol_factor_bl(M)
    y_free = chol_apply_bl(Lm, jnp.concatenate([-p_b, tau_bl - c_j]))

    if links:
        offsets = jnp.asarray(offsets, dtype)

    def rows_of(quat_, q_):
        Jl, xas, xbs = _fb_loop_rows_bl(ffm, quat_, q_, pairs, oa, ob)
        if links:
            Js, xs = _fb_contact_rows_bl(ffm, quat_, q_, links, offsets)
            Jl = jnp.concatenate([Jl, Js], axis=0)
        else:
            xs = None
        return Jl, xas, xbs, xs

    J, xas, xbs, xs = rows_of(quat_bl, q_bl)
    m = 3 * (k + ks)
    vfull = jnp.concatenate([vb_bl, qd_bl])

    # bias: exact jvp of J(quat, q)·[vb; q̇] along the state flow
    def vel(quat_, q_):
        J_, _, _, _ = rows_of(quat_, q_)
        return jnp.stack([
            sum(J_[r, c] * vfull[c] for c in range(6 + n))
            for r in range(m)])

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
    a_star = jnp.zeros((m, B), dtype)
    if alpha != 0.0:
        Jv = jnp.stack([sum(J[r, c] * vfull[c] for c in range(6 + n))
                        for r in range(m)])
        a_star = a_star - 2.0 * alpha * Jv
    if beta != 0.0:
        from .kinematics import _mv3
        gaps = []
        for i, (a, b) in enumerate(pairs):
            if xbs[i] is not None:                 # link↔link: pos cancels
                gaps.append(_mv3(R, xas[i] - xbs[i]))
            else:                                  # world pair: vs anchor
                gaps.append(pos_bl + _mv3(R, xas[i]) - ob[i][:, None])
        if links:
            x_w = jnp.concatenate([
                pos_bl + _mv3(R, xs[3 * i:3 * i + 3])
                for i in range(ks)])
            anch = (x_w if anchors is None
                    else jnp.asarray(anchors, dtype).reshape(-1)[:, None])
            gaps.append(x_w - anch)
        a_star = a_star - beta * beta * jnp.concatenate(gaps)

    MiJt_cols = [chol_apply_bl(Lm, J[r]) for r in range(m)]   # (6+n, B)
    G = jnp.stack([
        jnp.stack([sum(J[r, c] * MiJt_cols[s][c] for c in range(6 + n))
                   for s in range(m)])
        for r in range(m)])
    rhs = -(jnp.stack([sum(J[r, c] * y_free[c] for c in range(6 + n))
                       for r in range(m)]) + bias - a_star)
    lam = chol_solve_bl(G, rhs, reg=reg)
    y = y_free + sum(MiJt_cols[s] * lam[s:s + 1] for s in range(m))

    unflat = lambda arr: jnp.moveaxis(arr, 0, -1).reshape(
        shape_b + (arr.shape[0],))
    return unflat(y[:6]), unflat(y[6:]), unflat(lam)


def loop_step(model: RobotModel, q, qd, u, dt, pairs=(), offsets_a=None,
              offsets_b=None, gravity=-9.81, baumgarte=(10.0, 10.0),
              reg=0.0, couplings=None):
    """One semi-implicit Euler step of the constrained chain."""
    qdd, lam = loop_forward_dynamics(model, q, qd, u, pairs, offsets_a,
                                     offsets_b, gravity, baumgarte, reg,
                                     couplings=couplings)
    qd2 = qd + dt * qdd
    return q + dt * qd2, qd2, lam


def simulate_loops(model: RobotModel, q0, qd0, taus, dt, pairs=(),
                   offsets_a=None, offsets_b=None, gravity=-9.81,
                   baumgarte=(10.0, 10.0), reg=0.0, couplings=None):
    """``lax.scan`` rollout of the constrained chain (``taus``: (T, n)).
    Returns ((q_T, q̇_T), per-step (q, q̇, λ) stacks) — one device
    dispatch."""
    def step(carry, tau):
        q, qd = carry
        q2, qd2, lam = loop_step(model, q, qd, tau, dt, pairs, offsets_a,
                                 offsets_b, gravity, baumgarte, reg,
                                 couplings=couplings)
        return (q2, qd2), (q2, qd2, lam)

    return jax.lax.scan(step, (q0, qd0), taus)


def simulate_loops_batched(model: RobotModel, q0, qd0, taus, dt, pairs=(),
                           offsets_a=None, offsets_b=None, gravity=-9.81,
                           baumgarte=(10.0, 10.0), reg=0.0, couplings=None):
    """``lax.scan`` rollout of a BATCH of constrained chains — parallel
    linkage environments (``taus``: (T, ..., n) batch-first per step,
    stepped through :func:`loop_step_batched`). Returns
    ((q_T, q̇_T), per-step (q, q̇, λ) stacks) — one device dispatch."""
    def step(carry, tau):
        q, qd = carry
        q2, qd2, lam = loop_step_batched(model, q, qd, tau, dt, pairs,
                                         offsets_a, offsets_b, gravity,
                                         baumgarte, reg,
                                         couplings=couplings)
        return (q2, qd2), (q2, qd2, lam)

    return jax.lax.scan(step, (q0, qd0), taus)
