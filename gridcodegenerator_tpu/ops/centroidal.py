"""Centroidal dynamics: center of mass, centroidal momentum matrix (CMM),
momentum, and its velocity-product rate.

Beyond the reference (GRiDCodeGenerator has no kinematic/centroidal layer) —
this is the quantity set humanoid/quadruped MPC formulations consume
(centroidal momentum h_G = A_G(q)·q̇, its bias Ȧ_G·q̇, and the CoM), built
from the same CRBA composite-inertia sweep the analytic M⁻¹ already uses:
the Orin–Goswami identity A_G[:, j] = ᴳX*_j · I^C_j · S_j reuses the
composite inertias, so the CMM costs one FK plus one column transform per
joint.

Conventions: spatial vectors are [angular; linear] like the rest of the
engine; the CMM is expressed in a frame with world-aligned axes at the
instantaneous CoM ("G frame"). Fixed-base functions cover the moving links
only (the welded base has no velocity; its mass never enters momentum —
document: CoM here is the CoM of the articulated chain). Free-flyer
functions include the base body and return world-frame quantities.

Single-state functions trace-unrolled like ``ops/kinematics.py``; the
``*_bl`` forms are the batch-last production layout (batch on the vector
lanes) and the ``*_batched`` wrappers take ordinary (…, n) batch-first
arrays. The sweeps are O(n) light — plain XLA on the batch-last layout is
already lane-parallel, no Pallas kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.robot import RobotModel
from .kinematics import fk


def _unskew(S):
    return jnp.stack([S[..., 2, 1], S[..., 0, 2], S[..., 1, 0]], axis=-1)


def link_mass_com(model: RobotModel):
    """Per-link (mass (n,), CoM offset in link coords (n, 3)) extracted from
    the spatial inertias (Featherstone layout: I[3:,3:] = m·1₃,
    I[:3,3:] = m·skew(c) — ``models/urdf.py::spatial_inertia``)."""
    m = jnp.einsum("nii->n", model.inertia[:, 3:, 3:]) / 3.0
    c = _unskew(model.inertia[:, :3, 3:]) / m[:, None]
    return m, c


def total_mass(model: RobotModel):
    """Total mass of the moving links."""
    m, _ = link_mass_com(model)
    return jnp.sum(m)


def com(model: RobotModel, q):
    """CoM of the articulated chain in base (world) coordinates, (3,)."""
    m, c = link_mass_com(model)
    R, p = fk(model, q)
    x = p + jnp.einsum("nij,nj->ni", R, c)
    return (m @ x) / jnp.sum(m)


def _composite_inertias(model: RobotModel, X):
    """CRBA composite-rigid-body inertias I^C_i (each in link-i coords) —
    the same backward sweep ``ops/minv.py``/``blops.crba_bl`` run."""
    topo = model.topology
    IC = [model.inertia[i] for i in range(topo.n)]
    for i in range(topo.n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            IC[p] = IC[p] + X[i].T @ IC[i] @ X[i]
    return IC


def centroidal_momentum_matrix(model: RobotModel, q):
    """A_G(q): (6, n) with h_G = A_G·q̇ the spatial momentum [κ_G; l] about
    the instantaneous CoM, world-aligned axes. Column j is the composite
    momentum ᴳX*_j·I^C_j·S_j (Orin & Goswami 2008)."""
    topo = model.topology
    X = model.joint_transforms(q)
    IC = _composite_inertias(model, X)
    R, p = fk(model, q)
    m, c = link_mass_com(model)
    x_g = (m @ (p + jnp.einsum("nij,nj->ni", R, c))) / jnp.sum(m)
    cols = []
    for j in range(topo.n):
        h = IC[j] @ model.S[j]          # momentum column in frame j
        f_w = R[j] @ h[3:]
        n_w = R[j] @ h[:3] + jnp.cross(p[j] - x_g, f_w)
        cols.append(jnp.concatenate([n_w, f_w]))
    return jnp.stack(cols, axis=1)


def centroidal_momentum(model: RobotModel, q, qd):
    """h_G = A_G(q)·q̇, (6,)."""
    return centroidal_momentum_matrix(model, q) @ qd


def centroidal_momentum_bias(model: RobotModel, q, qd):
    """Ȧ_G·q̇ (6,): the momentum rate at q̈ = 0 (incl. the moving-CoM frame),
    as the exact forward-mode derivative of h_G(q, q̇) along q̇ — so
    ḣ_G = A_G·q̈ + this."""

    def h(q_):
        return centroidal_momentum(model, q_, qd)

    _, hdot = jax.jvp(h, (q,), (qd,))
    return hdot


# --------------------------------------------------------------- batch-last
def cmm_bl(model: RobotModel, q):
    """Batch-last CMM: q (n, *b) → A_G (6, n, *b) — the same Orin–Goswami
    columns as :func:`centroidal_momentum_matrix` with the batch on the
    vector lanes (one CRBA composite sweep + one FK, all (…, *b) FMAs)."""
    from .blops import (batchify1, batchify2, joint_transforms_bl, matmat6,
                        matmat6_T, matvec6)
    from .kinematics import _cross_bl, _mv3, fk_bl

    topo = model.topology
    n = topo.n
    dtype = q.dtype
    bshape = q.shape[1:]
    X = joint_transforms_bl(model, q)
    ones1B = jnp.ones((1,) + bshape, dtype)
    IC = [batchify2(model.inertia[i], ones1B) for i in range(n)]
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            IC[p] = IC[p] + matmat6_T(X[i], matmat6(IC[i], X[i]))
    Rs, ps = fk_bl(model, q)
    m, c = link_mass_com(model)
    m = jnp.asarray(m, dtype)
    # world CoM: x_g (3, *b)
    xs = [ps[i] + _mv3(Rs[i], batchify1(jnp.asarray(c[i], dtype), ones1B))
          for i in range(n)]
    x_g = sum(m[i] * xs[i] for i in range(n)) / jnp.sum(m)
    cols = []
    for j in range(n):
        h = matvec6(IC[j], batchify1(model.S[j], ones1B))     # (6, *b)
        f_w = _mv3(Rs[j], h[3:])
        n_w = _mv3(Rs[j], h[:3]) + _cross_bl(ps[j] - x_g, f_w)
        cols.append(jnp.concatenate([n_w, f_w]))
    return jnp.stack(cols, axis=1)                            # (6, n, *b)


def com_bl(model: RobotModel, q):
    """Batch-last CoM: q (n, *b) → (3, *b)."""
    from .blops import batchify1
    from .kinematics import _mv3, fk_bl

    n = model.topology.n
    dtype = q.dtype
    ones1B = jnp.ones((1,) + q.shape[1:], dtype)
    Rs, ps = fk_bl(model, q)
    m, c = link_mass_com(model)
    m = jnp.asarray(m, dtype)
    xs = [ps[i] + _mv3(Rs[i], batchify1(jnp.asarray(c[i], dtype), ones1B))
          for i in range(n)]
    return sum(m[i] * xs[i] for i in range(n)) / jnp.sum(m)


def centroidal_momentum_bl(model: RobotModel, q, qd):
    """h_G = A_G·q̇ batch-last: (6, *b)."""
    A = cmm_bl(model, q)
    return sum(A[:, j] * qd[j:j + 1] for j in range(model.topology.n))


def centroidal_momentum_bias_bl(model: RobotModel, q, qd):
    """Ȧ_G·q̇ batch-last (6, *b), exact jvp along q̇ like the single-state
    form."""
    _, hdot = jax.jvp(lambda q_: centroidal_momentum_bl(model, q_, qd),
                      (q,), (qd,))
    return hdot


def _batched(fn_bl, model, *states):
    """(…, n) batch-first user arrays → batch-last compute → batch-first
    out. The centroidal sweeps are O(n) light — plain XLA on the
    batch-last layout is already lane-parallel; no kernel needed."""
    n = model.topology.n
    batch_shape = states[0].shape[:-1]
    flat = tuple(s.reshape(-1, n).T for s in states)
    out = fn_bl(model, *flat)
    out = jnp.moveaxis(out, -1, 0)
    return out.reshape(batch_shape + out.shape[1:])


def centroidal_momentum_matrix_batched(model: RobotModel, q):
    """Batched CMM: q (…, n) → A_G (…, 6, n), batch-last internally."""
    return _batched(cmm_bl, model, q)


def centroidal_momentum_batched(model: RobotModel, q, qd):
    """Batched h_G: (…, n)² → (…, 6)."""
    return _batched(centroidal_momentum_bl, model, q, qd)


def centroidal_momentum_bias_batched(model: RobotModel, q, qd):
    """Batched Ȧ_G·q̇: (…, n)² → (…, 6)."""
    return _batched(centroidal_momentum_bias_bl, model, q, qd)


def com_batched(model: RobotModel, q):
    """Batched CoM: (…, n) → (…, 3)."""
    return _batched(com_bl, model, q)


# --------------------------------------------------------------- free-flyer
def fb_com(ffm, quat, pos, q):
    """World CoM of the free-flyer system (base body + chain), (3,)."""
    from .freeflyer import quat_to_rot

    arm = ffm.arm
    m, c = link_mass_com(arm)
    m_b = jnp.einsum("ii->", ffm.I_base[3:, 3:]) / 3.0
    c_b = _unskew(ffm.I_base[:3, 3:]) / m_b
    R_wb = quat_to_rot(quat)
    R, p = fk(arm, q)  # base coords
    x_b = p + jnp.einsum("nij,nj->ni", R, c)     # link CoMs, base coords
    s = m_b * c_b + jnp.einsum("n,ni->i", m, x_b)
    return pos + R_wb @ s / (m_b + jnp.sum(m))


def fb_centroidal_momentum_matrix(ffm, quat, pos, q):
    """A_G for the free flyer: (6, 6+n) mapping [v_base; q̇] (base twist in
    base coords, the engine's free-flyer velocity convention) to world-frame
    momentum about the system CoM. The base block is ᴳX*_base·I^C_base with
    I^C_base the whole-robot composite inertia."""
    from .freeflyer import quat_to_rot

    arm = ffm.arm
    topo = arm.topology
    n = topo.n
    X = arm.joint_transforms(q)
    # composite inertias incl. the base body
    IC = _composite_inertias(arm, X)
    IC_b = ffm.I_base
    for i in range(n):
        if topo.parents[i] < 0:
            IC_b = IC_b + X[i].T @ IC[i] @ X[i]
    R_wb = quat_to_rot(quat)
    R, p = fk(arm, q)  # base coords
    x_g = fb_com(ffm, quat, pos, q)

    def col_world(h, R_wl, p_w):
        f_w = R_wl @ h[3:]
        n_w = R_wl @ h[:3] + jnp.cross(p_w - x_g, f_w)
        return jnp.concatenate([n_w, f_w])

    base_cols = [col_world(IC_b[:, k], R_wb, pos) for k in range(6)]
    joint_cols = [col_world(IC[j] @ arm.S[j], R_wb @ R[j],
                            pos + R_wb @ p[j]) for j in range(n)]
    return jnp.stack(base_cols + joint_cols, axis=1)


def fb_centroidal_momentum(ffm, quat, pos, q, vb, qd):
    """World-frame h_G of the free-flyer system, (6,)."""
    A = fb_centroidal_momentum_matrix(ffm, quat, pos, q)
    return A @ jnp.concatenate([vb, qd])
