"""Inertial-parameter regressor: τ = Y(q, q̇, q̈)·θ.

System-identification layer (beyond the reference — GRiDCodeGenerator has
no regressor): joint torques are LINEAR in each link's ten barycentric
parameters θᵢ = [m, h (3), vech(Ī) (6)] with h = m·c the first mass moment
and Ī the rotational inertia about the *link origin* (both in link
coordinates — exactly how ``models/urdf.py::spatial_inertia`` packs the
6×6: I[:3,:3] = Ī, I[:3,3:] = skew(h), I[3:,3:] = m·1₃). The regressor
factors the RNEA wrench f = I·a + v×*(I·v) into a per-link 6×10 matrix
A(v, a) and backward-propagates the blocks exactly like wrenches, so
Y costs one velocity/acceleration sweep plus one matrix backward sweep.

Standard uses: least-squares inertial identification from joint-torque
logs (θ* = argmin ‖Y·θ − τ‖²), adaptive-control parameter updates, and
checking which parameter combinations are identifiable (the null space of
the stacked Y). Gravity is covered automatically — the fictitious base
acceleration enters ``a`` (reference convention, ``_test.py:13-14``).

vech order: (Ixx, Ixy, Ixz, Iyy, Iyz, Izz).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.robot import RobotModel
from .rnea import rnea_fwd


def _skew(v):
    z = jnp.zeros((), v.dtype)
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z]),
    ])


def _L(w):
    """3×6 with L(w)·vech(Ī) = Ī·w (vech order Ixx,Ixy,Ixz,Iyy,Iyz,Izz)."""
    z = jnp.zeros((), w.dtype)
    return jnp.stack([
        jnp.stack([w[0], w[1], w[2], z, z, z]),
        jnp.stack([z, w[0], z, w[1], w[2], z]),
        jnp.stack([z, z, w[0], z, w[1], w[2]]),
    ])


def _body_regressor(v, a):
    """A(v, a) ∈ ℝ^{6×10} with f = A·θ the link's Newton-Euler wrench.

    Derivation (engine layout, spatial vectors [angular; linear],
    f = I·a + crf(v)·(I·v), crf(v) = [[skew(ω), skew(v_l)], [0, skew(ω)]]):
      f_ang = Ī·α + h×a_l + ω×(Ī·ω) + ω×(h×v_l) + v_l×(ω×h)
      f_lin = α×h + m·(a_l + ω×v_l) + ω×(ω×h)
    """
    w, vl = v[:3], v[3:]
    al, aa = a[3:], a[:3]
    Sw, Svl, Sal, Saa = _skew(w), _skew(vl), _skew(al), _skew(aa)
    col_m_lin = al + jnp.cross(w, vl)                         # (3,)
    A_h_ang = -Sal - Sw @ Svl + Svl @ Sw                      # (3,3)
    A_h_lin = Saa + Sw @ Sw                                   # (3,3)
    A_I_ang = _L(aa) + Sw @ _L(w)                             # (3,6)
    z31 = jnp.zeros((3, 1), v.dtype)
    z36 = jnp.zeros((3, 6), v.dtype)
    top = jnp.concatenate([z31, A_h_ang, A_I_ang], axis=1)    # (3,10)
    bot = jnp.concatenate([col_m_lin[:, None], A_h_lin, z36], axis=1)
    return jnp.concatenate([top, bot], axis=0)                # (6,10)


def inertial_params(model: RobotModel):
    """θ (10n,): the parameter vector of the model's own inertias, so that
    ``joint_torque_regressor(model, q, qd, qdd) @ inertial_params(model)``
    equals ``inverse_dynamics(model, q, qd, qdd, damping off)``."""
    thetas = []
    for i in range(model.n):
        I6 = model.inertia[i]
        m = jnp.trace(I6[3:, 3:]) / 3.0
        H = I6[:3, 3:]
        h = jnp.stack([H[2, 1], H[0, 2], H[1, 0]])
        Ibar = I6[:3, :3]
        vech = jnp.stack([Ibar[0, 0], Ibar[0, 1], Ibar[0, 2],
                          Ibar[1, 1], Ibar[1, 2], Ibar[2, 2]])
        thetas.append(jnp.concatenate([m[None], h, vech]))
    return jnp.concatenate(thetas)


def joint_torque_regressor(model: RobotModel, q, qd, qdd,
                           gravity=-9.81, with_damping: bool = False,
                           with_armature: bool = False):
    """Y (n, 10n) — extendable with ``with_damping`` (appends diag(q̇):
    viscous friction is linear in the damping coefficients, golden-model
    semantics ``_test.py:103-105``) and ``with_armature`` (appends
    diag(q̈): the reflected rotor torque aᵢ·q̈ᵢ is linear in the armature —
    so gearbox inertia is identifiable from torque logs exactly like the
    link parameters). Depends on the *kinematic* constants only — two
    models differing in inertias/damping/armature share one Y."""
    topo = model.topology
    n = topo.n
    X = model.joint_transforms(q)
    v, a, _ = rnea_fwd(model, X, qd, qdd, gravity)

    # per-link blocks, backward-propagated like wrenches (F_p += Xᵀ F_i)
    F = [None] * n  # each (6, 10n), nonzero only on subtree blocks
    for i in range(n - 1, -1, -1):
        Ai = _body_regressor(v[i], a[i])
        blocks = jnp.zeros((6, 10 * n), q.dtype)
        blocks = blocks.at[:, 10 * i:10 * (i + 1)].set(Ai)
        if F[i] is not None:
            blocks = blocks + F[i]
        p = topo.parents[i]
        if p >= 0:
            contrib = X[i].T @ blocks
            F[p] = contrib if F[p] is None else F[p] + contrib
        F[i] = blocks
    Y = jnp.stack([model.S[i] @ F[i] for i in range(n)])  # (n, 10n)
    if with_damping:
        Y = jnp.concatenate([Y, jnp.diag(qd)], axis=1)
    if with_armature:
        Y = jnp.concatenate([Y, jnp.diag(qdd)], axis=1)
    return Y
