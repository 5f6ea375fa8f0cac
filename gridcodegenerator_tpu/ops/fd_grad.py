"""Analytical forward-dynamics gradient: ∂q̈/∂q and ∂q̈/∂q̇.

TPU-native counterpart of the reference's ``forward_dynamics_gradient`` stack
(``/root/reference/algorithms/_forward_dynamics_gradient.py``), using the
Carpentier & Mansard identity (cited at ``:70``):

    ∂q̈/∂u = −M⁻¹ · ∂c/∂u   evaluated at q̈ = FD(q, q̇, u).

Pipeline (reference inline sequence, ``:7-57``):
  M⁻¹ → c = ID(q, q̇, 0) → q̈ = M⁻¹(u − c) → (v,a,f) at true q̈ → ∂ID → −M⁻¹·∂c.
Improvements over the reference: the joint transforms X(q) are evaluated once
for the whole pipeline, and the velocity recursion is not repeated for the
second RNEA sweep (v is q̈-independent — the TODO the reference records at
``:11-14``)."""

from __future__ import annotations

import jax.numpy as jnp

from ..models.robot import RobotModel
from .minv import densify, minv_inner
from .rnea import rnea_bwd, rnea_fwd
from .rnea_grad import rnea_grad_inner


def forward_dynamics_gradient(model: RobotModel, q, qd, u, gravity=-9.81,
                              f_ext=None):
    """∂q̈/∂(q, q̇) as an (n, 2n) matrix — reference host API
    ``forward_dynamics_gradient<T>`` in its (q, q̇, u) input mode
    (``_forward_dynamics_gradient.py:74-81``). ``f_ext``: optional (n, 6)
    link-local external wrenches (exact — see
    :func:`.rnea_grad.inverse_dynamics_gradient`)."""
    X = model.joint_transforms(q)
    # ID at q̈ = 0 for the bias torque c
    v, a0, f0 = rnea_fwd(model, X, qd, None, gravity, f_ext=f_ext)
    c, _ = rnea_bwd(model, X, f0, qd)
    # analytic M⁻¹ and q̈
    Minv = densify(minv_inner(model, X))
    qdd = Minv @ (u - c)
    # (v, a, f) at the true q̈ — v reused, only a/f recomputed
    _, a, f = rnea_fwd(model, X, qd, qdd, gravity, v_known=v, f_ext=f_ext)
    _, f = rnea_bwd(model, X, f, None)
    dc_dq, dc_dqd = rnea_grad_inner(model, X, qd, v, a, f, gravity)
    return -Minv @ jnp.concatenate([dc_dq, dc_dqd], axis=1)


def forward_dynamics_gradient_cols(model: RobotModel, q, qd, u, gravity=-9.81,
                                   col_offset=0, col_count=None):
    """Column-blocked ∇FD: returns ``(ddq_blk, ddqd_blk)``, each
    (n, col_count) — the columns ``[col_offset, col_offset+col_count)`` of
    ∂q̈/∂q and ∂q̈/∂q̇. The blocks are independent across ``col_offset`` (the
    Jacobian's tensor-parallel axis); ``col_offset`` may be traced (e.g.
    ``jax.lax.axis_index``-derived inside ``shard_map``)."""
    X = model.joint_transforms(q)
    v, a0, f0 = rnea_fwd(model, X, qd, None, gravity)
    c, _ = rnea_bwd(model, X, f0, qd)
    Minv = densify(minv_inner(model, X))
    qdd = Minv @ (u - c)
    _, a, f = rnea_fwd(model, X, qd, qdd, gravity, v_known=v)
    _, f = rnea_bwd(model, X, f, None)
    dc_dq, dc_dqd = rnea_grad_inner(model, X, qd, v, a, f, gravity,
                                    col_offset=col_offset, col_count=col_count)
    return -Minv @ dc_dq, -Minv @ dc_dqd


def forward_dynamics_gradient_qdd_minv(model: RobotModel, q, qd, qdd, Minv,
                                       gravity=-9.81):
    """The reference's second input mode (``USE_QDD_MINV_FLAG``,
    ``_forward_dynamics_gradient.py:119-127``): q̈ and M⁻¹ already known
    (e.g. produced by a preceding FD call), skip their recomputation.
    ``Minv`` must be dense symmetric (use :func:`..ops.minv.densify` on an
    upper-triangular result first)."""
    X = model.joint_transforms(q)
    v, a, f = rnea_fwd(model, X, qd, qdd, gravity)
    _, f = rnea_bwd(model, X, f, None)
    dc_dq, dc_dqd = rnea_grad_inner(model, X, qd, v, a, f, gravity)
    return -Minv @ jnp.concatenate([dc_dq, dc_dqd], axis=1)
