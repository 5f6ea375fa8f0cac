"""Forward dynamics: q̈ = M⁻¹ · (u − c(q, q̇)).

TPU-native counterpart of the reference's ``forward_dynamics`` composition
(``/root/reference/algorithms/_forward_dynamics.py:72-112``: minv_inner +
id_inner(compute_c, q̈=0) + the symmetric-upper ``forward_dynamics_finish``
matmul, ``:21-49``). The joint transforms are evaluated once and shared by
both sub-algorithms (the reference shares them via shared memory inside one
kernel)."""

from __future__ import annotations

import jax.numpy as jnp

from ..models.robot import RobotModel
from .minv import densify, minv_inner
from .rnea import rnea_bwd, rnea_fwd


def fd_finish(Minv_upper, u, c):
    """q̈ = M⁻¹ (u − c) using the symmetric-upper M⁻¹ (the reference's index
    trick ``(row≤col)·[row,col] + (row>col)·[col,row]``,
    ``_forward_dynamics.py:43-45``, expressed densely)."""
    return densify(Minv_upper) @ (u - c)


def forward_dynamics(model: RobotModel, q, qd, u, gravity=-9.81):
    """Reference host API ``forward_dynamics<T>``
    (``_forward_dynamics.py:196-252``)."""
    X = model.joint_transforms(q)
    v, a, f = rnea_fwd(model, X, qd, None, gravity)
    c, _ = rnea_bwd(model, X, f, qd)
    Minv_u = minv_inner(model, X)
    return fd_finish(Minv_u, u, c)
