"""Analytical mass-matrix inverse (direct M⁻¹ recursion).

TPU-native counterpart of the reference's ``direct_minv`` stack
(``/root/reference/algorithms/_direct_minv.py``; algorithm: Carpentier,
"Analytical inverse of the joint space inertia matrix"). Backward sweep over
the tree builds the articulated-body quantities (U, D⁻¹, Ia) and the upper
triangle of M⁻¹; the forward sweep is inherently serial in the joint index
(the reference notes the column-slice dependency at
``_direct_minv.py:304-310``) and is unrolled at trace time.

Where the reference packs everything into shared memory with subtree-masked
column loops, the TPU design uses dense (n,·,n) tensors with static
column masks: columns outside a joint's subtree are identically zero, so the
dense updates are numerically identical to the reference's masked ones while
mapping onto full-width vector ops.

Output convention matches the reference: the raw result is the **upper
triangle** only (``_direct_minv.py:32,390``); use ``dense=True`` /
:func:`densify` (the golden ``test_densify_Minv``, ``_test.py:204-211``) for
the symmetric matrix.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.robot import RobotModel


def minv_inner(model: RobotModel, X):
    """Upper-triangular M⁻¹ from precomputed joint transforms X (n,6,6)."""
    topo = model.topology
    n = topo.n
    dtype = X.dtype

    IA = [model.inertia[i] for i in range(n)]
    Minv_rows = [jnp.zeros(n, dtype) for _ in range(n)]
    F = [jnp.zeros((6, n), dtype) for _ in range(n)]
    U = [None] * n
    Dinv = [None] * n

    # ---- backward sweep: children before parents (ids are topological) ----
    for i in range(n - 1, -1, -1):
        S = model.S[i]
        Ui = IA[i] @ S
        # D = SᵀU + armature: the reflected rotor inertia enters the
        # articulated recursion only through the joint-space D term
        # (Featherstone §9.6 / MuJoCo "armature"), yielding (M + diag(a))⁻¹.
        Di = 1.0 / (jnp.dot(S, Ui) + model.armature[i])
        U[i], Dinv[i] = Ui, Di
        # Minv[i,i] = D⁻¹; Minv[i, subtree] −= D⁻¹ · Sᵀ F_i  — computed densely:
        # F_i is zero outside subtree(i), so the extra columns add exact zeros.
        row = Minv_rows[i].at[i].add(Di)
        row = row - Di * (S @ F[i])
        Minv_rows[i] = row
        p = topo.parents[i]
        if p >= 0:
            Fi = F[i] + jnp.outer(Ui, row)
            F[i] = Fi
            F[p] = F[p] + X[i].T @ Fi
            Ia = IA[i] - jnp.outer(Ui, Di * Ui)
            IA[p] = IA[p] + X[i].T @ Ia @ X[i]

    # ---- forward sweep: serial over joints (column-slice dependency) ------
    for i in range(n):
        p = topo.parents[i]
        geq = jnp.asarray(np.arange(n) >= i)  # static mask: columns i..n-1
        if p >= 0:
            UX = U[i] @ X[i]
            Minv_rows[i] = Minv_rows[i] - jnp.where(geq, Dinv[i] * (UX @ F[p]), 0.0)
        new_cols = jnp.outer(model.S[i], Minv_rows[i])
        if p >= 0:
            new_cols = new_cols + X[i] @ F[p]
        F[i] = jnp.where(geq, new_cols, F[i])

    return jnp.stack(Minv_rows)


def densify(Minv_upper):
    """Mirror the strict upper triangle into the lower one
    (golden ``test_densify_Minv``)."""
    n = Minv_upper.shape[-1]
    upper = jnp.triu(Minv_upper)
    strict = jnp.triu(Minv_upper, 1)
    return upper + jnp.swapaxes(strict, -1, -2)


def direct_minv(model: RobotModel, q, dense: bool = False):
    """M⁻¹(q) — reference host API ``direct_minv<T>``
    (``_direct_minv.py:456-517``)."""
    Minv = minv_inner(model, model.joint_transforms(q))
    return densify(Minv) if dense else Minv
