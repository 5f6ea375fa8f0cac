"""Analytical inverse-dynamics gradient: ∂c/∂q and ∂c/∂q̇.

TPU-native counterpart of the reference's
``inverse_dynamics_gradient_inner/_device/_kernel/host`` stack
(``/root/reference/algorithms/_inverse_dynamics_gradient.py``). The dataflow
is identical (temporaries → ∂v forward waves → ∂a local+propagate → ∂f in
three stages → backward accumulation → Sᵀ extraction; see SURVEY.md §3.4),
but the storage is **dense**: where the reference packs only
ancestor/subtree columns contiguously to fit CUDA shared memory
(``_inverse_dynamics_gradient.py:55-96``), we keep full (6, n) column blocks
per joint — the pruned columns are identically zero, dense updates are
numerically identical, and full-width vector ops map better onto the TPU VPU
than gather-heavy packed layouts (VMEM sizing removes the constraint the
compression served).

Single-state functions; batching via ``vmap`` in :mod:`..api`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.robot import RobotModel
from .rnea import gravity_accel, rnea, rnea_fwd, rnea_bwd
from .spatial import crf, crf_apply, crm, crm_apply, xform_apply, xform_T_apply


def rnea_grad_inner(model: RobotModel, X, qd, v, a, f, gravity=-9.81,
                    col_offset=0, col_count=None):
    """(∂c/∂q, ∂c/∂q̇) from precomputed transforms and the (v, a, f) state of
    a full RNEA evaluation (f backward-accumulated).

    Mirrors the reference inner (``_inverse_dynamics_gradient.py:27-650``)
    with the golden model's semantics (``_test.py:229-488``), including the
    damping term on the ∂c/∂q̇ diagonal (``_test.py:486``).

    Column blocking: the derivative columns (differentiation directions) are
    mutually independent, so a block of ``col_count`` columns starting at
    ``col_offset`` can be computed in isolation — this is the framework's
    tensor-parallel axis for sharding the Jacobian across a mesh
    (:mod:`gridcodegenerator_tpu.parallel`). ``col_offset`` may be a traced
    scalar (e.g. derived from ``jax.lax.axis_index``); ``col_count`` must be
    static. Defaults compute all n columns. Returns (dc_dq, dc_dqd), each
    (n, col_count).
    """
    topo = model.topology
    n = topo.n
    parents = topo.parents
    dtype = X.dtype
    a_base = gravity_accel(gravity, dtype)
    cnt = n if col_count is None else col_count
    col_ids = col_offset + jnp.arange(cnt)

    def sow(i, vec):
        """Outer-product seed: place `vec` in the column for joint i (if that
        column is inside this block). Constant-folds to an ``.at[:, i]``
        update when the block is static and full."""
        return jnp.outer(vec, (col_ids == i).astype(dtype))

    # ---- temporaries (reference ``:123-164``) -----------------------------
    Iv = jnp.einsum("nij,nj->ni", model.inertia, v)
    Xv = jnp.stack([
        xform_apply(X[i], v[parents[i]]) if parents[i] >= 0
        else jnp.zeros(6, dtype)
        for i in range(n)])
    Xa = jnp.stack([
        xform_apply(X[i], a[parents[i]] if parents[i] >= 0 else a_base)
        for i in range(n)])
    # mxS(S, w) = crm(w)·S = −crm(S)·w; we carry crm(S)·w and negate at use.
    SxXv = crm_apply(model.S, Xv)
    SxXa = crm_apply(model.S, Xa)
    Sxv = crm_apply(model.S, v)
    # Backward correction term: ∂Xᵀ/∂q·f = Xᵀ·crf(S)·f (force cross). The
    # reference uses the motion cross here (``_test.py:311``), which agrees
    # for revolute joints but is wrong for prismatic ones — we use the
    # correct formula (validated against jax.jacfwd).
    Sxf = crf_apply(model.S, f)
    cS = crm(model.S)            # (n, 6, 6)
    FxvI = crf(v) @ model.inertia  # (n, 6, 6) = crf(v_i) · I_i

    # ---- forward: ∂v (reference ``:189-247``) -----------------------------
    dv_dq = [None] * n   # each (6, cnt): columns are ∂/∂q_j of this block
    dv_dqd = [None] * n
    for i in range(n):  # topological order: parents first
        p = parents[i]
        if p >= 0:
            dq = X[i] @ dv_dq[p]
            dqd = X[i] @ dv_dqd[p]
            dq = dq - sow(i, SxXv[i])
        else:
            dq = jnp.zeros((6, cnt), dtype)
            dqd = jnp.zeros((6, cnt), dtype)
        dqd = dqd + sow(i, model.S[i])
        dv_dq[i], dv_dqd[i] = dq, dqd

    # ---- ∂a: local term for every joint (reference ``:268-290``) ----------
    da_dq = [None] * n
    da_dqd = [None] * n
    for i in range(n):
        da_dq[i] = (-qd[i]) * (cS[i] @ dv_dq[i]) - sow(i, SxXa[i])
        da_dqd[i] = (-qd[i]) * (cS[i] @ dv_dqd[i]) - sow(i, Sxv[i])
    # ---- ∂a: propagate down the tree (reference ``:312-339``) -------------
    for i in range(n):
        p = parents[i]
        if p >= 0:
            da_dq[i] = da_dq[i] + X[i] @ da_dq[p]
            da_dqd[i] = da_dqd[i] + X[i] @ da_dqd[p]

    # ---- ∂f: local stages (reference ``:360-430``) -------------------------
    df_dq = [None] * n
    df_dqd = [None] * n
    for i in range(n):
        # crf(·)·Iv_i applied column-wise: crf_apply broadcasts over rows of
        # the transposed column block.
        df_dq[i] = (crf_apply(dv_dq[i].T, Iv[i]).T
                    + model.inertia[i] @ da_dq[i] + FxvI[i] @ dv_dq[i])
        df_dqd[i] = (crf_apply(dv_dqd[i].T, Iv[i]).T
                     + model.inertia[i] @ da_dqd[i] + FxvI[i] @ dv_dqd[i])

    # ---- backward: accumulate ∂f up the tree (reference ``:477-541``) ------
    for i in range(n - 1, -1, -1):  # children before parents
        p = parents[i]
        if p >= 0:
            df_dq[p] = df_dq[p] + X[i].T @ df_dq[i]
            df_dqd[p] = df_dqd[p] + X[i].T @ df_dqd[i]
            # correction on the own column (see crf-vs-crm note above):
            # +Xᵀ·(crf(S)·f)
            df_dq[p] = df_dq[p] + sow(i, xform_T_apply(X[i], Sxf[i]))

    # ---- extract (reference ``:592-635``) ----------------------------------
    dc_dq = jnp.stack([model.S[i] @ df_dq[i] for i in range(n)])
    dc_dqd = jnp.stack([model.S[i] @ df_dqd[i] for i in range(n)])
    # damping on the ∂c/∂q̇ diagonal (those diagonal entries in this block)
    diag_mask = (col_ids[None, :] == jnp.arange(n)[:, None]).astype(dtype)
    dc_dqd = dc_dqd + model.damping[:, None] * diag_mask
    return dc_dq, dc_dqd


def inverse_dynamics_gradient(model: RobotModel, q, qd, qdd=None, gravity=-9.81,
                              f_ext=None):
    """Reference host API ``inverse_dynamics_gradient<T>``
    (``_inverse_dynamics_gradient.py:762-834``): returns the (n, 2n) matrix
    ``[∂c/∂q | ∂c/∂q̇]``. ``f_ext``: optional (n, 6) link-local external
    wrenches — they enter only through the accumulated f consumed by the
    X-derivative terms (constant in the link frame), so the analytic
    recursion is exact unchanged (see :func:`.rnea.rnea_vaf`)."""
    X = model.joint_transforms(q)
    v, a, f = rnea_fwd(model, X, qd, qdd, gravity, f_ext=f_ext)
    _, f = rnea_bwd(model, X, f, None)
    dc_dq, dc_dqd = rnea_grad_inner(model, X, qd, v, a, f, gravity)
    return jnp.concatenate([dc_dq, dc_dqd], axis=1)
