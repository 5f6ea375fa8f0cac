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


def forward_dynamics(model: RobotModel, q, qd, u, gravity=-9.81, f_ext=None):
    """Reference host API ``forward_dynamics<T>``
    (``_forward_dynamics.py:196-252``). ``f_ext``: optional (n, 6) link-local
    external wrenches (see :func:`.rnea.rnea_fwd`) entering through the bias
    torque — q̈ = M⁻¹(u − c(q, q̇, f_ext))."""
    X = model.joint_transforms(q)
    v, a, f = rnea_fwd(model, X, qd, None, gravity, f_ext=f_ext)
    c, _ = rnea_bwd(model, X, f, qd)
    Minv_u = minv_inner(model, X)
    return fd_finish(Minv_u, u, c)


def forward_dynamics_diff(model: RobotModel, q, qd, u, gravity=-9.81,
                          f_ext=None):
    """Forward dynamics with an **analytic custom VJP**.

    ``jax.grad``/``jacrev`` through this function uses the engine's
    closed-form ∂q̈/∂(q, q̇, u) (Carpentier & Mansard; see
    :mod:`.fd_grad`) instead of differentiating the unrolled recursions —
    typically much cheaper and exactly what trajectory-optimization /
    policy-gradient outer loops want. The primal value is identical to
    :func:`forward_dynamics`.

    Gradients flow to (q, q̇, u) — and to ``f_ext`` when given (the adjoint
    of the backward wrench accumulation is a forward tree propagation:
    ``w_j = S_j (M⁻¹g)_j + X_j w_parent``, so ∂L/∂f_ext_j = w_j — O(n),
    no extra recursion through the gradient formulas). The robot-model
    parameters are treated as constants (closed over). If the model's array
    leaves are themselves tracers of an enclosing transformation (e.g. the
    model was passed as a traced ``jit`` argument), a ``custom_vjp`` closure
    over them is ill-formed — in that case this falls back to the plain
    AD-traceable primal, which is always correct (just a bigger backward
    graph).
    """
    import jax

    from .rnea_grad import rnea_grad_inner
    from .spatial import xform_apply

    if any(isinstance(leaf, jax.core.Tracer) for leaf in jax.tree.leaves(model)):
        return forward_dynamics(model, q, qd, u, gravity, f_ext=f_ext)

    topo = model.topology
    with_fext = f_ext is not None

    @jax.custom_vjp
    def _fd(q, qd, u, f_ext):
        return forward_dynamics(model, q, qd, u, gravity, f_ext=f_ext)

    def _fwd(q, qd, u, f_ext):
        X = model.joint_transforms(q)
        v, a0, f0 = rnea_fwd(model, X, qd, None, gravity, f_ext=f_ext)
        c, _ = rnea_bwd(model, X, f0, qd)
        Minv = densify(minv_inner(model, X))
        qdd = Minv @ (u - c)
        return qdd, (q, qd, qdd, Minv, f_ext)

    def _bwd(res, g):
        q, qd, qdd, Minv, f_ext = res
        X = model.joint_transforms(q)
        # vaf at the true q̈ INCLUDING f_ext — the analytic ∂ID formulas use
        # the accumulated f, whose X-derivative terms see the external
        # contribution (the direct ∂f_ext/∂q term is zero in the link frame)
        v, a, f = rnea_fwd(model, X, qd, qdd, gravity, f_ext=f_ext)
        _, f = rnea_bwd(model, X, f, None)
        dc_dq, dc_dqd = rnea_grad_inner(model, X, qd, v, a, f, gravity)
        # q̈ = M⁻¹(u − c):  ḡ_q = −(M⁻¹ ∂c/∂q)ᵀ g,  ḡ_u = M⁻¹ᵀ g = M⁻¹ g
        Mg = Minv @ g
        g_fext = None
        if with_fext:
            # adjoint of extract∘accumulate: ∂c/∂f_in applied transposed is
            # the velocity-style propagation below; c sees −f_ext, q̈ sees
            # −M⁻¹·c — the two signs cancel, leaving +Mg at the joints.
            w = [None] * topo.n
            for lvl in topo.levels:
                for i in lvl:
                    p = topo.parents[i]
                    wi = model.S[i] * Mg[i]
                    if p >= 0:
                        wi = wi + xform_apply(X[i], w[p])
                    w[i] = wi
            g_fext = jnp.stack(w)
        return (-(dc_dq.T @ Mg), -(dc_dqd.T @ Mg), Mg, g_fext)

    _fd.defvjp(_fwd, _bwd)
    return _fd(q, qd, u, f_ext)
