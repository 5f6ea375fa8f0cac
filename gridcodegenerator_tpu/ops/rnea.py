"""Inverse dynamics — the recursive Newton-Euler algorithm (RNEA).

TPU-native counterpart of the reference's emitted
``inverse_dynamics_inner/_device/_kernel/host`` stack
(``/root/reference/algorithms/_inverse_dynamics.py``): the per-joint
forward/backward recursions are unrolled over the kinematic tree at JAX trace
time — exactly the specialization the reference performs at CUDA-emission
time — and the batch dimension is supplied by ``vmap`` (replacing the
one-block-per-timestep grid, ``_inverse_dynamics.py:394``).

All functions here operate on a single state (unbatched); see
:mod:`gridcodegenerator_tpu.api` for the batched/jitted/sharded entry points.

Variant map onto the reference's four inner variants
(``_inverse_dynamics.py:497-516``):
    compute_c × use_qdd  →  ``rnea(..., qdd=None | array)`` returns c,v,a,f
    vaf-only             →  ``rnea_vaf`` (skips the c extraction)
Damping semantics follow the golden model (``_test.py:103-105``):
``c += damping · q̇`` — implemented here (the reference's generated CUDA
omits it; SURVEY.md §2 parity nuance).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.robot import RobotModel
from .spatial import crm_apply, crf_apply, xform_apply, xform_T_apply


def gravity_accel(gravity, dtype):
    """The fictitious base acceleration ``[0,0,0,0,0,−GRAVITY]``
    (reference convention, ``_test.py:13-14``)."""
    return jnp.zeros(6, dtype).at[5].set(-gravity)


def rnea_fwd(model: RobotModel, X, qd, qdd=None, gravity=-9.81, v_known=None,
             f_ext=None):
    """Forward sweep → (v, a, f_body), each (n, 6).

    ``f_body`` is the per-link Newton-Euler wrench *before* backward
    accumulation (reference ``_inverse_dynamics.py:210-239``).

    Args:
      X: (n, 6, 6) joint transforms from ``model.joint_transforms(q)`` —
         hoisted out so composed algorithms (FD, ∇FD) share one evaluation.
      v_known: optional precomputed link velocities (n, 6). ``v`` does not
        depend on q̈, so the ∇FD pipeline reuses it instead of re-running the
        velocity recursion (the optimization the reference leaves as a TODO,
        ``_forward_dynamics_gradient.py:11-14``).
      f_ext: optional (n, 6) external wrenches ``[moment; force]`` applied to
        each link, expressed in the LINK-LOCAL frame (Pinocchio's ``fext``
        semantics — the reference has no external-force input). Subtracted
        from the Newton–Euler body wrench: ``f_i = I a + v ×* Iv − f_ext_i``.
        Use :func:`..kinematics.point_force_fext` to build one from a
        world-frame point force.
    """
    topo = model.topology
    a_base = gravity_accel(gravity, X.dtype)
    v = [None] * topo.n if v_known is None else [v_known[i] for i in range(topo.n)]
    a = [None] * topo.n
    for lvl in topo.levels:  # trace-time unrolled BFS waves
        for i in lvl:
            p = topo.parents[i]
            Sqd = model.S[i] * qd[i]
            if v_known is None:
                v[i] = Sqd if p < 0 else xform_apply(X[i], v[p]) + Sqd
            ai = xform_apply(X[i], a_base if p < 0 else a[p])
            # Coriolis term v × S·q̇ — identically zero at the root (v ∥ S·q̇)
            # but kept uniform: it is exact-zero in floating point too.
            ai = ai + crm_apply(v[i], Sqd)
            if qdd is not None:
                ai = ai + model.S[i] * qdd[i]
            a[i] = ai
    v = jnp.stack(v)
    a = jnp.stack(a)
    Iv = jnp.einsum("nij,nj->ni", model.inertia, v)
    f = jnp.einsum("nij,nj->ni", model.inertia, a) + crf_apply(v, Iv)
    if f_ext is not None:
        f = f - f_ext
    return v, a, f


def rnea_bwd(model: RobotModel, X, f, qd=None, qdd=None):
    """Backward sweep: accumulate wrenches up the tree and extract torques.

    Returns (c, f_acc). ``c`` includes the damping term when ``qd`` is given
    (golden-model semantics) and the rotor/armature torque ``aᵢ·q̈ᵢ`` when
    ``qdd`` is given (the reflected inertia acts in joint space only — it is
    not a spatial wrench, so ``f_acc`` is untouched)."""
    topo = model.topology
    f = [f[i] for i in range(topo.n)]
    for i in range(topo.n - 1, -1, -1):  # children before parents
        p = topo.parents[i]
        if p >= 0:
            f[p] = f[p] + xform_T_apply(X[i], f[i])
    c = jnp.stack([jnp.dot(model.S[i], f[i]) for i in range(topo.n)])
    if qd is not None:
        c = c + model.damping * qd
    if qdd is not None:
        c = c + model.armature * qdd
    return c, jnp.stack(f)


def rnea(model: RobotModel, q, qd, qdd=None, gravity=-9.81, f_ext=None):
    """Full inverse dynamics.

    Returns ``(c, v, a, f)`` where ``c`` is the joint torque/force vector,
    ``f`` the backward-accumulated wrenches — matching the golden model's
    ``test_rnea`` (``/root/reference/_test.py:109-115``). ``f_ext``: optional
    (n, 6) link-local external wrenches (see :func:`rnea_fwd`)."""
    X = model.joint_transforms(q)
    v, a, f = rnea_fwd(model, X, qd, qdd, gravity, f_ext=f_ext)
    c, f = rnea_bwd(model, X, f, qd, qdd)
    return c, v, a, f


def inverse_dynamics(model: RobotModel, q, qd, qdd=None, gravity=-9.81,
                     f_ext=None):
    """Torques only — the reference host API ``inverse_dynamics<T>``
    (``_inverse_dynamics.py:423-495``)."""
    return rnea(model, q, qd, qdd, gravity, f_ext=f_ext)[0]


def rnea_vaf(model: RobotModel, q, qd, qdd=None, gravity=-9.81, f_ext=None):
    """(v, a, f_acc) without the torque extraction — the reference's
    ``inverse_dynamics_inner_vaf`` variant (``_inverse_dynamics.py:23,55``),
    consumed by the gradient pass. With ``f_ext`` the accumulated wrenches
    include the (locally constant) external contribution, which is exactly
    what keeps the analytic ∂ID formulas valid unchanged — the direct term
    ∂f_ext/∂(q,q̇) is zero in the link frame, and the X-derivative terms use
    the true accumulated f."""
    X = model.joint_transforms(q)
    v, a, f = rnea_fwd(model, X, qd, qdd, gravity, f_ext=f_ext)
    _, f = rnea_bwd(model, X, f, None)
    return v, a, f
