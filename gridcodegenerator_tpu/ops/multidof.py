"""Multi-dof joints: the full (6, k) motion-subspace generalization.

The reference supports only single-dof joints — S is a one-hot 6-vector
(``/root/reference/helpers/_spatial_algebra_helpers.py:13``). This module
generalizes the dynamics recursions to joints with motion subspaces
S ∈ ℝ^{6×k}, concretely:

* **spherical** (ball) joints: k = 3 angular dof. Position coordinates are a
  unit quaternion (w, x, y, z) per joint (4 slots in q); velocity coordinates
  are the child-relative body angular velocity ω (3 slots in q̇) — so
  S = [I₃; 0] is *constant* and the Ṡ·q̇ bias vanishes (the classic
  Featherstone parameterization, which a rotation-vector chart would not
  give). nq ≠ nv for these robots: ``MultiDofModel.nq``/``.nv``.
* revolute / prismatic joints coexist unchanged (k = 1).

Algorithms: RNEA (bias/full), CRBA mass matrix, forward dynamics via a dense
SPD Cholesky solve (for mixed-dof trees the direct-M⁻¹ recursion needs k×k
sub-inverses per joint; at nv ≤ ~40 a batched Cholesky is simpler and maps
straight onto the MXU), tangent-space FD Jacobians, and a manifold
integrator. Everything is single-state, trace-time unrolled, jit/vmap-ready —
the same design as :mod:`.rnea` — with gradients through ``jax.jacfwd`` in
the quaternion tangent space.

Validation (tests/test_multidof.py): a spherical joint is *exactly* a
3-revolute (z, y, x, zero-offset) chain away from that chain's gimbal lock,
so every quantity cross-checks against the existing single-dof stack through
the state mapping (quaternion ← Euler product, ω ← jvp of the rotation), plus
energy conservation of a tumbling ball-joint chain *through* gimbal lock.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.robot import _origin_xform, rpy_to_matrix
from ..models.topology import Topology
from ..models.urdf import RobotDescription, skew
from .freeflyer import quat_exp_body, quat_mul, quat_to_rot
from .spatial import crf, crf_apply, crf_swap, crm, crm_apply


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MultiDofModel:
    """Per-robot constants for mixed single-/multi-dof trees."""

    XT: jax.Array        # (n_joints, 6, 6) constant origin transforms
    S: jax.Array         # (n_joints, 6, 6) motion subspaces, zero-padded
    inertia: jax.Array   # (n_joints, 6, 6)
    damping: jax.Array   # (nv,) per velocity coordinate
    armature: jax.Array  # (nv,) reflected rotor inertia per velocity
    #                      coordinate (MuJoCo semantics: D blocks and the
    #                      CRBA diagonal gain diag(aᵢ); free joints are
    #                      normally 0 — a floating base has no motor)
    axis: jax.Array      # (n_joints, 3) single-dof axes (unused for spherical)

    topology: Topology = dataclasses.field(metadata=dict(static=True))
    name: str = dataclasses.field(metadata=dict(static=True))
    joint_types: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # static coordinate layout: (start, width) per joint
    q_slices: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    v_slices: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def n_joints(self) -> int:
        return self.topology.n

    @property
    def nq(self) -> int:
        s, w = self.q_slices[-1]
        return s + w

    @property
    def nv(self) -> int:
        s, w = self.v_slices[-1]
        return s + w

    def dof(self, i: int) -> int:
        return self.v_slices[i][1]


def multidof_model_from_description(desc: RobotDescription,
                                    dtype=jnp.float64) -> MultiDofModel:
    n = desc.n
    XT = np.zeros((n, 6, 6))
    S = np.zeros((n, 6, 6))
    q_slices, v_slices = [], []
    qs = vs = 0
    for i in range(n):
        R = rpy_to_matrix(desc.origin_rpy[i])
        XT[i] = _origin_xform(R, desc.origin_xyz[i])
        t = desc.joint_types[i]
        if t == "floating":
            # 6-dof free joint: q = (quat w,x,y,z; position in parent
            # coords), velocity = child-body twist [ω; v], S = I₆
            S[i] = np.eye(6)
            q_slices.append((qs, 7)); v_slices.append((vs, 6))
            qs += 7; vs += 6
        elif t == "spherical":
            S[i, :3, :3] = np.eye(3)
            q_slices.append((qs, 4)); v_slices.append((vs, 3))
            qs += 4; vs += 3
        elif t == "prismatic":
            S[i, 3:, 0] = desc.axis[i]
            q_slices.append((qs, 1)); v_slices.append((vs, 1))
            qs += 1; vs += 1
        else:  # revolute
            S[i, :3, 0] = desc.axis[i]
            q_slices.append((qs, 1)); v_slices.append((vs, 1))
            qs += 1; vs += 1
    damping = np.concatenate(
        [np.full(v_slices[i][1], desc.damping[i]) for i in range(n)])
    arm_j = (np.zeros(n) if desc.armature is None
             else np.asarray(desc.armature, np.float64))
    armature = np.concatenate(
        [np.full(v_slices[i][1], arm_j[i]) for i in range(n)])
    return MultiDofModel(
        XT=jnp.asarray(XT, dtype), S=jnp.asarray(S, dtype),
        inertia=jnp.asarray(desc.inertia, dtype),
        damping=jnp.asarray(damping, dtype),
        armature=jnp.asarray(armature, dtype),
        axis=jnp.asarray(desc.axis, dtype),
        topology=desc.topology, name=desc.name,
        joint_types=tuple(desc.joint_types),
        q_slices=tuple(q_slices), v_slices=tuple(v_slices))


# ------------------------------------------------------------------- kinematics
def _rot_xform_T(E):
    """blockdiag(E, E) (6,6) from a 3×3 rotation E (child←parent)."""
    z = jnp.zeros((3, 3), E.dtype)
    return jnp.block([[E, z], [z, E]])


def md_joint_transforms(model: MultiDofModel, q):
    """Per-joint motion transforms X_i (child ← parent), list of (6,6)."""
    X = []
    for i in range(model.n_joints):
        s, w = model.q_slices[i]
        qi = jax.lax.dynamic_slice(q, (s,), (w,))
        t = model.joint_types[i]
        if t == "floating":
            # free 6-dof joint: rotation ∘ translation Plücker transform
            # [[E, 0], [−E p̂, E]] with E = R(quat)ᵀ, p in parent coords
            E = quat_to_rot(qi[:4]).T
            p = qi[4:7]
            XJ = jnp.zeros((6, 6), q.dtype)
            XJ = XJ.at[:3, :3].set(E).at[3:, 3:].set(E)
            XJ = XJ.at[3:, :3].set(-E @ skew_j(p))
        elif t == "spherical":
            # parent←child rotation R(quat); motion transform block E = Rᵀ
            E = quat_to_rot(qi).T
            XJ = _rot_xform_T(E)
        elif t == "prismatic":
            a = model.axis[i]
            L = jnp.zeros((6, 6), q.dtype).at[3:, :3].set(-skew_j(a))
            XJ = jnp.eye(6, dtype=q.dtype) + qi[0] * L
        else:
            a = model.axis[i]
            K = skew_j(a)
            E = (jnp.eye(3, dtype=q.dtype) - jnp.sin(qi[0]) * K
                 + (1.0 - jnp.cos(qi[0])) * (K @ K))
            XJ = _rot_xform_T(E)
        X.append(XJ @ model.XT[i])
    return X


def skew_j(v):
    z = jnp.zeros((), v.dtype)
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z]),
    ])


# ------------------------------------------------------------------- dynamics
def _vslice(model, arr, i):
    s, w = model.v_slices[i]
    return jax.lax.dynamic_slice(arr, (s,), (w,))


def md_rnea(model: MultiDofModel, q, qd, qdd=None, gravity=-9.81):
    """Generalized RNEA: c (nv,) plus (v, a, f) lists — the (6,k) form of
    :func:`.rnea.rnea` (reference ``_inverse_dynamics.py``)."""
    topo = model.topology
    n = topo.n
    dtype = q.dtype
    a_base = jnp.zeros(6, dtype).at[5].set(-gravity)
    X = md_joint_transforms(model, q)
    v = [None] * n
    a = [None] * n
    f = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Si = model.S[i][:, :model.dof(i)]
        vJ = Si @ _vslice(model, qd, i)
        v[i] = vJ if p < 0 else X[i] @ v[p] + vJ
        ai = X[i] @ (a_base if p < 0 else a[p]) + crm_apply(v[i], vJ)
        if qdd is not None:
            ai = ai + Si @ _vslice(model, qdd, i)
        a[i] = ai
        Iv = model.inertia[i] @ v[i]
        f[i] = model.inertia[i] @ a[i] + crf_apply(v[i], Iv)
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            f[p] = f[p] + X[i].T @ f[i]
    c = jnp.concatenate([
        model.S[i][:, :model.dof(i)].T @ f[i] for i in range(n)])
    c = c + model.damping * qd
    if qdd is not None:
        c = c + model.armature * qdd  # reflected rotor torque (joint space)
    return c, v, a, f


def md_inverse_dynamics(model: MultiDofModel, q, qd, qdd=None, gravity=-9.81):
    return md_rnea(model, q, qd, qdd, gravity)[0]


def md_crba(model: MultiDofModel, q):
    """Generalized composite-rigid-body mass matrix M (nv, nv)."""
    topo = model.topology
    n = topo.n
    nv = model.nv
    X = md_joint_transforms(model, q)
    IC = [model.inertia[i] for i in range(n)]
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            IC[p] = IC[p] + X[i].T @ IC[i] @ X[i]
    M = jnp.zeros((nv, nv), q.dtype)
    for i in range(n):
        si, wi = model.v_slices[i]
        Si = model.S[i][:, :wi]
        F = IC[i] @ Si                                     # (6, wi)
        blk_ii = Si.T @ F + jnp.diag(
            jax.lax.dynamic_slice(model.armature, (si,), (wi,)))
        M = jax.lax.dynamic_update_slice(M, blk_ii, (si, si))
        j = i
        while topo.parents[j] >= 0:
            F = X[j].T @ F
            j = topo.parents[j]
            sj, wj = model.v_slices[j]
            blk = F.T @ model.S[j][:, :wj]                  # (wi, wj)
            M = jax.lax.dynamic_update_slice(M, blk, (si, sj))
            M = jax.lax.dynamic_update_slice(M, blk.T, (sj, si))
    return M


def md_forward_dynamics(model: MultiDofModel, q, qd, u, gravity=-9.81):
    """q̈ = M⁻¹ (u − c): dense SPD Cholesky solve (nv ≤ ~40)."""
    c, *_ = md_rnea(model, q, qd, None, gravity)
    M = md_crba(model, q)
    L = jnp.linalg.cholesky(M)
    return jax.scipy.linalg.cho_solve((L, True), u - c)


def md_aba(model: MultiDofModel, q, qd, u, gravity=-9.81):
    """Generalized articulated-body FD: q̈ (nv,) without the (nv, nv)
    mass matrix — the (6, k) form of :func:`.aba.aba`. Each joint's
    D = SᵀIᴬS is a k×k SPD block (k ≤ 6) solved in place (Cholesky via
    ``cho_solve``); everything else is the standard three-pass articulated
    recursion in the engine's gravity-offset coordinates. Independent of
    the CRBA+Cholesky path (:func:`md_forward_dynamics`), so agreement is
    an in-family cross-check; also the cheaper formulation at humanoid
    scale (no nv³/3 factor)."""
    topo = model.topology
    n = topo.n
    dtype = q.dtype
    a_base = jnp.zeros(6, dtype).at[5].set(-gravity)
    X = md_joint_transforms(model, q)

    v = [None] * n
    zeta = [None] * n
    vJ = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Si = model.S[i][:, :model.dof(i)]
        vJ[i] = Si @ _vslice(model, qd, i)
        v[i] = vJ[i] if p < 0 else X[i] @ v[p] + vJ[i]
        zeta[i] = crm_apply(v[i], vJ[i])
    IA = [model.inertia[i] for i in range(n)]
    pA = [crf_apply(v[i], model.inertia[i] @ v[i]) for i in range(n)]

    U = [None] * n
    Lch = [None] * n        # Cholesky factor of D_i
    ubar = [None] * n
    for i in range(n - 1, -1, -1):
        wi = model.dof(i)
        Si = model.S[i][:, :wi]
        Ui = IA[i] @ Si                                     # (6, wi)
        # D = SᵀU + diag(armature slice) — the reflected rotor inertia
        D = Si.T @ Ui + jnp.diag(_vslice(model, model.armature, i))
        L = jnp.linalg.cholesky(D)
        ui = (_vslice(model, u, i) - _vslice(model, model.damping, i)
              * _vslice(model, qd, i) - Si.T @ pA[i])       # (wi,)
        U[i], Lch[i], ubar[i] = Ui, L, ui
        UDinvT = jax.scipy.linalg.cho_solve((L, True), Ui.T)  # D⁻¹Uᵀ (wi,6)
        Ia = IA[i] - Ui @ UDinvT
        pa = pA[i] + Ia @ zeta[i] + Ui @ jax.scipy.linalg.cho_solve(
            (L, True), ui)
        p = topo.parents[i]
        if p >= 0:
            IA[p] = IA[p] + X[i].T @ Ia @ X[i]
            pA[p] = pA[p] + X[i].T @ pa

    a = [None] * n
    qdd = [None] * n
    for i in range(n):
        p = topo.parents[i]
        a_prime = X[i] @ (a_base if p < 0 else a[p]) + zeta[i]
        qdd[i] = jax.scipy.linalg.cho_solve(
            (Lch[i], True), ubar[i] - U[i].T @ a_prime)
        wi = model.dof(i)
        a[i] = a_prime + model.S[i][:, :wi] @ qdd[i]
    return jnp.concatenate(qdd)


def md_tangent_apply(model: MultiDofModel, q, dq_tangent):
    """Retract a tangent step onto the configuration manifold: quaternion
    joints advance by ``quat ⊗ exp(½ δφ)``; 1-dof joints add."""
    out = q
    for i in range(model.n_joints):
        s, w = model.q_slices[i]
        sv, wv = model.v_slices[i]
        d = jax.lax.dynamic_slice(dq_tangent, (sv,), (wv,))
        t = model.joint_types[i]
        if t == "floating":
            # twist chart: attitude by body rotation vector, position by the
            # body-frame translation rotated into the parent frame — the
            # chart under which ∂X/∂μ = −crm(S e_k)·X holds for all 6
            # columns (see md_id_grad)
            quat = jax.lax.dynamic_slice(q, (s,), (4,))
            pos = jax.lax.dynamic_slice(q, (s + 4,), (3,))
            pos = pos + quat_to_rot(quat) @ d[3:]
            quat = quat_mul(quat, quat_exp_body(d[:3]))
            quat = quat / jnp.linalg.norm(quat)
            out = jax.lax.dynamic_update_slice(
                out, jnp.concatenate([quat, pos]), (s,))
        elif t == "spherical":
            quat = jax.lax.dynamic_slice(q, (s,), (4,))
            quat = quat_mul(quat, quat_exp_body(d))
            quat = quat / jnp.linalg.norm(quat)
            out = jax.lax.dynamic_update_slice(out, quat, (s,))
        else:
            qi = jax.lax.dynamic_slice(q, (s,), (1,))
            out = jax.lax.dynamic_update_slice(out, qi + d, (s,))
    return out


def md_id_grad(model: MultiDofModel, q, qd, qdd=None, gravity=-9.81):
    """Analytic tangent-space ∂ID: ``(∂τ/∂δq, ∂τ/∂q̇)``, each (nv, nv).

    The (6,k) motion-subspace generalization of the reference's ∂ID
    recursions (``/root/reference/algorithms/_inverse_dynamics_gradient.py``):
    every single-dof derivative term there is a special case of the uniform
    identity

        ∂X_j/∂μ_{jk} = −crm(S_j e_k) · X_j

    (μ = the joint's tangent coordinate; for quaternion joints the body-frame
    chart ``quat ⊗ exp(½ δφ)``, for revolute/prismatic the coordinate
    itself), which turns each scalar recursion into a k-column block
    recursion. Per link we carry full (6, nv) derivative matrices DV/DA/DF —
    the dense-mask strategy of :mod:`.rnea_grad`, here as 6×6 @ 6×nv matmuls
    that map straight onto the MXU. Nominal (v, a, f) are evaluated at the
    given q̈ (pass the FD solution for the Carpentier-Mansard ∇FD trick).

    Derivative recursions (side = q, tangent columns grouped per joint j,
    ``s`` ranging over the columns of S_j; ⊕ = placed in j's own columns):

        DV_i = X_i DV_p ⊕ crm(X_j v_p) S_j
        DA_i = X_i DA_p − crm(S_i q̇_i) DV_i ⊕ crm(X_j a_p) S_j
        DF_i = I_i DA_i + G(I_i v_i) DV_i + crf(v_i) I_i DV_i
        backward:  DF_p += X_iᵀ (DF_i ⊕ G(f_iᵃᶜᶜ) S_i)
        rows:      ∂τ_i = S_iᵀ DF_iᵃᶜᶜ

    with ``G = crf_swap`` (``G(w) x = crf(x) w``). The qd side replaces the
    own-column seeds by ``S_j`` and ``crm(v_j) S_j``, drops the backward
    ∂X term, and adds the damping diagonal.
    """
    topo = model.topology
    n = topo.n
    nv = model.nv
    dtype = q.dtype
    X = md_joint_transforms(model, q)
    _, v, a, f = md_rnea(model, q, qd, qdd, gravity)  # f is accumulated
    a_base = jnp.zeros(6, dtype).at[5].set(-gravity)
    Svals = [model.S[i][:, :model.dof(i)] for i in range(n)]
    Sqd = [Svals[i] @ _vslice(model, qd, i) for i in range(n)]
    zero_cols = jnp.zeros((6, nv), dtype)

    def own(i, block):
        """(6, k_i) block placed at joint i's velocity columns of (6, nv)."""
        si, wi = model.v_slices[i]
        return jnp.zeros((6, nv), dtype).at[:, si:si + wi].set(block)

    out = {}
    for side in ("q", "qd"):
        DV = [None] * n
        DA = [None] * n
        DF = [None] * n
        for i in range(n):
            p = topo.parents[i]
            vp = jnp.zeros(6, dtype) if p < 0 else v[p]
            ap = a_base if p < 0 else a[p]
            DVp = zero_cols if p < 0 else DV[p]
            DAp = zero_cols if p < 0 else DA[p]
            if side == "q":
                DV[i] = X[i] @ DVp + own(i, crm(X[i] @ vp) @ Svals[i])
                DA[i] = (X[i] @ DAp - crm(Sqd[i]) @ DV[i]
                         + own(i, crm(X[i] @ ap) @ Svals[i]))
            else:
                DV[i] = X[i] @ DVp + own(i, Svals[i])
                DA[i] = (X[i] @ DAp - crm(Sqd[i]) @ DV[i]
                         + own(i, crm(v[i]) @ Svals[i]))
            Ii = model.inertia[i]
            DF[i] = (Ii @ DA[i] + crf_swap(Ii @ v[i]) @ DV[i]
                     + crf(v[i]) @ (Ii @ DV[i]))
        for i in range(n - 1, -1, -1):
            p = topo.parents[i]
            if p >= 0:
                contrib = DF[i]
                if side == "q":
                    contrib = contrib + own(i, crf_swap(f[i]) @ Svals[i])
                DF[p] = DF[p] + X[i].T @ contrib
        D = jnp.concatenate([Svals[i].T @ DF[i] for i in range(n)])
        if side == "qd":
            D = D + jnp.diag(model.damping)
        out[side] = D
    return out["q"], out["qd"]


def md_forward_dynamics_gradient(model: MultiDofModel, q, qd, u,
                                 gravity=-9.81, method: str = "analytic"):
    """Tangent-space ∇FD: ``(∂q̈/∂δq, ∂q̈/∂q̇, ∂q̈/∂u)``, each (nv, nv) —
    attitude derivatives taken on the manifold (quaternion ⊗ exp(½δ)),
    matching the single-dof :func:`..fd_grad.forward_dynamics_gradient`
    semantics when all joints are 1-dof.

    ``method="analytic"`` (default) uses the Carpentier-Mansard identity
    ∂q̈/∂x = −M⁻¹ ∂τ_ID/∂x |_{q̈ fixed at the FD solution}
    (reference ``_forward_dynamics_gradient.py:70``) with the analytic
    multi-dof ∂ID (:func:`md_id_grad`); ``method="jacfwd"`` keeps the
    forward-mode AD fallback the analytic path is validated against
    (tests/test_multidof.py::test_md_id_grad_analytic_vs_jacfwd)."""
    if method == "jacfwd":
        def fd_of(delta, qd_, u_):
            return md_forward_dynamics(
                model, md_tangent_apply(model, q, delta), qd_, u_, gravity)

        zero = jnp.zeros(model.nv, q.dtype)
        return jax.jacfwd(fd_of, argnums=(0, 1, 2))(zero, qd, u)

    qdd = md_forward_dynamics(model, q, qd, u, gravity)
    did_dq, did_dqd = md_id_grad(model, q, qd, qdd, gravity)
    M = md_crba(model, q)
    L = jnp.linalg.cholesky(M)
    solve = lambda rhs: jax.scipy.linalg.cho_solve((L, True), rhs)
    eye = jnp.eye(model.nv, dtype=q.dtype)
    return -solve(did_dq), -solve(did_dqd), solve(eye)


def md_inverse_dynamics_batched(model: MultiDofModel, q, qd, qdd=None,
                                gravity=-9.81, impl="auto"):
    """Batched generalized ID over leading batch axes (batch-first user
    arrays): q (..., nq), qd/qdd (..., nv) → c (..., nv). ``impl="auto"``
    routes to the fused Pallas lane-tile kernel on TPU
    (:func:`.kernels.multidof_fused.md_id_fused`); elsewhere the identical
    batch-last body runs as plain XLA."""
    from .contact import _impl_auto
    from .kernels import multidof_fused as _mf

    shape_b = qd.shape[:-1]
    flat = lambda x: x.reshape((-1, x.shape[-1])).T
    c = _mf.md_id_fused(
        model, flat(q), flat(qd), None if qdd is None else flat(qdd),
        gravity, force_xla=_impl_auto(impl, q) != "pallas")
    return jnp.moveaxis(c, 0, -1).reshape(shape_b + (model.nv,))


def md_forward_dynamics_batched(model: MultiDofModel, q, qd, u,
                                gravity=-9.81, impl="auto"):
    """Batched generalized FD: q (..., nq), qd/u (..., nv) → q̈ (..., nv).
    On TPU the whole pipeline runs as ONE fused kernel per 128-state lane
    tile — by default the generalized ABA (:func:`md_aba` /
    ``multidof_fused.md_aba_fused``: O(n) per state, measured 1.14–1.25×
    the CRBA+Cholesky kernel at 262k with a ~4× tighter f32 tail, v5e
    2026-08-18); ``impl="crba"`` keeps the dense kernel for A/B."""
    from .contact import _impl_auto
    from .kernels import multidof_fused as _mf

    shape_b = qd.shape[:-1]
    flat = lambda x: x.reshape((-1, x.shape[-1])).T
    kern = _mf.md_fd_fused if impl == "crba" else _mf.md_aba_fused
    resolved = _impl_auto("auto" if impl == "crba" else impl, q)
    qdd = kern(model, flat(q), flat(qd), flat(u), gravity,
               force_xla=resolved != "pallas")
    return jnp.moveaxis(qdd, 0, -1).reshape(shape_b + (model.nv,))


def md_id_grad_batched(model: MultiDofModel, q, qd, qdd=None, gravity=-9.81,
                       impl="auto"):
    """Batched tangent-space ∂ID: q (..., nq), qd/qdd (..., nv) →
    (∂τ/∂δq, ∂τ/∂q̇), each (..., nv, nv). On TPU the whole derivative
    recursion runs fused per lane tile
    (:func:`.kernels.multidof_fused.md_id_grad_fused`); past the
    single-tile VMEM gate (humanoid free-flyer scale) the column-blocked
    staged pipeline (:mod:`.kernels.multidof_staged`) takes over."""
    from .contact import _impl_auto
    from .kernels import multidof_fused as _mf

    shape_b = qd.shape[:-1]
    flat = lambda x: x.reshape((-1, x.shape[-1])).T
    force_xla = _impl_auto(impl, q) != "pallas"
    unflat = lambda D: jnp.moveaxis(D, -1, 0).reshape(
        shape_b + (model.nv, model.nv))
    if not force_xla and not _mf.md_grad_workset_ok(model.n_joints,
                                                    model.nv):
        from .kernels import multidof_staged as _ms
        if _ms.md_staged_ok(model.n_joints, model.nv):
            Dq, Dqd = _ms.md_id_grad_staged(
                model, flat(q), flat(qd),
                None if qdd is None else flat(qdd), gravity)
            return unflat(Dq), unflat(Dqd)
    Dq, Dqd = _mf.md_id_grad_fused(
        model, flat(q), flat(qd), None if qdd is None else flat(qdd),
        gravity, force_xla=force_xla)
    return unflat(Dq), unflat(Dqd)


def md_forward_dynamics_gradient_batched(model: MultiDofModel, q, qd, u,
                                         gravity=-9.81, impl="auto"):
    """Batched tangent-space ∇FD: (∂q̈/∂δq, ∂q̈/∂q̇, ∂q̈/∂u), each
    (..., nv, nv) — the Carpentier-Mansard pipeline fused per lane tile on
    TPU (:func:`.kernels.multidof_fused.md_fd_grad_fused`); past the
    single-tile VMEM gate (humanoid free-flyer scale) the column-blocked
    staged pipeline (:mod:`.kernels.multidof_staged`) takes over."""
    from .contact import _impl_auto
    from .kernels import multidof_fused as _mf

    shape_b = qd.shape[:-1]
    flat = lambda x: x.reshape((-1, x.shape[-1])).T
    force_xla = _impl_auto(impl, q) != "pallas"
    if not force_xla and not _mf.md_grad_workset_ok(model.n_joints,
                                                    model.nv):
        from .kernels import multidof_staged as _ms
        if _ms.md_staged_ok(model.n_joints, model.nv):
            Ds = _ms.md_fd_grad_staged(model, flat(q), flat(qd), flat(u),
                                       gravity)
        else:
            Ds = _mf.md_fd_grad_fused(model, flat(q), flat(qd), flat(u),
                                      gravity, force_xla=True)
    else:
        Ds = _mf.md_fd_grad_fused(
            model, flat(q), flat(qd), flat(u), gravity,
            force_xla=force_xla)
    unflat = lambda D: jnp.moveaxis(D, -1, 0).reshape(
        shape_b + (model.nv, model.nv))
    return tuple(unflat(D) for D in Ds)


def md_step(model: MultiDofModel, q, qd, u, dt, gravity=-9.81):
    """Semi-implicit manifold step."""
    qdd = md_forward_dynamics(model, q, qd, u, gravity)
    qd2 = qd + dt * qdd
    return md_tangent_apply(model, q, dt * qd2), qd2


def md_energy(model: MultiDofModel, q, qd, gravity=-9.81):
    """Kinetic + potential energy (world z-up gravity)."""
    topo = model.topology
    n = topo.n
    dtype = q.dtype
    M = md_crba(model, q)
    kin = 0.5 * qd @ (M @ qd)
    X = md_joint_transforms(model, q)
    g_w = jnp.array([0.0, 0.0, gravity], dtype)

    def unskew(Sk):
        return jnp.stack([Sk[2, 1], Sk[0, 2], Sk[1, 0]])

    pot = jnp.zeros((), dtype)
    R_w = [None] * n
    p_w = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Rp = jnp.eye(3, dtype=dtype) if p < 0 else R_w[p]
        pp = jnp.zeros(3, dtype) if p < 0 else p_w[p]
        E = X[i][:3, :3]
        r = unskew(-E.T @ X[i][3:, :3])
        R_w[i] = Rp @ E.T
        p_w[i] = pp + Rp @ r
        m = model.inertia[i][5, 5]
        mc = unskew(model.inertia[i][:3, 3:])
        pot = pot - jnp.dot(g_w, m * p_w[i] + R_w[i] @ mc)
    return kin + pot


def neutral_q(model: MultiDofModel):
    """The identity configuration (unit quaternions, zeros elsewhere)."""
    q = np.zeros(model.nq)
    for i, t in enumerate(model.joint_types):
        if t in ("spherical", "floating"):
            q[model.q_slices[i][0]] = 1.0
    return jnp.asarray(q, model.XT.dtype)
