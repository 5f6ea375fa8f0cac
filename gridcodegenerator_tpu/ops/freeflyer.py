"""True free-flyer (quaternion floating base) dynamics.

The reference supports only single-dof joints — S is a one-hot 6-vector
(``/root/reference/helpers/_spatial_algebra_helpers.py:13``) — so floating
bases must be emulated with a 6-joint Euler chain, which is singular at
pitch ±π/2 (``models/zoo.py::with_floating_base``). This module implements
the base as what it is: a 6-DoF joint with motion subspace S₀ = I₆ and a
quaternion attitude, removing the singularity entirely.

Design (TPU-first): the articulated part reuses the existing single-dof
trace-time recursions; the base contributes a 6×6 block, so the free-flyer
mass matrix is assembled CRBA-style as

    M = [[ M_bb (6×6 composite inertia at the base),  M_bj ],
         [ M_bjᵀ,                                     M_jj ]]

and forward dynamics solves the dense SPD system  M · [a₀'; q̈] = [−p_b;
τ − c_j]  with a batched Cholesky — an (n+6)-sized solve is tiny and maps
straight onto the MXU, unlike a hand-rolled articulated-body sweep.

Conventions (match the fixed-base stack / golden model):
  * spatial vectors are [angular; linear] in *body* (base-link) coordinates;
  * ``vb`` is the base twist in base coordinates;
  * the gravity trick: recursions run with the fictitious base acceleration
    a₀' = [0; −g_b] (g_b = R_wbᵀ·[0,0,GRAVITY]), which folds the gravity
    wrench into the bias; the solved base acceleration is then already the
    *true* spatial acceleration, which in a body-fixed frame equals the
    componentwise twist derivative (v̇ = a − v × v = a);
  * quaternions are (w, x, y, z), world ← base.

Validation: exact agreement with the Euler-chain emulation away from its
singularity (via ``jax.jvp`` for the twist-derivative mapping), plus energy/
momentum conservation *through* pitch = π/2 where the Euler chain fails —
``tests/test_freeflyer.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.robot import RobotModel, robot_model_from_description
from ..models.urdf import RobotDescription
from .spatial import crf, crf_apply, crf_swap, crm, crm_apply, skew as skew3


# ------------------------------------------------------------- quaternions
def quat_to_rot(quat):
    """(w,x,y,z) → R (3,3), world ← base. Unit-norm input assumed."""
    w, x, y, z = quat[0], quat[1], quat[2], quat[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
    ])


def quat_mul(a, b):
    aw, av = a[0], a[1:]
    bw, bv = b[0], b[1:]
    return jnp.concatenate([
        (aw * bw - jnp.dot(av, bv))[None],
        aw * bv + bw * av + jnp.cross(av, bv),
    ])


def quat_exp_body(omega_dt):
    """exp(½·ω̂·|ω|dt): the unit quaternion advancing attitude by a body
    angular velocity ω over dt (ω_dt = ω·dt). Safe at ‖ω‖→0."""
    half = 0.5 * omega_dt
    ang = jnp.sqrt(jnp.sum(half * half) + 1e-30)
    s = jnp.sin(ang) / ang
    return jnp.concatenate([jnp.cos(ang)[None], s * half])


def rot_to_quat(R):
    """R (3,3) → (w,x,y,z). Shepperd-style, branchless (trace variant is
    adequate for test-grade conversion away from w≈0; inputs from Euler
    chains with |angles|<π/2 keep w well away from 0)."""
    w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 1e-12))
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    q = jnp.stack([w, x, y, z])
    return q / jnp.linalg.norm(q)


# ------------------------------------------------------------------- model
@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FreeFlyerModel:
    """A fixed-base articulated model plus the base link's own inertia
    (``RobotDescription.base_inertia`` — consumed here, unlike the fixed-base
    case where it is welded to the world; reference ``include_base_inertia``,
    ``GRiDCodeGenerator.py:241``)."""

    arm: RobotModel
    I_base: jax.Array  # (6, 6) spatial inertia of the base link

    @property
    def n(self) -> int:
        return self.arm.n

    @property
    def dtype(self):
        return self.arm.dtype


def free_flyer_model(desc: RobotDescription, dtype=jnp.float64,
                     accurate_trig: bool = False) -> FreeFlyerModel:
    arm = robot_model_from_description(desc, dtype=dtype,
                                       accurate_trig=accurate_trig)
    return FreeFlyerModel(arm=arm, I_base=jnp.asarray(desc.base_inertia, dtype))


# -------------------------------------------------------------- algorithms
def _gravity_world(gravity, dtype):
    return jnp.array([0.0, 0.0, gravity], dtype)


def fb_bias(model: FreeFlyerModel, X, R_wb, vb, qd, gravity=-9.81):
    """Bias forces at q̈=0, a₀=a₀' (gravity trick): returns (p_b (6,),
    c_j (n,)) — the base wrench and joint torques the actuators must cancel.
    Generalizes the fixed-base RNEA forward/backward sweeps
    (``ops/rnea.py``) to a moving base with twist ``vb``."""
    arm = model.arm
    topo = arm.topology
    n = topo.n
    dtype = X.dtype
    g_b = R_wb.T @ _gravity_world(gravity, dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -g_b])

    v = [None] * n
    a = [None] * n
    f = [None] * n
    for i in range(n):
        p = topo.parents[i]
        vp = vb if p < 0 else v[p]
        ap = a0 if p < 0 else a[p]
        Sqd = arm.S[i] * qd[i]
        v[i] = X[i] @ vp + Sqd
        a[i] = X[i] @ ap + crm_apply(v[i], Sqd)
        Iv = arm.inertia[i] @ v[i]
        f[i] = arm.inertia[i] @ a[i] + crf_apply(v[i], Iv)
    # base link's own Newton-Euler wrench
    Ivb = model.I_base @ vb
    f_b = model.I_base @ a0 + crf_apply(vb, Ivb)
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            f[p] = f[p] + X[i].T @ f[i]
        else:
            f_b = f_b + X[i].T @ f[i]
    c_j = jnp.stack([jnp.dot(arm.S[i], f[i]) for i in range(n)])
    c_j = c_j + arm.damping * qd
    return f_b, c_j


def fb_mass_matrix(model: FreeFlyerModel, X):
    """Free-flyer mass matrix (6+n, 6+n) via composite-rigid-body assembly
    with the base as a 6-DoF joint (S₀ = I₆)."""
    arm = model.arm
    topo = arm.topology
    n = topo.n
    dtype = X.dtype

    IC = [arm.inertia[i] for i in range(n)]
    IC_b = model.I_base
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        contrib = X[i].T @ IC[i] @ X[i]
        if p >= 0:
            IC[p] = IC[p] + contrib
        else:
            IC_b = IC_b + contrib

    M = jnp.zeros((6 + n, 6 + n), dtype)
    M = M.at[:6, :6].set(IC_b)
    for i in range(n):
        F = IC[i] @ arm.S[i]
        # joint diagonal carries the reflected rotor inertia (base rows
        # don't — the free joint has no motor)
        M = M.at[6 + i, 6 + i].set(jnp.dot(arm.S[i], F) + arm.armature[i])
        j = i
        while topo.parents[j] >= 0:
            F = X[j].T @ F
            j = topo.parents[j]
            val = jnp.dot(F, arm.S[j])
            M = M.at[6 + i, 6 + j].set(val)
            M = M.at[6 + j, 6 + i].set(val)
        F = X[j].T @ F  # into base coordinates
        M = M.at[6 + i, :6].set(F)
        M = M.at[:6, 6 + i].set(F)
    return M


def fb_forward_dynamics(model: FreeFlyerModel, quat, q, vb, qd, tau,
                        gravity=-9.81):
    """Free-flyer FD: returns (v̇b (6,), q̈ (n,)) — the coordinate derivative
    of the body-frame base twist and the joint accelerations. The base is
    unactuated (τ_base = 0); solve is a dense SPD Cholesky of size 6+n."""
    arm = model.arm
    X = arm.joint_transforms(q)
    R = quat_to_rot(quat)
    p_b, c_j = fb_bias(model, X, R, vb, qd, gravity)
    M = fb_mass_matrix(model, X)
    rhs = jnp.concatenate([-p_b, tau - c_j])
    L = jnp.linalg.cholesky(M)
    sol = jax.scipy.linalg.cho_solve((L, True), rhs)
    # The gravity trick already yields the TRUE base spatial acceleration:
    # the fictitious a₀' = −g in the bias shifts the solve by exactly the
    # gravity wrench M_bb·g, so sol[:6] = a_true — which in a body-fixed
    # frame equals the componentwise twist derivative (v̇ = a − v×v = a).
    # Verified against jax.jvp of the Euler-chain twist mapping
    # (tests/test_freeflyer.py::test_fb_matches_euler_chain).
    return sol[:6], sol[6:]


def fb_forward_dynamics_batched(model: FreeFlyerModel, quat, q, vb, qd, tau,
                                gravity=-9.81, impl="auto"):
    """Batched free-flyer FD over leading batch axes (batch-first user
    arrays ``(..., d)``): returns (v̇b (..., 6), q̈ (..., n)).

    ``impl="auto"`` routes to the fused floating-base ABA lane-tile kernel
    (:func:`.kernels.contact_fused.fb_aba_fused` — O(n), one 6×6 base
    solve, no (6+n)² mass matrix: measured 1.2×/1.4× the mass-matrix
    Cholesky kernel on HyQ/Atlas at 262k with a 4–10× better f32 tail,
    v5e 2026-08-18) and to the identical batch-last body as plain XLA
    elsewhere. ``impl="chol"`` keeps the mass-matrix kernel for A/B."""
    from .contact import _impl_auto  # shared platform resolution
    from .kernels import contact_fused as _cf

    shape_b = q.shape[:-1]
    flat = lambda x: x.reshape((-1, x.shape[-1])).T
    resolved = _impl_auto("auto" if impl == "chol" else impl, q)
    body = _cf._fb_fd_body if impl == "chol" else _cf._fb_aba_body
    if resolved != "pallas":
        # plain-XLA fallback body (same math, full batch) via the gate
        dvb, qdd = _cf._xla_fallback(
            model,
            lambda km, I_base, *s: body(
                km, I_base, *s, gravity=float(gravity)),
            [flat(x) for x in (quat, q, vb, qd, tau)])
    elif impl == "chol":
        dvb, qdd = _cf.fb_fd_fused(model, flat(quat), flat(q), flat(vb),
                                   flat(qd), flat(tau), gravity)
    else:
        dvb, qdd = _cf.fb_aba_fused(model, flat(quat), flat(q), flat(vb),
                                    flat(qd), flat(tau), gravity)
    unflat = lambda arr: jnp.moveaxis(arr, 0, -1).reshape(
        shape_b + (arr.shape[0],))
    return unflat(dvb), unflat(qdd)


def fb_inverse_dynamics(model: FreeFlyerModel, quat, q, vb, qd, dvb, qdd,
                        gravity=-9.81):
    """Free-flyer ID: joint torques τ and the residual base wrench (zero for
    consistent free-flyer motion) given full accelerations."""
    arm = model.arm
    X = arm.joint_transforms(q)
    R = quat_to_rot(quat)
    p_b, c_j = fb_bias(model, X, R, vb, qd, gravity)
    M = fb_mass_matrix(model, X)
    gen = M @ jnp.concatenate([dvb, qdd])  # dvb IS the spatial acceleration
    return gen[6:] + c_j, gen[:6] + p_b


def fb_id_grad(model: FreeFlyerModel, quat, q, vb, qd, dvb, qdd,
               gravity=-9.81):
    """Analytic derivatives of the free-flyer inverse dynamics
    ``gen = [w_b; τ] = M·[dvb; q̈] + bias`` at fixed accelerations:
    ``(∂gen/∂q (6+n, n), ∂gen/∂vb (6+n, 6), ∂gen/∂q̇ (6+n, n))``.

    Same engine as :func:`..multidof.md_id_grad` (the (6,k) generalization of
    the reference's ∂ID recursions, ``_inverse_dynamics_gradient.py``) with
    the base treated as a 6-DoF joint: S_b = I₆, X_b = I (the base transform
    carries no coordinate — attitude enters the body-frame formulation only
    through gravity, which is handled exactly in
    :func:`fb_forward_dynamics_gradient`). Nominal (v, a, f) run at the FULL
    accelerations (dvb, q̈); columns are [vb | q | q̇]; rows are [w_b; τ].
    """
    arm = model.arm
    topo = arm.topology
    n = topo.n
    dtype = q.dtype
    X = arm.joint_transforms(q)
    R = quat_to_rot(quat)
    g_b = R.T @ _gravity_world(gravity, dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -g_b]) + dvb

    # nominal recursions at full acceleration (accumulated f, incl. base)
    v = [None] * n
    a = [None] * n
    f = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Sqd = arm.S[i] * qd[i]
        v[i] = X[i] @ (vb if p < 0 else v[p]) + Sqd
        a[i] = (X[i] @ (a0 if p < 0 else a[p]) + crm_apply(v[i], Sqd)
                + arm.S[i] * qdd[i])
        Iv = arm.inertia[i] @ v[i]
        f[i] = arm.inertia[i] @ a[i] + crf_apply(v[i], Iv)
    f_b = model.I_base @ a0 + crf_apply(vb, model.I_base @ vb)
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            f[p] = f[p] + X[i].T @ f[i]
        else:
            f_b = f_b + X[i].T @ f[i]

    nc = {"vb": 6, "q": n, "qd": n}
    zero6 = jnp.zeros(6, dtype)

    def own(side, i, block):
        """(6,) or (6,6) block at column(s) of joint i / the base."""
        cols = jnp.zeros((6, nc[side]), dtype)
        if block.ndim == 1:
            return cols.at[:, i].set(block)
        return cols.at[:, :6].set(block)  # base block, vb side only

    out = {}
    for side in ("vb", "q", "qd"):
        zc = jnp.zeros((6, nc[side]), dtype)
        # base-joint derivative state
        DVb = own("vb", 0, jnp.eye(6, dtype=dtype)) if side == "vb" else zc
        DFb = (own("vb", 0, crf_swap(model.I_base @ vb)
                   + crf(vb) @ model.I_base) if side == "vb" else zc)
        DV = [None] * n
        DA = [None] * n
        DF = [None] * n
        for i in range(n):
            p = topo.parents[i]
            vp = vb if p < 0 else v[p]
            ap = a0 if p < 0 else a[p]
            DVp = DVb if p < 0 else DV[p]
            DAp = zc if p < 0 else DA[p]
            Sqd = arm.S[i] * qd[i]
            DV[i] = X[i] @ DVp
            DA[i] = X[i] @ DAp
            if side == "q":
                DV[i] = DV[i] + own(side, i, crm_apply(X[i] @ vp, arm.S[i]))
                DA[i] = DA[i] + own(side, i, crm_apply(X[i] @ ap, arm.S[i]))
            elif side == "qd":
                DV[i] = DV[i] + own(side, i, arm.S[i])
                DA[i] = DA[i] + own(side, i, crm_apply(v[i], arm.S[i]))
            DA[i] = DA[i] - crm(Sqd) @ DV[i]
            Ii = arm.inertia[i]
            DF[i] = (Ii @ DA[i] + crf_swap(Ii @ v[i]) @ DV[i]
                     + crf(v[i]) @ (Ii @ DV[i]))
        for i in range(n - 1, -1, -1):
            p = topo.parents[i]
            contrib = DF[i]
            if side == "q":
                contrib = contrib + own(side, i, crf_apply(arm.S[i], f[i]))
            if p >= 0:
                DF[p] = DF[p] + X[i].T @ contrib
            else:
                DFb = DFb + X[i].T @ contrib
        Dtau = jnp.stack([arm.S[i] @ DF[i] for i in range(n)])
        if side == "qd":
            Dtau = Dtau + jnp.diag(arm.damping)
        out[side] = jnp.concatenate([DFb, Dtau])
    return out["q"], out["vb"], out["qd"]


def fb_forward_dynamics_gradient(model: FreeFlyerModel, quat, q, vb, qd, tau,
                                 gravity=-9.81, method: str = "analytic"):
    """Jacobians of the free-flyer FD outputs (v̇b, q̈) with respect to the
    full tangent state — the floating-base counterpart of
    :func:`..fd_grad.forward_dynamics_gradient`.

    The attitude derivative is taken in the tangent space: δφ ∈ ℝ³ perturbs
    the attitude as ``quat ⊗ exp(½ δφ)`` (body-frame rotation vector), which
    is the manifold-correct Jacobian an optimizer wants (no quaternion
    normalization constraint leaks into the derivative).

    Returns a dict of (6+n, k) Jacobians: ``{"dphi": (6+n, 3),
    "dq": (6+n, n), "dvb": (6+n, 6), "dqd": (6+n, n), "dtau": (6+n, n)}``,
    rows ordered [v̇b; q̈]. Everything is jittable and vmappable.

    ``method="analytic"`` (default): Carpentier-Mansard —
    ∂y/∂x = −M⁻¹ ∂gen_ID/∂x at the achieved accelerations
    (:func:`fb_id_grad`), ∂y/∂τ = M⁻¹[:, 6:]. The attitude block is exact
    and closed-form: in body coordinates attitude enters only through
    g_b = R_wbᵀ g_w in the fictitious base acceleration a₀' = [0; −g_b],
    and M⁻¹·M[:, :6] collapses the response to
    ∂q̈/∂δφ = 0 (a uniform gravity field induces no internal motion of a
    free-floating system) and ∂v̇b/∂δφ = [0; ĝ_b] (the gravity vector
    tilting in body coordinates: dg_b/dδφ = ĝ_b since
    g_b(δφ) = exp(−δφ̂)·g_b). ``method="jacfwd"`` keeps the
    forward-mode AD fallback the analytic path is validated against
    (tests/test_freeflyer.py::test_fb_grad_analytic_vs_jacfwd).
    """
    if method == "jacfwd":
        def out(dphi, q_, vb_, qd_, tau_):
            qt = quat_mul(quat, quat_exp_body(dphi))
            dvb, qdd = fb_forward_dynamics(model, qt, q_, vb_, qd_, tau_,
                                           gravity)
            return jnp.concatenate([dvb, qdd])

        zero = jnp.zeros(3, q.dtype)
        jac = jax.jacfwd(out, argnums=(0, 1, 2, 3, 4))(zero, q, vb, qd, tau)
        return dict(zip(("dphi", "dq", "dvb", "dqd", "dtau"), jac))

    arm = model.arm
    n = arm.n
    dtype = q.dtype
    dvb, qdd = fb_forward_dynamics(model, quat, q, vb, qd, tau, gravity)
    Dq, Dvb, Dqd = fb_id_grad(model, quat, q, vb, qd, dvb, qdd, gravity)
    M = fb_mass_matrix(model, arm.joint_transforms(q))
    L = jnp.linalg.cholesky(M)
    solve = lambda rhs: jax.scipy.linalg.cho_solve((L, True), rhs)
    # exact attitude block: δφ shifts a₀' = [0; −g_b] by [0; δφ × g_b] and
    # M⁻¹·M[:, :6] reduces the solve response to the identity, so
    # y = M⁻¹([0;τ] − bias_vel) − [a₀'; 0] gives dy/dδφ = −[da₀'/dδφ; 0].
    g_b = quat_to_rot(quat).T @ _gravity_world(gravity, dtype)
    dphi = jnp.concatenate([
        jnp.zeros((3, 3), dtype),       # angular v̇b rows
        skew3(g_b),                     # linear v̇b rows: ĝ_b
        jnp.zeros((n, 3), dtype),       # q̈ rows: exactly zero
    ])
    eye_tau = jnp.concatenate([jnp.zeros((6, n), dtype),
                               jnp.eye(n, dtype=dtype)])
    return {"dphi": dphi, "dq": -solve(Dq), "dvb": -solve(Dvb),
            "dqd": -solve(Dqd), "dtau": solve(eye_tau)}


def fb_energy(model: FreeFlyerModel, quat, pos, q, vb, qd, gravity=-9.81):
    """Total energy: ½ [vb;q̇]ᵀ M [vb;q̇] − Σ mᵢ g_w · com_w(i)."""
    arm = model.arm
    topo = arm.topology
    n = topo.n
    dtype = arm.dtype
    X = arm.joint_transforms(q)
    M = fb_mass_matrix(model, X)
    x = jnp.concatenate([vb, qd])
    kin = 0.5 * jnp.dot(x, M @ x)

    g_w = _gravity_world(gravity, dtype)
    R_wb = quat_to_rot(quat)

    def unskew(S):
        return jnp.stack([S[2, 1], S[0, 2], S[1, 0]])

    def pot_of(I6, R_wl, p_wl):
        m = I6[5, 5]
        mc = unskew(I6[:3, 3:])          # m·c in link coordinates
        com_w = m * p_wl + R_wl @ mc      # m · com position (world)
        return -jnp.dot(g_w, com_w)

    pot = pot_of(model.I_base, R_wb, pos)
    R_w = [None] * n
    p_w = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Rp = R_wb if p < 0 else R_w[p]
        pp = pos if p < 0 else p_w[p]
        E = X[i][:3, :3]                  # child ← parent rotation
        r = unskew(-E.T @ X[i][3:, :3])   # joint origin in parent coords
        R_w[i] = Rp @ E.T
        p_w[i] = pp + Rp @ r
        pot = pot + pot_of(arm.inertia[i], R_w[i], p_w[i])
    return kin + pot


def fb_step(model: FreeFlyerModel, state, tau, dt, gravity=-9.81):
    """One semi-implicit (symplectic) Euler step on the manifold.

    ``state = (quat, pos, q, vb, qd)``; attitude advances by the exact
    body-rotation exponential, so there is no Euler-angle singularity and the
    quaternion stays unit-norm by construction (plus one renormalization to
    absorb float drift)."""
    quat, pos, q, vb, qd = state
    dvb, qdd = fb_forward_dynamics(model, quat, q, vb, qd, tau, gravity)
    vb = vb + dt * dvb
    qd = qd + dt * qdd
    quat = quat_mul(quat, quat_exp_body(vb[:3] * dt))
    quat = quat / jnp.linalg.norm(quat)
    pos = pos + dt * (quat_to_rot(quat) @ vb[3:])
    q = q + dt * qd
    return (quat, pos, q, vb, qd)


def fb_derivatives(model: FreeFlyerModel, state, tau, gravity=-9.81):
    """Time derivative of the flat free-flyer state
    (quaṫ = ½ q ⊗ [0, ω_b], ṗ_w = R·v_b, q̇, v̇b, q̈)."""
    quat, pos, q, vb, qd = state
    dvb, qdd = fb_forward_dynamics(model, quat, q, vb, qd, tau, gravity)
    dquat = 0.5 * quat_mul(quat, jnp.concatenate([jnp.zeros(1, quat.dtype),
                                                  vb[:3]]))
    dpos = quat_to_rot(quat) @ vb[3:]
    return (dquat, dpos, qd, dvb, qdd)


def fb_step_rk4(model: FreeFlyerModel, state, tau, dt, gravity=-9.81):
    """Classical RK4 step with post-step quaternion renormalization —
    O(dt⁴) accurate; the integrator used by the conservation tests."""
    f = lambda s: fb_derivatives(model, s, tau, gravity)
    axpy = lambda a, s, k: jax.tree.map(lambda x, y: x + a * y, s, k)
    k1 = f(state)
    k2 = f(axpy(0.5 * dt, state, k1))
    k3 = f(axpy(0.5 * dt, state, k2))
    k4 = f(axpy(dt, state, k3))
    nxt = jax.tree.map(
        lambda x, a, b, c, d: x + (dt / 6.0) * (a + 2 * b + 2 * c + d),
        state, k1, k2, k3, k4)
    quat = nxt[0] / jnp.linalg.norm(nxt[0])
    return (quat,) + tuple(nxt[1:])


def fb_simulate(model: FreeFlyerModel, state0, taus, dt, gravity=-9.81,
                integrator: str = "semi_implicit"):
    """``lax.scan`` rollout — one device dispatch for the whole trajectory
    (taus: (T, n)). ``integrator``: "semi_implicit" (fast, production) or
    "rk4" (O(dt⁴), used for conservation validation)."""
    stepper = fb_step_rk4 if integrator == "rk4" else fb_step

    def step(carry, tau):
        nxt = stepper(model, carry, tau, dt, gravity)
        return nxt, nxt

    return jax.lax.scan(step, state0, taus)
