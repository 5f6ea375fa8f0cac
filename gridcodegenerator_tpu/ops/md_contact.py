"""Frictional ground contact for the multi-dof stack — spherical and
in-tree floating joints stepping on the plane or a heightfield.

This closes the contact layer over the generalized-coordinate models
(``ops/multidof.py``: nq ≠ nv — ball-hip quadrupeds, free-floating
humanoids with spherical joints, MJCF ``<freejoint>`` robots), the same
design obligation the free-flyer stack already honors
(``ops/contact.py::fb_step_ground``). Beyond the reference by construction:
GRiDCodeGenerator has no contact layer and no multi-dof joints (S is a
one-hot 6-vector, ``/root/reference/helpers/_spatial_algebra_helpers.py:13``).

Formulation is the free-flyer stepper's, re-expressed on the tangent space:

    v_free = q̇ + dt·M⁻¹(τ − c)          (M from md_crba, incl. armature)
    G = J M⁻¹ Jᵀ,  PGS cone solve        (same pgs_solve as every stepper)
    q⁺ = q ⊕ dt·v⁺                       (md_tangent_apply retraction)

with J the world point Jacobian over the nv tangent coordinates — each
column of a joint's (6, w) motion subspace contributes
``ω_c × (x − p_j) + v_c`` exactly like the single-dof case, so one code
path covers revolute/prismatic/spherical/floating joints.

There is no separate "base": a floating robot's torso is joint 0's moving
link, so torso geoms attach to a REGULAR link index (contrast the
free-flyer layer's link -1 idiom).

Single-state functions plus a ``vmap``-batched entry; the batch-last /
fused-kernel tier of the free-flyer steppers does not exist here yet (the
fb stack needed a round of register-utilization work to earn its 36×/18×
— see BENCHMARKS.md "Contact layer"); the vmap tier is the correctness
reference it will be built against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .contact import clamp_effort, pgs_solve
from .multidof import (MultiDofModel, md_crba, md_inverse_dynamics,
                       md_joint_transforms, md_tangent_apply)


def _unskew(S):
    return jnp.stack([S[2, 1], S[0, 2], S[1, 0]])


def _md_scalar_coords(model: MultiDofModel):
    """Static (qidx, vidx) index arrays of the width-1 (hinge/slide)
    joints' slots in q and in the tangent — the coordinates joint limits
    are defined on (ball/free joints have no scalar range; MuJoCo's ball
    cone limit is out of scope, matching the MJCF parser)."""
    qidx, vidx = [], []
    for j, (qs, qw) in enumerate(model.q_slices):
        if qw == 1:
            qidx.append(qs)
            vidx.append(model.v_slices[j][0])
    return np.asarray(qidx, np.int64), np.asarray(vidx, np.int64)


def _md_check_limits(model: MultiDofModel, lo, hi):
    """Fail fast (concrete bounds only) if a finite limit sits on a
    ball/free-joint coordinate — those slots are quaternion components,
    not angles, and a silent clamp there would corrupt the state."""
    try:
        lo_np, hi_np = np.asarray(lo, np.float64), np.asarray(hi, np.float64)
    except (TypeError, jax.errors.TracerArrayConversionError):
        return
    scalar_q = set(int(i) for i in _md_scalar_coords(model)[0])
    bad = [i for i in range(model.nq) if i not in scalar_q
           and (np.isfinite(lo_np[i]) or np.isfinite(hi_np[i]))]
    if bad:
        raise ValueError(
            f"finite joint limits on multi-dof joint coordinates {bad} — "
            "limits apply to hinge/slide coordinates only (ball/free "
            "slots hold quaternion components); set those slots to ±inf")


def md_project_joint_limits(model: MultiDofModel, q, qd, lo, hi):
    """HARD joint limits on a multi-dof robot, position-level projection
    (the generalized-coordinate :func:`..contact.project_joint_limits`):
    clamp the scalar-joint coordinates of ``q (..., nq)`` into
    ``[lo, hi]`` ((nq,) each, ±inf on non-scalar slots) and zero the
    *outward* tangent velocity of clamped joints. Composes with every
    impl including the fused step kernel (applied to integrator
    outputs); same documented approximation as the fb version (the
    stopping impulse is not propagated to the rest of the momentum
    within the step). Stability note: locking a knee stiffens the
    remaining ball-joint dynamics — at spin rates where the explicit
    integrator is already marginal (|q̇|·dt ≳ 0.05 on ball coordinates)
    the projection can tip it into divergence; ``limit_mode="impulse"``
    resolves limits inside the contact solve and is the robust choice
    for violent states."""
    qidx, vidx = _md_scalar_coords(model)
    if qidx.size == 0:
        return q, qd
    lo_s = jnp.asarray(lo, q.dtype)[qidx]
    hi_s = jnp.asarray(hi, q.dtype)[qidx]
    qs = q[..., qidx]
    qds = qd[..., vidx]
    qc = jnp.clip(qs, lo_s, hi_s)
    stop = ((qs >= hi_s) & (qds > 0)) | ((qs <= lo_s) & (qds < 0))
    return (q.at[..., qidx].set(qc),
            qd.at[..., vidx].set(jnp.where(stop, jnp.zeros_like(qds),
                                           qds)))


def md_fk(model: MultiDofModel, q):
    """World pose of every moving link frame: ((n,3,3) rotations, (n,3)
    origins) — ``kinematics.fk`` over the multi-dof joint transforms."""
    topo = model.topology
    n = topo.n
    X = md_joint_transforms(model, q)
    Rs, ps = [None] * n, [None] * n
    for i in range(n):
        E = X[i][:3, :3]                    # child ← parent rotation
        r = _unskew(-E.T @ X[i][3:, :3])    # joint origin in parent coords
        p = topo.parents[i]
        Rp = jnp.eye(3, dtype=r.dtype) if p < 0 else Rs[p]
        pp = jnp.zeros(3, r.dtype) if p < 0 else ps[p]
        Rs[i] = Rp @ E.T
        ps[i] = pp + Rp @ r
    return jnp.stack(Rs), jnp.stack(ps)


def _md_jac_cols(model: MultiDofModel, R, p, link: int, x=None):
    """Trace-time-sparse per-tangent-coordinate world motion columns of
    ``link``: ``(Jang (3, nv), Jlin (3, nv) | None)`` — column c of
    joint j is ``a_ω = R_j·S_j[:3, c]`` (angular) and
    ``a_ω × (x − p_j) + R_j·S_j[3:, c]`` (linear, needs the point
    ``x``). One column loop serves both Jacobian flavors; unused
    angular output is DCE'd by XLA."""
    topo = model.topology
    nv = model.nv
    support = set(topo.ancestors[link]) | {link}
    acols = [jnp.zeros((3, 1), R.dtype)] * nv
    lcols = None if x is None else [jnp.zeros((3, 1), x.dtype)] * nv
    for j in range(topo.n):
        if j not in support:
            continue
        sv, wv = model.v_slices[j]
        for c in range(wv):
            a_ang = R[j] @ model.S[j, :3, c]
            acols[sv + c] = a_ang[:, None]
            if x is not None:
                a_lin = R[j] @ model.S[j, 3:, c]
                lcols[sv + c] = (jnp.cross(a_ang, x - p[j])
                                 + a_lin)[:, None]
    return (jnp.concatenate(acols, axis=1),
            None if x is None else jnp.concatenate(lcols, axis=1))


def md_point_jacobian(model: MultiDofModel, R, p, link: int, x):
    """(3, nv) world linear Jacobian of a (traced) point ``x`` rigidly
    attached to ``link``, given FK poses (R, p). Column c of joint j (one
    per tangent coordinate): ``a_ω × (x − p_j) + a_v`` with
    ``[a_ω; a_v] = blockdiag(R_j, R_j) · S_j[:, c]`` — the multi-dof
    generalization of ``collision._arm_point_jac``'s trace-time-sparse
    column loop (shared with :func:`md_angular_jacobian` via
    :func:`_md_jac_cols`)."""
    return _md_jac_cols(model, R, p, link, x)[1]


def md_angular_jacobian(model: MultiDofModel, R, p, link: int):
    """(3, nv) world ANGULAR Jacobian of ``link``: column c of joint j is
    ``R_j · S_j[:3, c]`` for j ∈ ancestors ∪ {link} — the rotational half
    of :func:`md_point_jacobian`'s column loop (``p`` accepted for
    signature symmetry; positions don't enter the angular columns)."""
    return _md_jac_cols(model, R, p, link)[0]


def md_loop_rows(model: MultiDofModel, q, pairs, offsets_a, offsets_b):
    """Loop-closure (connect) rows on a multi-dof robot: ``(gaps (3L,),
    J (3L, nv))`` — the generalized-coordinate ``fb_loop_gap/jacobian``
    (:mod:`.loops`): gap = x_a − x_b in world coordinates, J = J_a − J_b
    over the tangent. ``b = −1`` pins to the world (``offsets_b`` is then
    the world anchor)."""
    dtype = q.dtype
    R, p = md_fk(model, q)
    oa = jnp.asarray(offsets_a, dtype)
    ob = jnp.asarray(offsets_b, dtype)
    gaps, rows = [], []
    for i, (a, b) in enumerate(pairs):
        xa = p[a] + R[a] @ oa[i]
        Ja = md_point_jacobian(model, R, p, int(a), xa)
        if b < 0:
            gaps.append(xa - ob[i])
            rows.append(Ja)
        else:
            xb = p[b] + R[b] @ ob[i]
            gaps.append(xa - xb)
            rows.append(Ja - md_point_jacobian(model, R, p, int(b), xb))
    return jnp.concatenate(gaps), jnp.concatenate(rows, axis=0)


def md_weld_rows(model: MultiDofModel, q, pairs, R0):
    """Weld ORIENTATION rows on a multi-dof robot: ``(gaps (3w,),
    J (3w, nv))`` — gap is the world rotation vector of
    ``R_a · R0 · R_bᵀ`` (assembly drift, ``..loops.fb_weld_gap``
    semantics; ``b = −1`` welds to the world), J rows are ω_a − ω_b over
    the tangent. Pair with :func:`md_loop_rows` at the anchor for the
    full 6-row weld."""
    from .loops import _rotvec_from_matrix

    dtype = q.dtype
    R, p = md_fk(model, q)
    R0 = jnp.asarray(R0, dtype)
    eye = jnp.eye(3, dtype=dtype)
    gaps, rows = [], []
    for i, (a, b) in enumerate(pairs):
        Rb = eye if b < 0 else R[b]
        gaps.append(_rotvec_from_matrix(R[a] @ R0[i] @ Rb.T))
        Jw = md_angular_jacobian(model, R, p, int(a))
        if b >= 0:
            Jw = Jw - md_angular_jacobian(model, R, p, int(b))
        rows.append(Jw)
    return jnp.concatenate(gaps), jnp.concatenate(rows, axis=0)


def md_contact_rows(model: MultiDofModel, q, links, offsets, ground_z=0.0,
                    terrain=None, geoms=None):
    """Contact rows for foot points (and optional ground geoms) on a
    multi-dof robot: ``(gaps (k_t,), J (3k_t, nv))`` in local [t1, t2, n]
    triplets over the tangent velocity — feet first, then geom endpoint
    contacts (:func:`..collision.fb_ground_geom_rows` semantics: gap along
    the local normal minus the radius, material point at the surface).
    ``geoms``: a :class:`..collision.Geoms` on REGULAR link indices (a
    floating torso is a link here, not a base)."""
    from .collision import _ground_contact_list

    n = model.topology.n
    dtype = q.dtype
    R, p = md_fk(model, q)
    eye3 = jnp.eye(3, dtype=dtype)
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
    points = [(int(l), jnp.asarray(offsets[i], dtype), None)
              for i, l in enumerate(links)]
    if geoms is not None:
        bad = [l for l in geoms.links if not 0 <= l < n]
        if bad:
            raise ValueError(
                f"md ground-geom links {bad} out of range [0, {n}) — the "
                "multi-dof stack has no base link; attach torso geoms to "
                "the floating joint's link")
        for i, e_idx in _ground_contact_list(geoms):
            e0 = (geoms.a[i] if e_idx == 0 else geoms.b[i]).astype(dtype)
            points.append((geoms.links[i], e0, geoms.r[i].astype(dtype)))
    gaps, rows = [], []
    for l, off, r in points:
        x_w = p[l] + R[l] @ off
        if terrain is None:
            nrm_w, C = ez, eye3
            gap = x_w[2] - ground_z
        else:
            from .terrain import contact_frame, terrain_surface
            h, nrm_w = terrain_surface(terrain, x_w[0], x_w[1])
            gap = (x_w[2] - h) * nrm_w[2]
            C = contact_frame(nrm_w)
        x_c = x_w
        if r is not None:                   # endpoint sphere: radius shift
            gap = gap - r
            x_c = x_w - r * nrm_w           # material point at the surface
        gaps.append(gap)
        rows.append(C @ md_point_jacobian(model, R, p, l, x_c))
    return jnp.stack(gaps), jnp.concatenate(rows, axis=0)


def md_constrained_fd(model: MultiDofModel, q, qd, tau, links, offsets,
                      gravity=-9.81, baumgarte=(10.0, 10.0), reg=0.0):
    """Bilateral point-constrained FD (stance / pinned feet) on a
    multi-dof robot: ``(q̈ (nv,), λ (3k,))`` — the generalized-coordinate
    ``fb_constrained_forward_dynamics``. Constraint acceleration target
    uses the standard Baumgarte velocity damping ``a* = −2α J q̇`` (β is
    accepted for signature parity; the velocity-level rows hold the
    points where they are)."""
    c = md_inverse_dynamics(model, q, qd, gravity=gravity)
    M = md_crba(model, q)
    Lm = jnp.linalg.cholesky(M)
    msolve = lambda rhs: jax.scipy.linalg.cho_solve((Lm, True), rhs)

    def J_at(q_):
        R, p = md_fk(model, q_)
        return jnp.concatenate(
            [md_point_jacobian(model, R, p, int(l),
                               p[int(l)] + R[int(l)]
                               @ jnp.asarray(offsets[i], q.dtype))
             for i, l in enumerate(links)])

    J = J_at(q)
    # bias J̇ q̇ = d/dt [J(q(t)) q̇] along the flow — the Jacobian's tangent
    # CHART moves with the configuration (J_at re-centers at q ⊕ d), the
    # same exact forward-mode construction as ..contact.fb_contact_bias.
    # (Differentiating the POSITION map twice along the retraction curve
    # instead is wrong at second order for floating joints: the retraction
    # translates with the frozen attitude, dropping the R ω̂ v term.)
    _, Jdqd = jax.jvp(
        lambda d: J_at(md_tangent_apply(model, q, d)) @ qd,
        (jnp.zeros(model.nv, q.dtype),), (qd,))
    qdd_free = msolve(tau - c)
    alpha, beta = baumgarte
    a_star = -2.0 * alpha * (J @ qd)
    MiJt = msolve(J.T)
    G = J @ MiJt + (reg + 1e-12) * jnp.eye(J.shape[0], dtype=q.dtype)
    lam = jnp.linalg.solve(G, a_star - Jdqd - J @ qdd_free)
    return qdd_free + MiJt @ lam, lam


def md_step_ground(model: MultiDofModel, q, qd, tau, dt, links, offsets,
                   mu=0.8, ground_z=0.0, gravity=-9.81, iters: int = 30,
                   erp: float = 0.2, margin: float = 1e-3,
                   restitution: float = 0.0, limits=None, effort=None,
                   limit_mode: str = "project", diff_mode: str = "unroll",
                   relax: float = 1.0, terrain=None, ground_geoms=None,
                   mu_ground=None, loops=None, welds=None,
                   frictionloss=None, softness=None, tendons=None):
    """One frictional ground-contact step of a multi-dof robot — the
    generalized-coordinate ``fb_step_ground``, identical semantics
    (Stewart-Trinkle velocity stepping, gap-gated PGS cone solve, erp
    penetration recovery, restitution, ``diff_mode="implicit"`` IFT
    gradients) on tangent velocities with manifold retraction. Returns
    ``((q⁺, q̇⁺), impulses (k_t, 3))``, feet first then ground-geom
    contacts.

    Joint constraints (the same MJCF grants as the fb route —
    VERDICT r3 #3): ``limits=(lo, hi)`` ((nq,) each, ±inf on
    ball/free-joint slots) with ``limit_mode="project"`` (position
    projection + outward-velocity zeroing on scalar joints) or
    ``"impulse"`` (unilateral limit rows in the one PGS solve);
    ``effort (nv,)`` clamps τ to ±effort; ``frictionloss (nv,)``
    adds MuJoCo-style dry-friction BOX rows per tangent coordinate
    (bound = loss·dt; differentiable in the loss).

    ``loops = (pairs, offsets_a, offsets_b)`` adds loop-closure connect
    cuts and ``welds = (pairs, R0)`` weld orientation rows as bilateral
    rows in the same PGS solve (:func:`md_loop_rows` /
    :func:`md_weld_rows` — the md counterpart of the fb steppers'
    ``loops=``/``welds=``).

    ``tendons = (A_q (t, nq), A_v (t, nv), lo, hi)``: fixed-tendon range
    rows (``L = A_q·q`` near a bound → one normal-only impulse row on
    ``A_v`` — see :func:`..contact._tendon_limit_rows`); fixed tendons
    couple scalar joints only, so the env layer expands the per-joint
    MJCF coefficients to both coordinate layouts."""
    if diff_mode not in ("unroll", "implicit"):
        raise ValueError(f"diff_mode must be 'unroll' or 'implicit', "
                         f"got {diff_mode!r}")
    if limit_mode not in ("project", "impulse"):
        raise ValueError(f"limit_mode must be 'project' or 'impulse', "
                         f"got {limit_mode!r}")
    if limits is not None:
        _md_check_limits(model, limits[0], limits[1])
    if effort is not None:
        tau = clamp_effort(tau, effort)
    impulse_limits = limits is not None and limit_mode == "impulse"
    dtype = q.dtype
    c = md_inverse_dynamics(model, q, qd, gravity=gravity)
    M = md_crba(model, q)
    Lm = jnp.linalg.cholesky(M)
    msolve = lambda rhs: jax.scipy.linalg.cho_solve((Lm, True), rhs)
    v_free = qd + dt * msolve(tau - c)

    gaps, J = md_contact_rows(model, q, links, offsets, ground_z=ground_z,
                              terrain=terrain, geoms=ground_geoms)
    k_feet = len(links)
    k = gaps.shape[0]
    active = (gaps < margin).astype(dtype)

    lim_active = lim_gap = None
    n_lim = 0
    lim_parts = []           # (rows, active, gap) — joint limits, then
    if impulse_limits:       # tendon ranges, one shared normal-only block
        # one normal-only row per SCALAR joint on its tangent column —
        # ..contact._limit_rows, exactly the fb stepper's machinery
        from .contact import _limit_rows
        qidx, vidx = _md_scalar_coords(model)
        lim_parts.append(_limit_rows(
            q[qidx], jnp.asarray(limits[0], dtype)[qidx],
            jnp.asarray(limits[1], dtype)[qidx], margin, vidx,
            model.nv, dtype))
    if tendons is not None:
        from .contact import _tendon_limit_rows
        A_q_t, A_v_t, t_lo, t_hi = tendons
        lim_parts.append(_tendon_limit_rows(
            jnp.asarray(A_q_t, dtype) @ q, jnp.asarray(t_lo, dtype),
            jnp.asarray(t_hi, dtype), jnp.asarray(A_v_t, dtype), margin,
            dtype))
    if lim_parts:
        J = jnp.concatenate([J] + [p[0] for p in lim_parts], axis=0)
        lim_active = jnp.concatenate([p[1] for p in lim_parts])
        lim_gap = jnp.concatenate([p[2] for p in lim_parts])
        n_lim = int(lim_active.shape[0])
    eq = 0
    eq_gaps = []
    if loops is not None:
        lpairs, loa, lob = loops
        gap_loop, J_loop = md_loop_rows(model, q, lpairs, loa, lob)
        eq_gaps.append(gap_loop)
        J = jnp.concatenate([J, J_loop], axis=0)
        eq = J_loop.shape[0]
    if welds is not None:
        wpairs, wR0 = welds
        gap_weld, J_weld = md_weld_rows(model, q, wpairs, wR0)
        eq_gaps.append(gap_weld)
        J = jnp.concatenate([J, J_weld], axis=0)
        eq = eq + J_weld.shape[0]
    fr_bound = None
    if frictionloss is not None:
        # dry-friction BOX rows per tangent coordinate — ball/free
        # joints get componentwise friction (..contact._fric_box_rows)
        from .contact import _fric_box_rows
        J_f, fr_bound = _fric_box_rows(frictionloss,
                                       np.arange(model.nv), model.nv,
                                       dt, dtype)
        if J_f is not None:
            J = jnp.concatenate([J, J_f], axis=0)

    MiJt = msolve(J.T)
    G = J @ MiJt + 1e-9 * jnp.eye(J.shape[0], dtype=dtype)
    if softness is not None:
        # compliant contact (see ..contact.soft_contact_params): per-row
        # Delassus compliance on the cone triplets
        from .contact import _softness_rows
        idx = jnp.arange(3 * k)
        G = G.at[idx, idx].add(_softness_rows(softness, k, dtype))
    vn_now = (J[:3 * k] @ qd).reshape(k, 3)[:, 2]
    v_star = (-erp * jnp.minimum(gaps, 0.0) / dt
              - restitution * jnp.minimum(vn_now, 0.0))
    b = (J @ v_free).at[2:3 * k:3].add(-v_star)
    if lim_active is not None:
        v_star_l = -erp * jnp.minimum(lim_gap, 0.0) / dt
        b = b.at[3 * k:3 * k + n_lim].add(-v_star_l)
    if eq:
        # bilateral rows: J v⁺ = −erp·gap/dt (loop connects, then welds)
        b = b.at[3 * k + n_lim:3 * k + n_lim + eq].add(
            erp * jnp.concatenate(eq_gaps) / dt)

    mu_vec = jnp.broadcast_to(jnp.asarray(mu, dtype), (k_feet,))
    if k > k_feet:
        mu_g = mu if mu_ground is None else mu_ground
        mu_vec = jnp.concatenate([mu_vec, jnp.broadcast_to(
            jnp.asarray(mu_g, dtype), (k - k_feet,))])
    p_imp = pgs_solve(G, b, mu_vec, active, iters, lim_active=lim_active,
                      implicit_diff=(diff_mode == "implicit"), relax=relax,
                      eq_rows=eq, fric_bound=fr_bound)

    v_new = v_free + MiJt @ p_imp
    q2 = md_tangent_apply(model, q, dt * v_new)
    qd2 = v_new
    if limits is not None and limit_mode == "project":
        q2, qd2 = md_project_joint_limits(model, q2, qd2, limits[0],
                                          limits[1])
    return (q2, qd2), p_imp[:3 * k].reshape(k, 3)


def md_step_ground_batched(model: MultiDofModel, q, qd, tau, dt, links,
                           offsets, mu=0.8, ground_z=0.0, gravity=-9.81,
                           iters: int = 30, erp: float = 0.2,
                           margin: float = 1e-3, restitution: float = 0.0,
                           limits=None, effort=None,
                           limit_mode: str = "project",
                           impl: str = "auto", diff_mode: str = "unroll",
                           relax: float = 1.0, terrain=None,
                           ground_geoms=None, mu_ground=None, loops=None,
                           welds=None, frictionloss=None, softness=None,
                           tendons=None):
    """Batched :func:`md_step_ground`: ``q (B, nq)``, ``qd/tau (B, nv)``,
    optional per-environment ``mu (B,)`` → ``((q⁺, q̇⁺), impulses
    (B, k_t, 3))``. ``limits``/``effort``/``limit_mode``/``frictionloss``
    as in :func:`md_step_ground` (same MJCF grants as the fb route).

    ``impl="auto"`` routes the whole step through ONE fused Pallas kernel
    per 128-environment lane tile on TPU
    (:func:`.kernels.md_contact_fused.md_step_ground_fused`) when the
    shape qualifies: flat plane, ``diff_mode="unroll"``, ``relax == 1``,
    static scalar ``mu_ground`` and concrete geom geometry. Heightfield
    terrain, implicit-diff, traced geometry, impulse-mode limits,
    loop/weld/tendon rows, and frictionloss run the vmap tier; effort clamps
    and PROJECT-mode limits compose with the fused kernel (clamp
    before, projection after, both pure XLA)."""
    from .contact import _impl_auto, _mu_to_bl

    if limit_mode not in ("project", "impulse"):
        raise ValueError(f"limit_mode must be 'project' or 'impulse', "
                         f"got {limit_mode!r}")
    if limits is not None:
        _md_check_limits(model, limits[0], limits[1])
    if effort is not None:
        tau = clamp_effort(tau, effort)
    impulse_limits = limits is not None and limit_mode == "impulse"
    mu_arr = jnp.asarray(mu)
    mu_ground_static = (ground_geoms is None
                        or (isinstance(mu_ground
                                       if mu_ground is not None else mu,
                                       (int, float))
                            and not any(isinstance(leaf, jax.core.Tracer)
                                        for leaf in
                                        jax.tree_util.tree_leaves(
                                            (ground_geoms.a, ground_geoms.b,
                                             ground_geoms.r)))))
    softness_concrete = (softness is None
                         or not any(isinstance(leaf, jax.core.Tracer)
                                    for leaf in
                                    jax.tree_util.tree_leaves(softness)))
    if (_impl_auto(impl, q) == "pallas" and terrain is None
            and diff_mode == "unroll" and relax == 1.0
            and not impulse_limits and frictionloss is None
            and loops is None and welds is None and tendons is None
            and mu_ground_static and softness_concrete):
        from .kernels import md_contact_fused as _mcf

        B = q.shape[0]
        k = len(links)
        mu_bl = _mu_to_bl(mu, k, B, q.dtype)
        mu_g = (None if ground_geoms is None
                else float(mu_ground if mu_ground is not None else mu))
        q2, v2, imp = _mcf.md_step_ground_fused(
            model, q.T, qd.T, tau.T, mu_bl, dt, links,
            np.asarray(offsets, np.float64), ground_z, gravity, iters,
            erp, margin, restitution, ground_geoms=ground_geoms,
            mu_ground=mu_g,
            softness=(None if softness is None
                      else np.asarray(softness, np.float64)))
        kt = imp.shape[0] // 3
        out_q, out_v = q2.T, v2.T
        if limits is not None:  # project mode (impulse mode fell back)
            out_q, out_v = md_project_joint_limits(model, out_q, out_v,
                                                   limits[0], limits[1])
        return (out_q, out_v), jnp.moveaxis(imp, 0, -1).reshape(B, kt, 3)

    in_axes = (0, 0, 0, 0 if mu_arr.ndim == 1 else None)

    def step1(q1, qd1, tau1, mu1):
        return md_step_ground(
            model, q1, qd1, tau1, dt, links, offsets, mu=mu1,
            ground_z=ground_z, gravity=gravity, iters=iters, erp=erp,
            margin=margin, restitution=restitution, limits=limits,
            limit_mode=limit_mode, diff_mode=diff_mode,
            relax=relax, terrain=terrain, ground_geoms=ground_geoms,
            mu_ground=mu_ground, loops=loops, welds=welds,
            frictionloss=frictionloss, softness=softness, tendons=tendons)

    return jax.vmap(step1, in_axes=in_axes)(q, qd, tau, mu_arr)


def md_simulate_ground(model: MultiDofModel, q0, qd0, taus, dt, links,
                       offsets, **kw):
    """``lax.scan`` rollout of :func:`md_step_ground` (``taus (T, nv)``).
    Returns ``((q_T, q̇_T), (q stack, q̇ stack, impulse stack))``."""
    def step(s, tau):
        (q2, v2), imp = md_step_ground(model, s[0], s[1], tau, dt, links,
                                       offsets, **kw)
        return (q2, v2), (q2, v2, imp)

    return jax.lax.scan(step, (q0, qd0), taus)
