"""Fused Pallas TPU kernel for the multi-dof frictional ground stepper.

One ``pallas_call`` per 128-state lane tile advances a fleet of ball-hip /
freejoint robots (``ops/md_contact.py::md_step_ground`` semantics) through
transforms → generalized RNEA bias → CRBA mass matrix → active-region
Cholesky → world FK → contact rows → ONE merged multi-rhs solve → Delassus
rows → PGS cone solve → tangent retraction, all VMEM-resident — the md
counterpart of :func:`..contact_fused._step_ground_body`, composed from
:mod:`.multidof_fused`'s generalized bodies and :mod:`.contact_fused`'s
solve/PGS machinery.

Scope (v1): flat plane, foot points + geom-ground endpoint contacts.
Heightfield terrain, per-env traced geometry, and implicit-diff fall back
to the vmap path in ``md_contact.md_step_ground_batched``.

Unlike the free-flyer kernel there is no separate base state: q (nq,B)
carries the quaternions, and FK runs world-direct (the floating joint is
joint 0's transform), so the contact rows need no base-block special case
— every column comes from :func:`_md_point_cols_s`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .contact_fused import (_chol_apply_e, _chol_factor_ev, _cross3s,
                            _fk_s, _jt_stacks, _mv3s, _mv3s_c, _pgs_rows,
                            _quat_exp_s, _quat_mul_s, _quat_rot_s,
                            _sum_terms, ground_geoms_static)
from .multidof_fused import (_md_crba_s, _md_rnea_s, _md_transforms_s,
                             _run_md)
from .staged import _CAL, _LANE_BUDGET

__all__ = ["md_step_ground_fused", "md_step_workset_ok"]


def md_step_workset_ok(n: int, nv: int, k: int) -> bool:
    """Lane-tile VMEM gate for the md step kernel: the md dynamics set
    (:func:`..multidof_fused.md_workset_ok`: X+IC+v/a/f ≈ 108n, mass+chol
    ≈ 1.5 nv²) plus the contact set (rows + merged solve ≈ 2·3k·nv,
    Delassus/PGS ≈ 2(3k)²)."""
    ws = (108.0 * n + 1.5 * nv * nv + 2.0 * (3 * k * nv)
          + 2.0 * (3 * k) ** 2 + 200.0)
    return ws * _CAL <= _LANE_BUDGET


def _md_point_cols_s(km, Rs, ps, link, x):
    """World q̇-columns of a traced point ``x`` ((3,B)) attached to
    ``link``: dict {tangent index: (3,B)} over the support's coordinates —
    each joint's (6, w) motion subspace contributes w columns
    ``a_ω × (x − p_j) + a_v`` with the subspace entries folded as float
    literals (zero halves skipped at trace time)."""
    support = set(km.topology.ancestors[link]) | {link}
    cols = {}
    for j in sorted(support):
        sv, w = km.v_slices[j]
        S = np.asarray(km.S_np[j])
        for c in range(w):
            ang = [float(v) for v in S[:3, c]]
            lin = [float(v) for v in S[3:, c]]
            terms = []
            if any(ang):
                terms.append(_cross3s(_mv3s_c(Rs[j], ang), x - ps[j]))
            if any(lin):
                terms.append(_mv3s_c(Rs[j], lin))
            cols[sv + c] = _sum_terms(terms)
    return cols


def _md_step_ground_body(km, q, qd, tau, mu, *, links, offsets, dt,
                         ground_z, gravity, iters, erp, margin,
                         restitution, ground_static=None, mu_grd=0.8,
                         softness=None):
    """One md frictional ground step on a lane tile. Mirrors
    ``..md_contact.md_step_ground`` term for term; returns
    (q2 (nq,B), v2 (nv,B), imp (3k_t,B))."""
    nv = km.nv
    n = km.topology.n
    X = _md_transforms_s(km, q)
    c, *_ = _md_rnea_s(km, X, qd, None, gravity)
    M = _md_crba_s(km, X)
    Lm = _chol_factor_ev(M, nv)
    rhs_free = [tau[r:r + 1] - c[r:r + 1] for r in range(nv)]
    v = [qd[r:r + 1] for r in range(nv)]

    Rs, ps = _fk_s(km, X)
    # contact list: foot points (no radius) then geom endpoints (radius)
    contacts = [(int(l), [float(v_) for v_ in offsets[i]], None)
                for i, l in enumerate(links)]
    if ground_static is not None:
        contacts += [(l, list(e), r) for l, e, r in ground_static]
    k = len(contacts)
    rows_t = 3 * k
    J, gaps, active = [], [], []
    for l, off, rg in contacts:
        x = ps[l] + _mv3s_c(Rs[l], off)
        gap = x[2:3] - ground_z
        if rg is not None:
            gap = gap - rg
            # material point at the surface: world normal is e_z here
            x = jnp.concatenate([x[0:2], x[2:3] - rg])
        cols = _md_point_cols_s(km, Rs, ps, l, x)
        for r in range(3):
            row = [None] * nv
            for vi, colv in cols.items():
                row[vi] = colv[r:r + 1]
            J.append(row)
        gaps.append(gap)
        active.append((gap < margin).astype(q.dtype))

    JT = _jt_stacks(J, nv, q[0:1])
    zero_rows = jnp.zeros((rows_t,) + q.shape[1:], q.dtype)
    # ONE merged multi-rhs solve: rows 0..rows_t-1 = M⁻¹Jᵀ, last = M⁻¹ rhs
    sol = _chol_apply_e(Lm, [
        jnp.concatenate([JT[c2] if JT[c2] is not None else zero_rows,
                         rhs_free[c2]])
        for c2 in range(nv)])
    MiJt = [sol[c2][:rows_t] for c2 in range(nv)]
    v_free = [v[c2] + dt * sol[c2][rows_t:rows_t + 1] for c2 in range(nv)]

    G_rows = [
        _sum_terms([J[r][c2] * MiJt[c2] for c2 in range(nv)
                    if J[r][c2] is not None])
        for r in range(rows_t)]
    Jv = _sum_terms([JT[c2] * v[c2] for c2 in range(nv)
                     if JT[c2] is not None])
    b = _sum_terms([JT[c2] * v_free[c2] for c2 in range(nv)
                    if JT[c2] is not None])
    brows = [b[r:r + 1] for r in range(rows_t)]
    for ci in range(k):
        vn_now = Jv[3 * ci + 2:3 * ci + 3]
        v_star = (-erp * jnp.minimum(gaps[ci], 0.0) / dt
                  - restitution * jnp.minimum(vn_now, 0.0))
        brows[3 * ci + 2] = brows[3 * ci + 2] - v_star
    b = jnp.concatenate(brows)

    if ground_static is not None and len(ground_static):
        # geom-row friction: static coefficient via a real input slice
        # (Mosaic miscompiles purely constant chains)
        mu = jnp.concatenate(
            [mu] + [mu[0:1] * 0.0 + mu_grd] * len(ground_static))
    if softness is None:
        regs = 1e-9
    else:
        # compliant contact: per-row Delassus compliance baked as
        # literals (see ...contact.soft_contact_params)
        s_rows = np.broadcast_to(np.asarray(softness, np.float64), (k,))
        regs = [1e-9 + float(s_rows[i // 3]) for i in range(3 * k)]
    p_imp_arr = _pgs_rows(G_rows, b, mu, active, k, iters, regs)

    v_new = [
        v_free[c2] + jnp.sum(MiJt[c2] * p_imp_arr, axis=0, keepdims=True)
        for c2 in range(nv)]

    # tangent retraction, md_tangent_apply semantics (pre-update attitude)
    q2_parts = []
    for i in range(n):
        s, w = km.q_slices[i]
        sv, wv = km.v_slices[i]
        t = km.joint_types[i]
        if t == "floating":
            quat = q[s:s + 4]
            dphi = jnp.concatenate([dt * v_new[sv + c2] for c2 in range(3)])
            dpos = jnp.concatenate([dt * v_new[sv + 3 + c2]
                                    for c2 in range(3)])
            pos2 = q[s + 4:s + 7] + _mv3s(_quat_rot_s(quat), dpos)
            quat2 = _quat_mul_s(quat, _quat_exp_s(dphi))
            quat2 = quat2 / jnp.sqrt(
                jnp.sum(quat2 * quat2, axis=0, keepdims=True))
            q2_parts += [quat2, pos2]
        elif t == "spherical":
            dphi = jnp.concatenate([dt * v_new[sv + c2] for c2 in range(3)])
            quat2 = _quat_mul_s(q[s:s + 4], _quat_exp_s(dphi))
            quat2 = quat2 / jnp.sqrt(
                jnp.sum(quat2 * quat2, axis=0, keepdims=True))
            q2_parts.append(quat2)
        else:
            q2_parts.append(q[s:s + 1] + dt * v_new[sv])
    q2 = jnp.concatenate(q2_parts)
    v2 = jnp.concatenate(v_new)
    return q2, v2, p_imp_arr


def md_step_ground_fused(model, q, qd, tau, mu, dt, links, offsets,
                         ground_z=0.0, gravity=-9.81, iters: int = 30,
                         erp: float = 0.2, margin: float = 1e-3,
                         restitution: float = 0.0, ground_geoms=None,
                         mu_ground=None, softness=None, interpret=False,
                         force_xla=False):
    """Fused md frictional ground step — batch-last ``q (nq,B)``,
    ``qd/tau (nv,B)``, ``mu (k_feet,B)`` → ``(q2 (nq,B), v2 (nv,B),
    imp (3k_t,B))``. Numerics mirror ``..md_contact.md_step_ground``
    (plane). ``ground_geoms``: optional geoms on REGULAR links, endpoint
    geometry baked as literals. Robots past the VMEM gate
    (:func:`md_step_workset_ok`) run the identical body as plain XLA."""
    links = tuple(int(l) for l in links)
    off = np.asarray(offsets, np.float64)
    k = len(links)
    gs = None
    mu_g = 0.8 if mu_ground is None else float(mu_ground)
    if ground_geoms is not None:
        bad = [l for l in ground_geoms.links if not 0 <= l < model.n_joints]
        if bad:
            raise ValueError(
                f"md ground-geom links {bad} out of range "
                f"[0, {model.n_joints})")
        gs = ground_geoms_static(ground_geoms)
    kt = k + (0 if gs is None else len(gs))

    def body(km, q, qd, tau, mu):
        return _md_step_ground_body(
            km, q, qd, tau, mu, links=links, offsets=off, dt=float(dt),
            ground_z=float(ground_z), gravity=float(gravity),
            iters=int(iters), erp=float(erp), margin=float(margin),
            restitution=float(restitution), ground_static=gs, mu_grd=mu_g,
            softness=softness)

    nq, nv = model.nq, model.nv
    gate = lambda n_, nv_: md_step_workset_ok(n_, nv_, kt)
    return _run_md(model, body, [q, qd, tau, mu], [nq, nv, 3 * kt],
                   interpret, force_xla, gate=gate)
