"""Multi-dof ((6,k) motion subspace) joints — ops/multidof.py.

Validation strategy:
1. single-dof reduction: on an all-1-dof robot the generalized stack must
   reproduce the existing ops exactly (same coordinates);
2. spherical ≡ 3-revolute (z,y,x, zero-offset) chain away from gimbal lock:
   inverse dynamics maps by generalized-force duality (τ_euler = Wᵀ τ_sph),
   forward dynamics by the ω/ω̇ chain rule, both obtained rigorously from
   ``jax.jvp`` of the rotation composition;
3. physics invariants *through* gimbal lock (where the expanded chain is
   singular): energy conservation of a torque-free tumble, ID∘FD round trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from conftest import random_state
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import multidof as md
from gridcodegenerator_tpu.ops.freeflyer import rot_to_quat


@pytest.fixture(scope="module")
def ball():
    desc = g.parse_urdf(zoo.ball_arm())
    return desc, md.multidof_model_from_description(desc, dtype=jnp.float64)


def test_single_dof_reduction(iiwa):
    """On a 1-dof-only robot the generalized stack equals the existing ops."""
    desc, gold, model = iiwa
    mdm = md.multidof_model_from_description(desc, dtype=jnp.float64)
    assert mdm.nq == mdm.nv == desc.n
    q, qd, u = (jnp.asarray(x) for x in random_state(desc.n, seed=3))
    np.testing.assert_allclose(
        np.asarray(md.md_inverse_dynamics(mdm, q, qd, u)),
        np.asarray(g.inverse_dynamics(model, q, qd, u)), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(md.md_forward_dynamics(mdm, q, qd, u)),
        np.asarray(g.forward_dynamics(model, q, qd, u)), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(md.md_crba(mdm, q)), gold.crba(np.asarray(q)), atol=1e-10)
    dq, dqd, du = md.md_forward_dynamics_gradient(mdm, q, qd, u)
    J = np.asarray(g.forward_dynamics_gradient(model, q, qd, u))
    np.testing.assert_allclose(np.asarray(dq), J[:, :desc.n], atol=1e-8)
    np.testing.assert_allclose(np.asarray(dqd), J[:, desc.n:], atol=1e-8)


# ---------------------------------------------------------------- mappings
def _R_of(angles):
    """parent←child rotation of the z,y,x revolute chain (our joint
    convention: R = exp(az ẑ×)·exp(ay ŷ×)·exp(ax x̂×))."""
    az, ay, ax = angles[0], angles[1], angles[2]

    def rot(c, s, k):
        I = jnp.eye(3, dtype=angles.dtype)
        K = md.skew_j(jnp.eye(3, dtype=angles.dtype)[k])
        return I + s * K + (1 - c) * (K @ K)

    return (rot(jnp.cos(az), jnp.sin(az), 2)
            @ rot(jnp.cos(ay), jnp.sin(ay), 1)
            @ rot(jnp.cos(ax), jnp.sin(ax), 0))


def _omega_of(angles, rates):
    """Body angular velocity ω = unskew(Rᵀ Ṙ) of the chain."""
    _, Rdot = jax.jvp(_R_of, (angles,), (rates,))
    W = _R_of(angles).T @ Rdot
    return jnp.stack([W[2, 1], W[0, 2], W[1, 0]])


def _expanded_state(desc_sph, q_sph_angles, rates):
    """Map per-joint Euler states → (quat-q, ω-qd) for the spherical model."""
    qs, qds = [], []
    for i, t in enumerate(desc_sph.joint_types):
        a = q_sph_angles[i]
        r = rates[i]
        if t == "spherical":
            qs.append(np.asarray(rot_to_quat(_R_of(jnp.asarray(a)))))
            qds.append(np.asarray(_omega_of(jnp.asarray(a), jnp.asarray(r))))
        else:
            qs.append(np.asarray(a)[:1])
            qds.append(np.asarray(r)[:1])
    return jnp.asarray(np.concatenate(qs)), jnp.asarray(np.concatenate(qds))


def test_spherical_equals_expanded_chain(ball):
    """FD/ID agreement with the 3-revolute expansion (zero damping so the
    velocity-coordinate-dependent damping term doesn't differ by chart)."""
    desc, mdm = ball
    exp_desc = g.parse_urdf(zoo.expand_spherical(zoo.ball_arm()))
    exp_model = g.robot_model_from_description(exp_desc, dtype=jnp.float64)
    nE = exp_desc.n  # 7

    rng = np.random.default_rng(5)
    # per-joint euler angles/rates (3 for spherical, 1 used for revolute)
    angles = [rng.uniform(-0.8, 0.8, 3) for _ in range(3)]
    rates = [rng.uniform(-1.0, 1.0, 3) for _ in range(3)]
    q_e = jnp.asarray(np.concatenate([angles[0], angles[1][:1], angles[2]]))
    qd_e = jnp.asarray(np.concatenate([rates[0], rates[1][:1], rates[2]]))
    q_s, qd_s = _expanded_state(desc, angles, rates)

    # ---- inverse dynamics: τ_euler = Wᵀ τ_sph (generalized-force duality).
    qdd_s = jnp.asarray(rng.uniform(-1, 1, mdm.nv))
    # map q̈: ω̇ = d/dt ω(angles, rates) along (rates, accels) ⇒ invert for
    # the euler accels via W (3×3, nonsingular away from gimbal lock)
    qdd_e_parts = []
    k = 0
    for i, t in enumerate(desc.joint_types):
        w = 3 if t == "spherical" else 1
        if t == "spherical":
            a = jnp.asarray(angles[i])
            r = jnp.asarray(rates[i])
            W = jnp.stack([_omega_of(a, jnp.eye(3, dtype=a.dtype)[j])
                           for j in range(3)], axis=1)
            # ω̇ = W ä + (∂ω/∂angles) ȧ ⇒ ä = W⁻¹(ω̇ − jvp-part)
            _, wdot_from_angles = jax.jvp(lambda aa: _omega_of(aa, r),
                                          (a,), (r,))
            qdd_e_parts.append(jnp.linalg.solve(
                W, qdd_s[k:k + 3] - wdot_from_angles))
        else:
            qdd_e_parts.append(qdd_s[k:k + 1])
        k += w
    qdd_e = jnp.concatenate(qdd_e_parts)

    tau_s = md.md_inverse_dynamics(mdm, q_s, qd_s, qdd_s)
    tau_e = g.inverse_dynamics(exp_model, q_e, qd_e, qdd_e)
    # map τ_sph → τ_euler and compare
    tau_e_mapped = []
    k = 0
    for i, t in enumerate(desc.joint_types):
        if t == "spherical":
            a = jnp.asarray(angles[i])
            W = jnp.stack([_omega_of(a, jnp.eye(3, dtype=a.dtype)[j])
                           for j in range(3)], axis=1)
            tau_e_mapped.append(W.T @ tau_s[k:k + 3])
            k += 3
        else:
            tau_e_mapped.append(tau_s[k:k + 1])
            k += 1
    np.testing.assert_allclose(np.asarray(jnp.concatenate(tau_e_mapped)),
                               np.asarray(tau_e), atol=1e-9)

    # ---- forward dynamics: ω̇ from the euler solution must equal md_fd.
    u_e = tau_e  # consistent torques in each chart
    u_s = tau_s
    qdd_e_fd = g.forward_dynamics(exp_model, q_e, qd_e, u_e)
    qdd_s_fd = md.md_forward_dynamics(mdm, q_s, qd_s, u_s)
    np.testing.assert_allclose(np.asarray(qdd_s_fd), np.asarray(qdd_s),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(qdd_e_fd), np.asarray(qdd_e),
                               atol=1e-8)


def test_idfd_roundtrip_and_spd(ball):
    desc, mdm = ball
    rng = np.random.default_rng(9)
    q = md.neutral_q(mdm)
    # randomize attitudes
    dq = jnp.asarray(rng.uniform(-1, 1, mdm.nv))
    q = md.md_tangent_apply(mdm, q, dq)
    qd = jnp.asarray(rng.uniform(-1, 1, mdm.nv))
    u = jnp.asarray(rng.uniform(-4, 4, mdm.nv))
    qdd = md.md_forward_dynamics(mdm, q, qd, u)
    tau = md.md_inverse_dynamics(mdm, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(u), atol=1e-9)
    M = np.asarray(md.md_crba(mdm, q))
    np.testing.assert_allclose(M, M.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(M) > 0)


def test_energy_through_gimbal_lock():
    """Zero torque, zero damping, tumbling ball joints: energy conserved
    across a rollout whose middle-euler-angle equivalents sweep through
    ±π/2 (where the expanded chain's chart is singular)."""
    desc = g.parse_urdf(zoo.ball_arm(damping=0.0))
    mdm = md.multidof_model_from_description(desc, dtype=jnp.float64)
    q = md.neutral_q(mdm)
    qd = jnp.asarray([2.4, 0.8, -0.5, 1.0, -2.0, 1.5, 0.7])
    u = jnp.zeros(mdm.nv)

    @jax.jit
    def roll(q, qd):
        def body(carry, _):
            q, qd = carry
            q2, qd2 = md.md_step(mdm, q, qd, u, 2e-4)
            return (q2, qd2), md.md_energy(mdm, q2, qd2)

        return jax.lax.scan(body, (q, qd), None, length=4000)

    (qf, qdf), E = roll(q, qd)
    E = np.asarray(E)
    assert np.isfinite(E).all()
    drift = abs(E[-1] - E[0]) / max(1.0, abs(E[0]))
    assert drift < 2e-3, drift
    # quaternions stay unit
    for i, t in enumerate(mdm.joint_types):
        if t == "spherical":
            s, _ = mdm.q_slices[i]
            assert abs(float(jnp.linalg.norm(qf[s:s + 4])) - 1.0) < 1e-12


def test_tangent_gradient_vs_fd(ball):
    """md_forward_dynamics_gradient vs central finite differences on the
    manifold (attitude perturbed via the same tangent retraction)."""
    desc, mdm = ball
    rng = np.random.default_rng(17)
    q = md.md_tangent_apply(mdm, md.neutral_q(mdm),
                            jnp.asarray(rng.uniform(-0.8, 0.8, mdm.nv)))
    qd = jnp.asarray(rng.uniform(-1, 1, mdm.nv))
    u = jnp.asarray(rng.uniform(-3, 3, mdm.nv))
    dq, dqd, du = md.md_forward_dynamics_gradient(mdm, q, qd, u)
    eps = 1e-6
    for k in (0, 2, 3, 5):
        d = np.zeros(mdm.nv); d[k] = eps
        fp = md.md_forward_dynamics(
            mdm, md.md_tangent_apply(mdm, q, jnp.asarray(d)), qd, u)
        fm = md.md_forward_dynamics(
            mdm, md.md_tangent_apply(mdm, q, jnp.asarray(-d)), qd, u)
        col = (np.asarray(fp) - np.asarray(fm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dq[:, k]), col, rtol=3e-5,
                                   atol=3e-5)


def test_md_id_grad_analytic_vs_jacfwd(ball):
    """The analytic multi-dof ∂ID/∇FD must equal forward-mode AD through the
    recursions to f64 round-off — the strongest possible check of the
    (6,k)-generalized derivative recursions (md_id_grad docstring)."""
    desc, mdm = ball
    rng = np.random.default_rng(31)
    q = md.md_tangent_apply(mdm, md.neutral_q(mdm),
                            jnp.asarray(rng.uniform(-1.0, 1.0, mdm.nv)))
    qd = jnp.asarray(rng.uniform(-1, 1, mdm.nv))
    qdd = jnp.asarray(rng.uniform(-2, 2, mdm.nv))
    u = jnp.asarray(rng.uniform(-3, 3, mdm.nv))

    dq_a, dqd_a = md.md_id_grad(mdm, q, qd, qdd)

    def tau_of(delta, qd_):
        return md.md_inverse_dynamics(
            mdm, md.md_tangent_apply(mdm, q, delta), qd_, qdd)

    zero = jnp.zeros(mdm.nv, q.dtype)
    dq_j, dqd_j = jax.jacfwd(tau_of, argnums=(0, 1))(zero, qd)
    np.testing.assert_allclose(np.asarray(dq_a), np.asarray(dq_j), atol=1e-10)
    np.testing.assert_allclose(np.asarray(dqd_a), np.asarray(dqd_j),
                               atol=1e-10)

    # ∇FD: analytic (Carpentier-Mansard via md_id_grad) vs jacfwd-through-FD
    Ja = md.md_forward_dynamics_gradient(mdm, q, qd, u, method="analytic")
    Jj = md.md_forward_dynamics_gradient(mdm, q, qd, u, method="jacfwd")
    for a, b in zip(Ja, Jj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_md_id_grad_mixed_tree_batched():
    """Analytic ∂ID on the mixed-dof chain (spherical-revolute-spherical),
    batched under jit+vmap, spot-checked against the single-state path."""
    desc = g.parse_urdf(zoo.ball_arm())
    mdm = md.multidof_model_from_description(desc, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    B = 4
    qs = jnp.stack([
        md.md_tangent_apply(mdm, md.neutral_q(mdm),
                            jnp.asarray(rng.uniform(-1, 1, mdm.nv)))
        for _ in range(B)])
    qds = jnp.asarray(rng.uniform(-1, 1, (B, mdm.nv)))
    qdds = jnp.asarray(rng.uniform(-1, 1, (B, mdm.nv)))

    f = jax.jit(jax.vmap(lambda a, b, c: md.md_id_grad(mdm, a, b, c)))
    dq, dqd = f(qs, qds, qdds)
    assert dq.shape == (B, mdm.nv, mdm.nv)
    for k in range(B):
        ref_q, ref_qd = md.md_id_grad(mdm, qs[k], qds[k], qdds[k])
        np.testing.assert_allclose(np.asarray(dq[k]), np.asarray(ref_q),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(dqd[k]), np.asarray(ref_qd),
                                   atol=1e-10)


def test_floating_joint_matches_freeflyer_module():
    """A true in-tree 6-dof ``floating`` joint (zoo.with_free_joint) must
    reproduce the dedicated free-flyer module exactly: ID (torques AND base
    wrench), FD, energy, and the analytic tangent-space gradient — two
    completely independent formulations (generic multi-dof recursions vs
    the ff module's gravity-trick + CRBA assembly) of the same physics."""
    from gridcodegenerator_tpu.models.urdf import rpy_to_matrix
    from gridcodegenerator_tpu.ops import freeflyer as ff

    urdf = zoo.iiwa14(damping=0.1)
    mdm = md.multidof_model_from_description(
        g.parse_urdf(zoo.with_free_joint(urdf)), dtype=jnp.float64)
    ffm = ff.free_flyer_model(g.parse_urdf(urdf), dtype=jnp.float64)
    n = ffm.n
    assert mdm.nq == 7 + n and mdm.nv == 6 + n
    assert mdm.joint_types[0] == "floating"

    rng = np.random.default_rng(43)
    quat = ff.rot_to_quat(jnp.asarray(rpy_to_matrix(rng.uniform(-0.8, 0.8, 3))))
    pos = jnp.asarray(rng.uniform(-1, 1, 3))
    q = jnp.asarray(rng.uniform(-1, 1, n))
    vb = jnp.asarray(rng.uniform(-1, 1, 6))
    qd = jnp.asarray(rng.uniform(-1, 1, n))
    tau = jnp.asarray(rng.uniform(-5, 5, n))

    q_md = jnp.concatenate([quat, pos, q])
    qd_md = jnp.concatenate([vb, qd])
    u_md = jnp.concatenate([jnp.zeros(6), tau])

    # --- forward dynamics
    acc_md = md.md_forward_dynamics(mdm, q_md, qd_md, u_md)
    dvb, qdd = ff.fb_forward_dynamics(ffm, quat, q, vb, qd, tau)
    np.testing.assert_allclose(np.asarray(acc_md[:6]), np.asarray(dvb),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(acc_md[6:]), np.asarray(qdd),
                               atol=1e-8)

    # --- inverse dynamics: rows = [base wrench; τ]
    gen_md = md.md_inverse_dynamics(mdm, q_md, qd_md, acc_md)
    tau_ff, wrench_ff = ff.fb_inverse_dynamics(ffm, quat, q, vb, qd,
                                               dvb, qdd)
    np.testing.assert_allclose(np.asarray(gen_md[:6]), np.asarray(wrench_ff),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(gen_md[6:]), np.asarray(tau_ff),
                               atol=1e-8)

    # --- energy
    e_md = md.md_energy(mdm, q_md, qd_md)
    e_ff = ff.fb_energy(ffm, quat, pos, q, vb, qd)
    np.testing.assert_allclose(float(e_md), float(e_ff), atol=1e-8)

    # --- analytic tangent-space gradient: md's [δφ | δv | δq] columns vs
    # the ff module's closed-form attitude block and dq/dvb/dqd blocks
    ddq, ddqd, ddu = md.md_forward_dynamics_gradient(mdm, q_md, qd_md, u_md)
    Jff = ff.fb_forward_dynamics_gradient(ffm, quat, q, vb, qd, tau)
    np.testing.assert_allclose(np.asarray(ddq[:, :3]), np.asarray(Jff["dphi"]),
                               atol=1e-7)
    # world-position invariance: the δv (position tangent) columns vanish
    np.testing.assert_allclose(np.asarray(ddq[:, 3:6]), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ddq[:, 6:]), np.asarray(Jff["dq"]),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ddqd[:, :6]), np.asarray(Jff["dvb"]),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ddqd[:, 6:]), np.asarray(Jff["dqd"]),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ddu[:, 6:]), np.asarray(Jff["dtau"]),
                               atol=1e-7)

    # --- md_id_grad vs jacfwd on the floating chain (the generic strongest
    # check extended to the new joint type)
    def tau_of(delta, qdv):
        return md.md_inverse_dynamics(
            mdm, md.md_tangent_apply(mdm, q_md, delta), qdv, acc_md)

    dq_a, dqd_a = md.md_id_grad(mdm, q_md, qd_md, acc_md)
    zero = jnp.zeros(mdm.nv, jnp.float64)
    dq_j, dqd_j = jax.jacfwd(tau_of, argnums=(0, 1))(zero, qd_md)
    np.testing.assert_allclose(np.asarray(dq_a), np.asarray(dq_j), atol=1e-9)
    np.testing.assert_allclose(np.asarray(dqd_a), np.asarray(dqd_j),
                               atol=1e-9)


def test_floating_chain_tumble_conserves_energy():
    """Torque-free, damping-free tumble of a free-floating iiwa through the
    GENERIC multi-dof path (floating joint + md_step manifold integrator):
    energy conserved, quaternion stays unit — validates the twist-chart
    integrator for 6-dof joints (the FD itself is pinned against the
    free-flyer module elsewhere)."""
    mdm = md.multidof_model_from_description(
        g.parse_urdf(zoo.with_free_joint(zoo.iiwa14(damping=0.0))),
        dtype=jnp.float64)
    q = md.neutral_q(mdm)
    qd = jnp.asarray(np.concatenate([[1.8, -1.1, 0.9, 0.1, -0.2, 0.3],
                                     0.4 * np.ones(7)]))
    u = jnp.zeros(mdm.nv)

    @jax.jit
    def roll(q, qd):
        def body(carry, _):
            q_, qd_ = carry
            q2, qd2 = md.md_step(mdm, q_, qd_, u, 2e-4)
            return (q2, qd2), md.md_energy(mdm, q2, qd2)
        return jax.lax.scan(body, (q, qd), None, length=3000)

    (qT, qdT), E = roll(q, qd)
    E = np.asarray(E)
    assert np.isfinite(E).all()
    drift = abs(E[-1] - E[0]) / max(1.0, abs(E[0]))
    assert drift < 2e-3, drift
    assert abs(float(jnp.linalg.norm(qT[:4])) - 1.0) < 1e-12


def test_md_aba_matches_crba_fd(ball):
    """Generalized ABA (per-joint k×k blocks, no mass matrix) equals the
    CRBA+Cholesky FD — and on a free-joint humanoid too."""
    for model in [ball[1],
                  md.multidof_model_from_description(
                      g.parse_urdf(zoo.with_free_joint(
                          zoo.iiwa14(damping=0.1))))]:
        rng = np.random.default_rng(51)
        dq = jnp.asarray(rng.uniform(-0.8, 0.8, model.nv))
        q = md.md_tangent_apply(model, md.neutral_q(model), dq)
        qd = jnp.asarray(rng.uniform(-1, 1, model.nv))
        u = jnp.asarray(rng.uniform(-5, 5, model.nv))
        ref = md.md_forward_dynamics(model, q, qd, u)
        got = md.md_aba(model, q, qd, u)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-9)
