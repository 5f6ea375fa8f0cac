"""Reflected rotor inertia (armature) — beyond the reference's rigid-link
model (GRiDCodeGenerator has no rotor/gearbox terms anywhere;
``/root/reference/_test.py`` models link inertias only). Semantics follow
MuJoCo's ``armature``: joint i contributes ``aᵢ·q̈ᵢ`` to its torque, i.e.
every solve runs against M + diag(a), entering the articulated recursions
solely through the joint-space D = SᵀU + aᵢ term and the CRBA diagonal.

Validation axes:
  * golden self-consistency: analytic (M+A)⁻¹ recursion == dense inverse of
    the armature-aware CRBA (two independent f64 algorithms);
  * engine vs golden across all five algorithm families + ABA;
  * AD cross-check (jacfwd of the armature-aware FD == analytic ∇FD);
  * fused Pallas kernels (interpret mode) == golden;
  * free-flyer: mass-matrix path == ABA path (independent formulations);
  * physics: undamped rollout conserves E + ½Σaᵢq̇ᵢ² (rotor kinetic energy);
  * zero armature is the exact legacy behavior.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from conftest import get_setup, random_state
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import aba, fd, fd_grad, minv, rnea
from gridcodegenerator_tpu.utils.golden import GoldenDynamics


def _armed(name, seed=7):
    """(desc_with_armature, golden, model_with_armature) for a zoo robot."""
    desc, _, model = get_setup(name)
    rng = np.random.default_rng(seed)
    a = rng.uniform(0.02, 0.5, desc.n)
    desc_a = dataclasses.replace(desc, armature=a)
    return desc_a, GoldenDynamics(desc_a), g.with_armature(model, jnp.asarray(a))


def test_urdf_parses_armature_attribute():
    """The nonstandard <dynamics armature="..."> attribute round-trips into
    RobotDescription → RobotModel → GoldenDynamics."""
    urdf = """
    <robot name="arm2">
      <link name="base"/>
      <link name="l1"><inertial><mass value="1.0"/>
        <inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial></link>
      <link name="l2"><inertial><mass value="0.5"/>
        <inertia ixx="0.05" iyy="0.05" izz="0.05"/></inertial></link>
      <joint name="j1" type="revolute"><parent link="base"/><child link="l1"/>
        <axis xyz="0 0 1"/><dynamics damping="0.1" armature="0.25"/></joint>
      <joint name="j2" type="revolute"><parent link="l1"/><child link="l2"/>
        <origin xyz="0 0 0.3"/><axis xyz="0 1 0"/>
        <dynamics armature="0.125"/></joint>
    </robot>"""
    desc = g.parse_urdf(urdf)
    np.testing.assert_allclose(desc.armature, [0.25, 0.125])
    model = g.robot_model_from_description(desc, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(model.armature), [0.25, 0.125])
    np.testing.assert_allclose(GoldenDynamics(desc).armature, [0.25, 0.125])


@pytest.mark.smoke
def test_golden_minv_inverts_armature_crba():
    """Two independent f64 formulations: the articulated (M+A)⁻¹ recursion
    (D = SᵀU + a) vs numpy inverse of CRBA + diag(a)."""
    desc_a, gold, _ = _armed("iiwa14")
    q, _, _ = random_state(desc_a.n, seed=11)
    M = gold.crba(q)
    assert abs(M - M.T).max() < 1e-12
    err = abs(gold.minv(q, True) - np.linalg.inv(M)).max()
    assert err < 1e-12


@pytest.mark.parametrize("name", ["iiwa14", "barm", "chain5p"])
def test_families_vs_golden(name):
    """RNEA (with q̈), M⁻¹, FD, ABA, ∂ID, ∇FD against the armature-aware
    golden model on serial, branched, and prismatic-mixed trees."""
    desc_a, gold, model = _armed(name)
    n = desc_a.n
    q, qd, u = random_state(n, seed=23)
    qdd = np.random.default_rng(5).uniform(-2, 2, n)
    qj, qdj, uj, qddj = map(jnp.asarray, (q, qd, u, qdd))

    c_g, *_ = gold.rnea(q, qd, qdd)
    np.testing.assert_allclose(
        np.asarray(rnea.inverse_dynamics(model, qj, qdj, qddj)), c_g,
        atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(minv.direct_minv(model, qj, dense=True)),
        gold.minv(q, True), atol=1e-10)
    qdd_g = gold.fd(q, qd, u)
    np.testing.assert_allclose(
        np.asarray(fd.forward_dynamics(model, qj, qdj, uj)), qdd_g,
        atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(aba.aba(model, qj, qdj, uj)), qdd_g, atol=1e-10)
    # ∂ID is armature-free at fixed q̈ (aᵢ·q̈ᵢ is constant in q, q̇) but runs
    # through the shared pipeline; ∇FD carries armature via (M+A)⁻¹
    G = np.asarray(fd_grad.forward_dynamics_gradient(model, qj, qdj, uj))
    np.testing.assert_allclose(G, gold.fd_grad(q, qd, u), atol=1e-9)


@pytest.mark.mid
def test_fd_grad_vs_jacfwd():
    """Analytic ∇FD == jacfwd of the armature-aware FD (wrt q, q̇, u)."""
    _, _, model = _armed("iiwa14")
    n = model.n
    q, qd, u = map(jnp.asarray, random_state(n, seed=31))
    G = fd_grad.forward_dynamics_gradient(model, q, qd, u)
    J = jnp.concatenate([
        jax.jacfwd(lambda z: fd.forward_dynamics(model, z, qd, u))(q),
        jax.jacfwd(lambda z: fd.forward_dynamics(model, q, z, u))(qd),
    ], axis=1)
    np.testing.assert_allclose(np.asarray(G), np.asarray(J), atol=1e-10)


@pytest.mark.mid
def test_fused_kernels_with_armature():
    """The fused Pallas paths (interpret mode) carry armature through the
    in-kernel recursions: FD (ABA + dense-Cholesky), M⁻¹, ∇FD vs golden."""
    from gridcodegenerator_tpu.ops.kernels import fused

    desc_a, gold, model = _armed("iiwa14")
    n = desc_a.n
    model32 = model.astype(jnp.float32)
    B = 4
    q, qd, u = (jnp.asarray(x, jnp.float32).T
                for x in random_state(n, seed=41, batch=(B,)))

    qdd_k = np.asarray(fused.forward_dynamics_aba_fused(
        model32, q, qd, u, block_b=4, interpret=True))
    Minv_k = np.asarray(fused.minv_fused(model32, q, block_b=4,
                                         interpret=True))
    ddq, ddqd = fused.fd_grad_fused(model32, q, qd, u, block_b=4,
                                    interpret=True)
    G_k = np.concatenate([np.asarray(ddq), np.asarray(ddqd)], axis=1)
    for b in range(B):
        qb, qdb, ub = (np.asarray(x[:, b], np.float64) for x in (q, qd, u))
        np.testing.assert_allclose(qdd_k[:, b], gold.fd(qb, qdb, ub),
                                   atol=5e-4)
        np.testing.assert_allclose(Minv_k[:, :, b], gold.minv(qb, True),
                                   atol=5e-5)
        ref = gold.fd_grad(qb, qdb, ub)
        np.testing.assert_allclose(G_k[:, :, b], ref,
                                   atol=5e-3 * max(1, abs(ref).max()))


def test_freeflyer_armature_two_formulations():
    """Floating base with armature on the arm joints: the (6+n)² mass-matrix
    Cholesky path and the O(n) articulated ABA path agree (independent
    treatments of the armature term: CRBA diagonal vs D = SᵀU + a)."""
    from gridcodegenerator_tpu.ops import freeflyer as ff

    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    rng = np.random.default_rng(3)
    desc_a = dataclasses.replace(desc, armature=rng.uniform(0.05, 0.3, desc.n))
    ffm = ff.free_flyer_model(desc_a, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(ffm.arm.armature), desc_a.armature)

    n = desc.n
    quat = jnp.asarray(rng.normal(size=4))
    quat = quat / jnp.linalg.norm(quat)
    q, vb, qd, tau = (jnp.asarray(rng.uniform(-1, 1, d))
                      for d in (n, 6, n, n))
    vb_dot_m, qdd_m = ff.fb_forward_dynamics(ffm, quat, q, vb, qd, tau)
    vb_dot_a, qdd_a = aba.fb_aba(ffm, quat, q, vb, qd, tau)
    np.testing.assert_allclose(np.asarray(vb_dot_a), np.asarray(vb_dot_m),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(qdd_a), np.asarray(qdd_m),
                               atol=1e-9)
    # armature actually matters: zero-armature dynamics differ
    ffm0 = ff.free_flyer_model(desc, dtype=jnp.float64)
    _, qdd0 = ff.fb_forward_dynamics(ffm0, quat, q, vb, qd, tau)
    assert abs(np.asarray(qdd_a) - np.asarray(qdd0)).max() > 1e-3


def test_energy_conservation_with_rotor_ke():
    """Undamped double pendulum with heavy armature: RK4 rollout conserves
    E_links + ½Σaᵢq̇ᵢ² — the physically correct conserved quantity for a
    geared rotor spinning with its joint (and a sharp test that armature
    enters FD exactly as added inertia, not as a bias force)."""
    desc, _, model = get_setup("dpend")
    a = np.array([0.3, 0.15])
    gold = GoldenDynamics(dataclasses.replace(desc, armature=a))
    model = g.with_armature(model, jnp.asarray(a))
    q, qd, u = jnp.asarray([0.9, -0.4]), jnp.zeros(2), jnp.zeros(2)
    dt = 1e-3

    @jax.jit
    def step(q, qd):
        def deriv(state):
            q_, qd_ = state
            return qd_, fd.forward_dynamics(model, q_, qd_, u)
        k1 = deriv((q, qd))
        k2 = deriv((q + 0.5 * dt * k1[0], qd + 0.5 * dt * k1[1]))
        k3 = deriv((q + 0.5 * dt * k2[0], qd + 0.5 * dt * k2[1]))
        k4 = deriv((q + dt * k3[0], qd + dt * k3[1]))
        return (q + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]),
                qd + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]))

    e0 = gold.energy(np.asarray(q), np.asarray(qd))
    for _ in range(400):
        q, qd = step(q, qd)
    e1 = gold.energy(np.asarray(q), np.asarray(qd))
    assert abs(e1 - e0) < 1e-8 * max(1.0, abs(e0))


def test_native_oracle_with_armature():
    """Fourth opinion: the independent C++ oracle (no shared code with the
    JAX/golden stacks) carries armature through ID, M⁻¹, FD, ∇FD and the
    generalized md ID/FD."""
    from gridcodegenerator_tpu.ops import multidof as md
    from gridcodegenerator_tpu.utils.native import NativeMdOracle, NativeOracle

    desc_a, gold, _ = _armed("barm")
    orc = NativeOracle(desc_a)
    q, qd, u = random_state(desc_a.n, seed=61)
    qdd = np.random.default_rng(8).uniform(-1, 1, desc_a.n)
    np.testing.assert_allclose(orc.rnea(q, qd, qdd),
                               gold.rnea(q, qd, qdd)[0], atol=1e-11)
    np.testing.assert_allclose(orc.minv(q), gold.minv(q, True), atol=1e-11)
    np.testing.assert_allclose(orc.fd(q, qd, u), gold.fd(q, qd, u),
                               atol=1e-10)
    np.testing.assert_allclose(orc.fd_grad(q, qd, u), gold.fd_grad(q, qd, u),
                               atol=1e-9)

    rng = np.random.default_rng(17)
    desc = g.parse_urdf(zoo.ball_arm(damping=0.1))
    a = rng.uniform(0.02, 0.3, desc.n)
    mdm = md.multidof_model_from_description(
        dataclasses.replace(desc, armature=a), dtype=jnp.float64)
    morc = NativeMdOracle(mdm)
    q0 = np.asarray(md.md_tangent_apply(
        mdm, md.neutral_q(mdm), jnp.asarray(rng.uniform(-0.5, 0.5, mdm.nv))))
    qdv, uv, qddv = (rng.uniform(-1, 1, mdm.nv) for _ in range(3))
    np.testing.assert_allclose(
        morc.md_id(q0, qdv, qddv),
        np.asarray(md.md_inverse_dynamics(mdm, jnp.asarray(q0),
                                          jnp.asarray(qdv),
                                          jnp.asarray(qddv))), atol=1e-10)
    np.testing.assert_allclose(
        morc.md_fd(q0, qdv, uv),
        np.asarray(md.md_forward_dynamics(mdm, jnp.asarray(q0),
                                          jnp.asarray(qdv),
                                          jnp.asarray(uv))), atol=1e-10)


def test_zero_armature_is_legacy():
    """armature = 0 reproduces the pre-armature engine bitwise (the D term
    adds an exact floating-point zero)."""
    desc, gold, model = get_setup("iiwa14")
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=55))
    qdd_legacy = fd.forward_dynamics(model, q, qd, u)
    qdd_zero = fd.forward_dynamics(g.with_armature(model, 0.0), q, qd, u)
    assert np.array_equal(np.asarray(qdd_legacy), np.asarray(qdd_zero))


def test_multidof_armature_two_formulations():
    """Multi-dof stack with armature (free-floating iiwa): CRBA+Cholesky FD
    vs the articulated md ABA (independent armature treatments: CRBA
    diagonal vs per-joint k×k D blocks), plus the armature-aware tangent
    ∇FD vs jacfwd on the linear coordinates."""
    from gridcodegenerator_tpu.ops import multidof as md

    desc = g.parse_urdf(zoo.with_free_joint(zoo.iiwa14(damping=0.1)))
    rng = np.random.default_rng(9)
    a = rng.uniform(0.02, 0.4, desc.n)
    a[[i for i, t in enumerate(desc.joint_types) if t == "floating"]] = 0.0
    mdm = md.multidof_model_from_description(
        dataclasses.replace(desc, armature=a), dtype=jnp.float64)
    q0 = md.md_tangent_apply(mdm, md.neutral_q(mdm),
                             jnp.asarray(rng.uniform(-0.5, 0.5, mdm.nv)))
    qd, u = (jnp.asarray(rng.uniform(-1, 1, mdm.nv)) for _ in range(2))

    qdd_chol = md.md_forward_dynamics(mdm, q0, qd, u)
    qdd_aba = md.md_aba(mdm, q0, qd, u)
    np.testing.assert_allclose(np.asarray(qdd_aba), np.asarray(qdd_chol),
                               atol=1e-10)
    # armature actually matters
    mdm0 = md.multidof_model_from_description(desc, dtype=jnp.float64)
    assert abs(np.asarray(md.md_forward_dynamics(mdm0, q0, qd, u))
               - np.asarray(qdd_chol)).max() > 1e-3
    # ID(FD) round trip carries the armature torque a·q̈
    u_rt = md.md_inverse_dynamics(mdm, q0, qd, qdd_chol)
    np.testing.assert_allclose(np.asarray(u_rt), np.asarray(u), atol=1e-10)
    # tangent-space ∇FD: the q̇/u blocks are plain linear coords → jacfwd
    Jq, Jqd, Ju = md.md_forward_dynamics_gradient(mdm, q0, qd, u)
    Jqd_ad = jax.jacfwd(lambda z: md.md_forward_dynamics(mdm, q0, z, u))(qd)
    np.testing.assert_allclose(np.asarray(Jqd), np.asarray(Jqd_ad),
                               atol=1e-10)


@pytest.mark.mid
def test_multidof_fused_armature():
    """The fused md kernels (interpret mode) carry armature through the
    in-kernel CRBA diagonal / D blocks / rotor torque: ID, FD (both
    formulations) vs the vmap md path."""
    from gridcodegenerator_tpu.ops import multidof as md
    from gridcodegenerator_tpu.ops.kernels import multidof_fused as mf

    desc = g.parse_urdf(zoo.ball_arm() if hasattr(zoo, "ball_arm")
                        else zoo.with_free_joint(zoo.iiwa14(damping=0.1)))
    rng = np.random.default_rng(13)
    a = rng.uniform(0.02, 0.3, desc.n)
    a[[i for i, t in enumerate(desc.joint_types)
       if t in ("floating",)]] = 0.0
    mdm = md.multidof_model_from_description(
        dataclasses.replace(desc, armature=a), dtype=jnp.float32)
    B = 4
    q0 = jnp.stack([md.md_tangent_apply(
        mdm, md.neutral_q(mdm),
        jnp.asarray(rng.uniform(-0.5, 0.5, mdm.nv), jnp.float32))
        for _ in range(B)], axis=1)                       # (nq, B)
    qd, u, qdd = (jnp.asarray(rng.uniform(-1, 1, (mdm.nv, B)), jnp.float32)
                  for _ in range(3))

    c_k = np.asarray(mf.md_id_fused(mdm, q0, qd, qdd, interpret=True))
    qdd_k = np.asarray(mf.md_aba_fused(mdm, q0, qd, u, interpret=True))
    for b in range(B):
        c_ref = md.md_inverse_dynamics(mdm, q0[:, b], qd[:, b], qdd[:, b])
        np.testing.assert_allclose(
            c_k[:, b], np.asarray(c_ref),
            atol=5e-4 * max(1, abs(np.asarray(c_ref)).max()))
        q_ref = md.md_forward_dynamics(mdm, q0[:, b], qd[:, b], u[:, b])
        np.testing.assert_allclose(
            qdd_k[:, b], np.asarray(q_ref),
            atol=5e-4 * max(1, abs(np.asarray(q_ref)).max()))
