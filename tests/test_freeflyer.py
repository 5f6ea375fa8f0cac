"""Quaternion free-flyer dynamics (ops/freeflyer.py).

Validation strategy:
1. exact cross-check against the Euler-chain emulation
   (``zoo.with_floating_base``) away from its pitch=±π/2 singularity — the
   two are independent formulations of the same physics, and the base-twist
   derivative mapping is obtained rigorously with ``jax.jvp``;
2. physics invariants *through* the Euler singularity (where the chain
   emulation cannot go): energy conservation while tumbling, world-frame
   momentum conservation at zero gravity, ballistic linear momentum under
   gravity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from conftest import random_state
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.models.urdf import rpy_to_matrix
from gridcodegenerator_tpu.ops import freeflyer as ff
from gridcodegenerator_tpu.ops.rnea import rnea_fwd


@pytest.fixture(scope="module", params=["iiwa14", "hyq"])
def setups(request):
    urdf = {"iiwa14": zoo.iiwa14(damping=0.1),
            "hyq": zoo.hyq(damping=0.2)}[request.param]
    desc = g.parse_urdf(urdf)
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    euler = g.robot_model_from_description(
        g.parse_urdf(zoo.with_floating_base(urdf)), dtype=jnp.float64)
    return desc, ffm, euler


def _euler_state_to_fb(euler_model, q_full, qd_full):
    """Map an Euler-chain state to (quat, pos, vb): the base twist comes from
    the chain's own velocity recursion (joint 5's child IS the base link), so
    the mapping is exact by construction."""
    X = euler_model.joint_transforms(q_full)
    v, _, _ = rnea_fwd(euler_model, X, qd_full, None, 0.0)
    vb = v[5]
    R = jnp.asarray(rpy_to_matrix([q_full[5], q_full[4], q_full[3]]))
    quat = ff.rot_to_quat(R)
    pos = q_full[:3]
    return quat, pos, vb


def test_fb_matches_euler_chain(setups):
    """FD agreement: joint accelerations identical; base twist derivative
    identical via jvp of the exact state mapping."""
    desc, ffm, euler = setups
    n = desc.n
    rng = np.random.default_rng(5)
    q_full = jnp.asarray(np.concatenate([
        rng.uniform(-1, 1, 3),            # base position
        rng.uniform(-0.9, 0.9, 3),        # yaw/pitch/roll, away from ±π/2
        rng.uniform(-1.5, 1.5, n)]))
    qd_full = jnp.asarray(rng.uniform(-1, 1, 6 + n))
    tau = jnp.asarray(rng.uniform(-5, 5, n))
    tau_full = jnp.concatenate([jnp.zeros(6), tau])

    qdd_full = g.forward_dynamics(euler, q_full, qd_full, tau_full)

    quat, pos, vb = _euler_state_to_fb(euler, q_full, qd_full)
    dvb, qdd = ff.fb_forward_dynamics(ffm, quat, q_full[6:], vb,
                                      qd_full[6:], tau)
    np.testing.assert_allclose(np.asarray(qdd), np.asarray(qdd_full[6:]),
                               rtol=0, atol=1e-8)

    # v̇b from the chain: jvp of (q,q̇) ↦ v_base along (q̇, q̈)
    def base_twist(qf, qdf):
        X = euler.joint_transforms(qf)
        v, _, _ = rnea_fwd(euler, X, qdf, None, 0.0)
        return v[5]

    _, dvb_chain = jax.jvp(base_twist, (q_full, qd_full),
                           (qd_full, qdd_full))
    np.testing.assert_allclose(np.asarray(dvb), np.asarray(dvb_chain),
                               rtol=0, atol=1e-8)


def test_fb_id_fd_roundtrip(setups):
    desc, ffm, _ = setups
    n = desc.n
    rng = np.random.default_rng(7)
    quat = ff.rot_to_quat(jnp.asarray(rpy_to_matrix(rng.uniform(-0.8, 0.8, 3))))
    q = jnp.asarray(rng.uniform(-1.5, 1.5, n))
    vb = jnp.asarray(rng.uniform(-1, 1, 6))
    qd = jnp.asarray(rng.uniform(-1, 1, n))
    tau = jnp.asarray(rng.uniform(-5, 5, n))
    dvb, qdd = ff.fb_forward_dynamics(ffm, quat, q, vb, qd, tau)
    tau_rt, base_resid = ff.fb_inverse_dynamics(ffm, quat, q, vb, qd, dvb, qdd)
    np.testing.assert_allclose(np.asarray(tau_rt), np.asarray(tau), atol=1e-8)
    np.testing.assert_allclose(np.asarray(base_resid), 0.0, atol=1e-8)


def _momentum_world(ffm, quat, pos, q, vb, qd):
    """Total spatial momentum about the world origin, world coordinates."""
    X = ffm.arm.joint_transforms(q)
    M = ff.fb_mass_matrix(ffm, X)
    h_b = M[:6, :] @ jnp.concatenate([vb, qd])  # about base origin, base coords
    R = ff.quat_to_rot(quat)
    ang = R @ h_b[:3]
    lin = R @ h_b[3:]
    return jnp.concatenate([ang + jnp.cross(pos, lin), lin])


def test_tumbling_invariants_through_singularity():
    """Zero torque, tumbling fast through pitch=π/2 (forbidden territory for
    the Euler chain): energy conserved; at gravity=0 momentum conserved; at
    gravity=−9.81 linear momentum follows m·g·t exactly."""
    desc = g.parse_urdf(zoo.iiwa14(damping=0.0))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    n = desc.n
    rng = np.random.default_rng(3)
    state0 = (jnp.asarray([1.0, 0, 0, 0]),
              jnp.zeros(3),
              jnp.asarray(rng.uniform(-1, 1, n)),
              jnp.asarray([2.5, 1.5, 0.7, 0.3, -0.2, 0.5]),  # fast tumble
              jnp.asarray(rng.uniform(-0.5, 0.5, n)))
    T, dt = 2500, 1e-3  # 2.5 s at ‖ω‖≈3 rad/s → attitude sweeps ≈7 rad (RK4)
    taus = jnp.zeros((T, n))

    # ---- gravity = 0: energy and full spatial momentum conserved ----------
    sim0 = jax.jit(lambda s: ff.fb_simulate(ffm, s, taus, dt, gravity=0.0, integrator="rk4"))
    _, traj = sim0(state0)
    E = jax.vmap(lambda qt, p, q, vb, qd: ff.fb_energy(
        ffm, qt, p, q, vb, qd, gravity=0.0))(*traj)
    E = np.asarray(E)
    assert abs(E[-1] - E[0]) / abs(E[0]) < 1e-6, (E[0], E[-1])
    h = jax.vmap(lambda qt, p, q, vb, qd: _momentum_world(
        ffm, qt, p, q, vb, qd))(*traj)
    h = np.asarray(h)
    assert np.abs(h[-1] - h[0]).max() / max(1.0, np.abs(h[0]).max()) < 1e-7
    # pitch really crossed π/2: the rotation's (2,2) element changes sign
    R_traj = jax.vmap(ff.quat_to_rot)(traj[0])
    assert float(jnp.min(R_traj[:, 2, 2])) < -0.2
    # quaternion stays unit
    norms = np.asarray(jnp.linalg.norm(traj[0], axis=1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)

    # ---- gravity on: energy conserved, ballistic linear momentum ----------
    simg = jax.jit(lambda s: ff.fb_simulate(ffm, s, taus, dt, gravity=-9.81, integrator="rk4"))
    _, trajg = simg(state0)
    Eg = np.asarray(jax.vmap(lambda qt, p, q, vb, qd: ff.fb_energy(
        ffm, qt, p, q, vb, qd, gravity=-9.81))(*trajg))
    assert abs(Eg[-1] - Eg[0]) / max(1.0, abs(Eg[0])) < 1e-6
    hg = np.asarray(jax.vmap(lambda qt, p, q, vb, qd: _momentum_world(
        ffm, qt, p, q, vb, qd))(*trajg))
    m_tot = float(ffm.I_base[5, 5] + sum(ffm.arm.inertia[i][5, 5]
                                         for i in range(n)))
    t = np.arange(1, T + 1) * dt
    expect_z = hg[0, 5] - 9.81 * m_tot * (t - dt)  # RK4 integrates the linear ODE exactly
    # linear momentum: x,y constant, z follows m·g·t (semi-implicit offset ≤1 step)
    assert np.abs(hg[:, 3] - hg[0, 3]).max() < 1e-6 * max(1, abs(hg[0, 3]))
    assert np.abs(hg[:, 4] - hg[0, 4]).max() < 1e-6 * max(1, abs(hg[0, 4]))
    np.testing.assert_allclose(hg[:, 5], expect_z, atol=1e-6 * 9.81 * m_tot)


def test_fb_batched_jit(setups):
    """vmap/jit lifting of the free-flyer FD (the production entry shape)."""
    desc, ffm, _ = setups
    n = desc.n
    B = 8
    rng = np.random.default_rng(11)
    quat = jnp.asarray(rng.normal(size=(B, 4)))
    quat = quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
    q, qd, tau = (jnp.asarray(x) for x in random_state(n, seed=2, batch=(B,)))
    vb = jnp.asarray(rng.uniform(-1, 1, (B, 6)))
    f = jax.jit(jax.vmap(
        lambda qt, qq, vv, dd, tt: ff.fb_forward_dynamics(ffm, qt, qq, vv, dd, tt)))
    dvb, qdd = f(quat, q, vb, qd, tau)
    assert dvb.shape == (B, 6) and qdd.shape == (B, n)
    assert bool(jnp.all(jnp.isfinite(dvb))) and bool(jnp.all(jnp.isfinite(qdd)))


def test_fb_gradient_vs_finite_differences():
    """Tangent-space free-flyer FD Jacobians vs central finite differences
    (including the manifold attitude derivative)."""
    desc = g.parse_urdf(zoo.iiwa14(damping=0.1))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    n = desc.n
    rng = np.random.default_rng(13)
    quat = ff.rot_to_quat(jnp.asarray(rpy_to_matrix(rng.uniform(-0.7, 0.7, 3))))
    q = jnp.asarray(rng.uniform(-1.2, 1.2, n))
    vb = jnp.asarray(rng.uniform(-1, 1, 6))
    qd = jnp.asarray(rng.uniform(-1, 1, n))
    tau = jnp.asarray(rng.uniform(-4, 4, n))

    J = ff.fb_forward_dynamics_gradient(ffm, quat, q, vb, qd, tau)
    assert J["dphi"].shape == (6 + n, 3) and J["dq"].shape == (6 + n, n)

    def out(quat_, q_, vb_, qd_, tau_):
        dvb, qdd = ff.fb_forward_dynamics(ffm, quat_, q_, vb_, qd_, tau_)
        return np.concatenate([np.asarray(dvb), np.asarray(qdd)])

    eps = 1e-6
    # attitude tangent columns
    for k in range(3):
        dphi = np.zeros(3); dphi[k] = eps
        qp = ff.quat_mul(quat, ff.quat_exp_body(jnp.asarray(dphi)))
        qm = ff.quat_mul(quat, ff.quat_exp_body(jnp.asarray(-dphi)))
        fd_col = (out(qp, q, vb, qd, tau) - out(qm, q, vb, qd, tau)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J["dphi"][:, k]), fd_col,
                                   rtol=2e-5, atol=2e-5)
    # a couple of q / vb columns
    for name, base, key in (("q", q, "dq"), ("vb", vb, "dvb")):
        arr = np.asarray(base)
        for k in (0, arr.shape[0] - 1):
            d = np.zeros_like(arr); d[k] = eps
            args_p = dict(quat_=quat, q_=q, vb_=vb, qd_=qd, tau_=tau)
            args_m = dict(args_p)
            args_p[f"{name}_"] = jnp.asarray(arr + d)
            args_m[f"{name}_"] = jnp.asarray(arr - d)
            fd_col = (out(**args_p) - out(**args_m)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J[key][:, k]), fd_col,
                                       rtol=2e-5, atol=2e-5)


def test_fb_grad_analytic_vs_jacfwd():
    """The analytic free-flyer ∇FD (fb_id_grad + Carpentier-Mansard + exact
    attitude block) must equal forward-mode AD to f64 round-off, including
    the structural zeros ∂q̈/∂δφ = 0 (uniform gravity induces no internal
    motion of a free-floating system)."""
    desc = g.parse_urdf(zoo.iiwa14(damping=0.1))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    n = desc.n
    rng = np.random.default_rng(29)
    quat = ff.rot_to_quat(jnp.asarray(rpy_to_matrix(rng.uniform(-0.9, 0.9, 3))))
    q = jnp.asarray(rng.uniform(-1.2, 1.2, n))
    vb = jnp.asarray(rng.uniform(-1, 1, 6))
    qd = jnp.asarray(rng.uniform(-1, 1, n))
    tau = jnp.asarray(rng.uniform(-4, 4, n))

    Ja = ff.fb_forward_dynamics_gradient(ffm, quat, q, vb, qd, tau,
                                         method="analytic")
    Jj = ff.fb_forward_dynamics_gradient(ffm, quat, q, vb, qd, tau,
                                         method="jacfwd")
    for key in ("dphi", "dq", "dvb", "dqd", "dtau"):
        np.testing.assert_allclose(np.asarray(Ja[key]), np.asarray(Jj[key]),
                                   atol=1e-9, err_msg=key)
    # the closed-form attitude structure
    np.testing.assert_allclose(np.asarray(Ja["dphi"][6:]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Ja["dphi"][:3]), 0.0, atol=1e-12)


def test_fb_grad_analytic_branched():
    """Analytic vs jacfwd on a branched floating-base robot (HyQ)."""
    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    n = desc.n
    rng = np.random.default_rng(41)
    quat = ff.rot_to_quat(jnp.asarray(rpy_to_matrix(rng.uniform(-0.5, 0.5, 3))))
    q = jnp.asarray(rng.uniform(-0.8, 0.8, n))
    vb = jnp.asarray(rng.uniform(-1, 1, 6))
    qd = jnp.asarray(rng.uniform(-1, 1, n))
    tau = jnp.asarray(rng.uniform(-3, 3, n))
    Ja = ff.fb_forward_dynamics_gradient(ffm, quat, q, vb, qd, tau,
                                         method="analytic")
    Jj = ff.fb_forward_dynamics_gradient(ffm, quat, q, vb, qd, tau,
                                         method="jacfwd")
    for key in ("dphi", "dq", "dvb", "dqd", "dtau"):
        np.testing.assert_allclose(np.asarray(Ja[key]), np.asarray(Jj[key]),
                                   atol=1e-9, err_msg=key)
