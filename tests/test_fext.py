"""External forces (``f_ext`` — link-local wrenches, Pinocchio's ``fext``
semantics; no counterpart in the reference, which has no external-force
input).

Validation strategy:
  * ID∘FD round trip with the SAME f_ext recovers u exactly.
  * ABA(f_ext) == M⁻¹-composition FD(f_ext) (two independent recursions).
  * A pure world-frame point force built by ``point_force_fext`` shifts the
    torques by exactly −J_linᵀ f_world (the world point-Jacobian identity).
  * The analytic ∂ID/∇FD with f_ext match jacfwd of the f_ext-aware primal.
  * The custom-VJP FD entry propagates exact gradients to f_ext itself
    (vs plain AD through the unrolled recursions).
  * f_ext=None and f_ext=0 are bitwise identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import get_setup, random_state
from gridcodegenerator_tpu.ops import aba, fd, fd_grad, kinematics, rnea
from gridcodegenerator_tpu.ops import rnea_grad

TOL = 1e-9


def _fext(n, seed=5):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-6.0, 6.0, (n, 6)))


def test_id_fd_roundtrip_with_fext(robot):
    desc, _, model = robot
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=51))
    fe = _fext(desc.n)
    qdd = fd.forward_dynamics(model, q, qd, u, f_ext=fe)
    u_back = rnea.inverse_dynamics(model, q, qd, qdd, f_ext=fe)
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), atol=1e-8)


def test_aba_matches_fd_with_fext(robot):
    desc, _, model = robot
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=52))
    fe = _fext(desc.n, seed=7)
    ref = fd.forward_dynamics(model, q, qd, u, f_ext=fe)
    got = aba.aba(model, q, qd, u, f_ext=fe)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=TOL)


def test_point_force_jacobian_identity(iiwa):
    """c(f_ext from world point force) == c(0) − J_linᵀ f_world."""
    desc, _, model = iiwa
    n = desc.n
    q, qd, _ = map(jnp.asarray, random_state(n, seed=53))
    qdd = jnp.asarray(np.random.default_rng(3).uniform(-2, 2, n))
    link, off = n - 1, jnp.asarray([0.05, -0.02, 0.11])
    f_w = jnp.asarray([3.0, -7.0, 4.5])
    fe = kinematics.point_force_fext(model, q, link, off, f_w)
    c0 = rnea.inverse_dynamics(model, q, qd, qdd)
    c1 = rnea.inverse_dynamics(model, q, qd, qdd, f_ext=fe)
    J = kinematics.world_jacobian(model, q, link, off)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0 - J[3:].T @ f_w),
                               atol=1e-9)


def test_point_force_with_moment(iiwa):
    """A world moment enters through the J_ang rows."""
    desc, _, model = iiwa
    n = desc.n
    q, qd, _ = map(jnp.asarray, random_state(n, seed=54))
    link, off = 3, jnp.asarray([0.0, 0.0, 0.0])
    m_w = jnp.asarray([1.5, -0.5, 2.0])
    fe = kinematics.point_force_fext(model, q, link, off,
                                     jnp.zeros(3), moment_world=m_w)
    c0 = rnea.inverse_dynamics(model, q, qd, None)
    c1 = rnea.inverse_dynamics(model, q, qd, None, f_ext=fe)
    J = kinematics.world_jacobian(model, q, link, off)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0 - J[:3].T @ m_w),
                               atol=1e-9)


def test_id_grad_analytic_vs_ad_with_fext(grad_robot):
    desc, _, model = grad_robot
    n = desc.n
    q, qd, u = map(jnp.asarray, random_state(n, seed=55))
    qdd = jnp.asarray(np.random.default_rng(9).uniform(-2, 2, n))
    fe = _fext(n, seed=11)
    got = rnea_grad.inverse_dynamics_gradient(model, q, qd, qdd, f_ext=fe)
    jq = jax.jacfwd(lambda x: rnea.inverse_dynamics(model, x, qd, qdd,
                                                    f_ext=fe))(q)
    jqd = jax.jacfwd(lambda x: rnea.inverse_dynamics(model, q, x, qdd,
                                                     f_ext=fe))(qd)
    np.testing.assert_allclose(np.asarray(got[:, :n]), np.asarray(jq),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(got[:, n:]), np.asarray(jqd),
                               atol=1e-8)


def test_fd_grad_analytic_vs_ad_with_fext(grad_robot):
    desc, _, model = grad_robot
    n = desc.n
    q, qd, u = map(jnp.asarray, random_state(n, seed=56))
    fe = _fext(n, seed=13)
    got = fd_grad.forward_dynamics_gradient(model, q, qd, u, f_ext=fe)
    jq = jax.jacfwd(lambda x: fd.forward_dynamics(model, x, qd, u,
                                                  f_ext=fe))(q)
    jqd = jax.jacfwd(lambda x: fd.forward_dynamics(model, q, x, u,
                                                   f_ext=fe))(qd)
    np.testing.assert_allclose(np.asarray(got[:, :n]), np.asarray(jq),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(got[:, n:]), np.asarray(jqd),
                               atol=1e-8)


def test_fd_diff_vjp_to_fext(iiwa):
    """The custom-VJP FD entry: exact cotangents into f_ext (and into
    q/q̇/u in the presence of f_ext) vs plain AD."""
    desc, _, model = iiwa
    n = desc.n
    q, qd, u = map(jnp.asarray, random_state(n, seed=57))
    fe = _fext(n, seed=17)
    w = jnp.asarray(np.random.default_rng(19).uniform(-1, 1, n))

    loss_diff = lambda q, qd, u, fe: jnp.dot(
        w, fd.forward_dynamics_diff(model, q, qd, u, f_ext=fe))
    loss_plain = lambda q, qd, u, fe: jnp.dot(
        w, fd.forward_dynamics(model, q, qd, u, f_ext=fe))
    g1 = jax.grad(loss_diff, argnums=(0, 1, 2, 3))(q, qd, u, fe)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(q, qd, u, fe)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)


def test_zero_fext_identity(iiwa):
    desc, _, model = iiwa
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=58))
    z = jnp.zeros((desc.n, 6))
    a = fd.forward_dynamics(model, q, qd, u)
    b = fd.forward_dynamics(model, q, qd, u, f_ext=z)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_api_batched_fext(iiwa):
    """api entries: batched f_ext through the vmap tier == per-state."""
    import gridcodegenerator_tpu as g
    desc, _, model = iiwa
    n = desc.n
    B = 4
    q, qd, u = map(jnp.asarray, random_state(n, seed=59, batch=(B,)))
    fe = jnp.asarray(np.random.default_rng(23).uniform(-5, 5, (B, n, 6)))
    got = g.forward_dynamics(model, q, qd, u, f_ext=fe)
    for b in range(B):
        ref = fd.forward_dynamics(model, q[b], qd[b], u[b], f_ext=fe[b])
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(ref),
                                   atol=1e-9)
    gfd = g.forward_dynamics_gradient(model, q, qd, u, f_ext=fe)
    ref0 = fd_grad.forward_dynamics_gradient(model, q[0], qd[0], u[0],
                                             f_ext=fe[0])
    np.testing.assert_allclose(np.asarray(gfd[0]), np.asarray(ref0),
                               atol=1e-9)
    gid = g.inverse_dynamics(model, q, qd, u, f_ext=fe)
    refi = rnea.inverse_dynamics(model, q[0], qd[0], u[0], f_ext=fe[0])
    np.testing.assert_allclose(np.asarray(gid[0]), np.asarray(refi),
                               atol=1e-9)


def test_fb_aba_fext_roundtrip():
    """Floating-base ABA with arm + base external wrenches: round trip
    against the free-flyer inverse dynamics (independent formulation)."""
    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import freeflyer as ff

    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.15)),
                              dtype=jnp.float64)
    n = ffm.n
    rng = np.random.default_rng(61)
    quat = jnp.asarray(rng.normal(size=4))
    quat = quat / jnp.linalg.norm(quat)
    q = jnp.asarray(rng.uniform(-1, 1, n))
    vb = jnp.asarray(rng.uniform(-0.5, 0.5, 6))
    qd = jnp.asarray(rng.uniform(-1, 1, n))
    tau = jnp.asarray(rng.uniform(-5, 5, n))
    fe = jnp.asarray(rng.uniform(-4, 4, (n, 6)))
    fb = jnp.asarray(rng.uniform(-10, 10, 6))

    ab, qdd = aba.fb_aba(ffm, quat, q, vb, qd, tau, f_ext=fe, f_base=fb)
    # Identity: the engine's fb FD convention is
    #   M [v̇b; q̈] = [−p_b + τ_ext_b; τ − c_j + τ_ext_q]
    # (fb_forward_dynamics assembly) with τ_ext the generalized projection
    # of the external wrenches — computed here INDEPENDENTLY via AD of the
    # instantaneous power P(vb, q̇) = ⟨f_base, vb⟩ + Σ ⟨f_ext_i, v_i⟩.
    X = ffm.arm.joint_transforms(q)
    R = ff.quat_to_rot(quat)
    M = ff.fb_mass_matrix(ffm, X)
    p_b, c_j = ff.fb_bias(ffm, X, R, vb, qd)
    lhs = M @ jnp.concatenate([ab, qdd]) + jnp.concatenate([p_b, c_j])

    def vel_power(vb_, qd_):
        from gridcodegenerator_tpu.ops.spatial import xform_apply
        arm = ffm.arm
        topo = arm.topology
        v = [None] * n
        P = jnp.dot(fb, vb_)
        for i in range(n):
            p = topo.parents[i]
            vp = vb_ if p < 0 else v[p]
            v[i] = xform_apply(X[i], vp) + arm.S[i] * qd_[i]
            P = P + jnp.dot(fe[i], v[i])
        return P

    tau_ext_b = jax.grad(vel_power, argnums=0)(vb, qd)
    tau_ext_q = jax.grad(vel_power, argnums=1)(vb, qd)
    rhs = jnp.concatenate([tau_ext_b, tau + tau_ext_q])
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-8)
