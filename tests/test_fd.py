"""Forward dynamics: parity, ID∘FD round trip, physics (energy conservation,
analytic double pendulum)."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import get_setup, random_state
from gridcodegenerator_tpu.ops import fd, rnea

TOL = 1e-9


def test_fd_parity(robot):
    desc, gold, model = robot
    q, qd, u = random_state(desc.n, seed=21)
    got = np.asarray(fd.forward_dynamics(model, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u)))
    np.testing.assert_allclose(got, gold.fd(q, qd, u), atol=TOL)


def test_fd_id_roundtrip(robot):
    """ID(q, q̇, FD(q, q̇, u)) == u — couples RNEA and M⁻¹ end-to-end."""
    desc, gold, model = robot
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=22))
    qdd = fd.forward_dynamics(model, q, qd, u)
    u_back = rnea.inverse_dynamics(model, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), atol=1e-8)


def test_energy_conservation_double_pendulum():
    """RK4 rollout of the undamped double pendulum conserves energy — a
    physics check fully independent of the reference algorithms."""
    desc, gold, model = get_setup("dpend")
    q = jnp.asarray([0.9, -0.4])
    qd = jnp.asarray([0.0, 0.0])
    u = jnp.zeros(2)
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


def test_double_pendulum_analytic():
    """Closed-form Lagrangian dynamics of the planar double pendulum
    (point masses, lengths/masses = 1) vs the framework."""
    desc, gold, model = get_setup("dpend")
    g_ = 9.81
    q = np.array([0.7, -0.3])
    qd = np.array([0.4, 1.1])
    q1, q2 = q
    # analytic mass matrix (rotation about +y, rods along −z)
    m1 = m2 = l1 = l2 = 1.0
    M = np.array([
        [m1 * l1**2 + m2 * (l1**2 + l2**2 + 2 * l1 * l2 * np.cos(q2)),
         m2 * (l2**2 + l1 * l2 * np.cos(q2))],
        [m2 * (l2**2 + l1 * l2 * np.cos(q2)), m2 * l2**2],
    ])
    np.testing.assert_allclose(gold.crba(q), M, atol=1e-12)
    # analytic gravity torque: PE = −(m1+m2) g l1 cos q1 − m2 g l2 cos(q1+q2)
    g_torque = np.array([
        (m1 + m2) * g_ * l1 * np.sin(q1) + m2 * g_ * l2 * np.sin(q1 + q2),
        m2 * g_ * l2 * np.sin(q1 + q2),
    ])
    c_gravity = np.asarray(rnea.inverse_dynamics(
        model, jnp.asarray(q), jnp.zeros(2), jnp.zeros(2)))
    np.testing.assert_allclose(c_gravity, g_torque, atol=1e-10)
    # full bias (Coriolis) term from the Lagrangian
    h = -m2 * l1 * l2 * np.sin(q2)
    coriolis = np.array([
        h * (2 * q[0] * 0 + 2 * qd[0] * qd[1] + qd[1] ** 2),
        -h * qd[0] ** 2,
    ])
    c_full = np.asarray(rnea.inverse_dynamics(
        model, jnp.asarray(q), jnp.asarray(qd), jnp.zeros(2)))
    np.testing.assert_allclose(c_full, coriolis + g_torque, atol=1e-10)
