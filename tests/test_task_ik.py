"""Operational-space control (``ops/task.py``) and inverse kinematics
(``ops/ik.py``): closed-loop exactness of the OSC torque through the engine's
own forward dynamics, nullspace consistency, and IK convergence to FK-derived
targets (so the target is guaranteed reachable).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.ops import ik as ikm
from gridcodegenerator_tpu.ops import kinematics as kin
from gridcodegenerator_tpu.ops import task as tk

from conftest import get_setup, random_state

EE = {"iiwa14": 6, "barm": 4, "chain5p": 4}   # end-effector link per robot
OFF = (0.05, -0.02, 0.11)


@pytest.mark.parametrize("name,rows", [
    ("iiwa14", "pos"), ("barm", "pos"), ("chain5p", "pos"),
    # the 6-dof task needs ≥6 supporting joints at the task link for Λ to
    # exist — only the 7-dof arm qualifies (chain5p has n=5; barm's link 4
    # has a 5-joint support set)
    ("iiwa14", "full"),
])
def test_osc_achieves_task_acceleration(name, rows):
    """τ = osc_torque(...) fed through the engine's FD must reproduce the
    commanded task acceleration exactly: ẍ = J·q̈ + J̇q̇ = a_des."""
    desc, _, model = get_setup(name)
    link = EE[name]
    m = 3 if rows == "pos" else 6
    q, qd, u0 = (jnp.asarray(a) for a in random_state(desc.n, seed=5))
    a_des = jnp.asarray(np.random.default_rng(9).normal(size=m))

    tau = tk.osc_torque(model, q, qd, u0, a_des, link, OFF, rows=rows)
    qdd = g.forward_dynamics(model, q, qd, tau, impl="vmap")
    J = tk.task_jacobian(model, q, link, OFF, rows)
    jdqd = tk.task_bias_acceleration(model, q, qd, link, OFF, rows)
    np.testing.assert_allclose(np.asarray(J @ qdd + jdqd),
                               np.asarray(a_des), atol=1e-8)


def test_osc_nullspace_does_not_disturb_task():
    """Any posture torque filtered through Nᵀ leaves the task acceleration
    unchanged (J M⁻¹ Nᵀ = 0), and N is idempotent."""
    desc, _, model = get_setup("iiwa14")
    link, n = EE["iiwa14"], desc.n
    q, qd, _ = (jnp.asarray(a) for a in random_state(n, seed=11))
    a_des = jnp.asarray([0.3, -0.5, 0.2])

    rng = np.random.default_rng(3)
    accs = []
    for k in range(3):
        u0 = jnp.asarray(rng.normal(size=n) * 5.0)
        tau = tk.osc_torque(model, q, qd, u0, a_des, link, OFF)
        qdd = g.forward_dynamics(model, q, qd, tau, impl="vmap")
        J = tk.task_jacobian(model, q, link, OFF)
        jdqd = tk.task_bias_acceleration(model, q, qd, link, OFF)
        accs.append(np.asarray(J @ qdd + jdqd))
    for a in accs[1:]:
        np.testing.assert_allclose(a, accs[0], atol=1e-8)

    Jbar, N = tk.dynamically_consistent_pinv(model, q, link, OFF)
    np.testing.assert_allclose(np.asarray(N @ N), np.asarray(N), atol=1e-10)
    lam, J, Minv = tk.task_space_inertia(model, q, link, OFF)
    np.testing.assert_allclose(np.asarray(J @ Minv @ N.T),
                               np.zeros((3, desc.n)), atol=1e-10)
    # Λ symmetric positive definite away from singularities
    lam_np = np.asarray(lam)
    np.testing.assert_allclose(lam_np, lam_np.T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(lam_np) > 0)


def test_osc_batched_matches_single():
    desc, _, model = get_setup("iiwa14")
    link, n = EE["iiwa14"], desc.n
    q, qd, u0 = (jnp.asarray(a) for a in random_state(n, seed=4, batch=(6,)))
    a_des = jnp.asarray(np.random.default_rng(1).normal(size=(6, 3)))
    batched = tk.osc_torque_batched(model, q, qd, u0, a_des, link, OFF)
    for b in range(6):
        single = tk.osc_torque(model, q[b], qd[b], u0[b], a_des[b], link,
                               jnp.asarray(OFF))
        np.testing.assert_allclose(np.asarray(batched[b]),
                                   np.asarray(single), atol=1e-12)


def test_rotation_log_roundtrip():
    """log ∘ exp = id over a sweep of angles including the small-angle
    branch."""
    rng = np.random.default_rng(7)
    for theta in [1e-9, 1e-5, 0.3, 1.5, 2.9]:
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        w = theta * axis
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = (np.eye(3) + np.sin(theta) * K / theta
             + (1 - np.cos(theta)) * (K @ K) / theta**2) if theta > 1e-7 \
            else np.eye(3) + K
        got = np.asarray(ikm.rotation_log(jnp.asarray(R)))
        np.testing.assert_allclose(got, w, atol=1e-6 + 1e-6 * theta)


@pytest.mark.parametrize("name", ["iiwa14", "barm"])
def test_ik_point_converges_to_reachable_target(name):
    desc, _, model = get_setup(name)
    link = EE[name]
    q_true, _, _ = (jnp.asarray(a) for a in random_state(desc.n, seed=21))
    q_true = 0.4 * q_true                       # stay well-conditioned
    target = kin.point_position(model, q_true, link, jnp.asarray(OFF))
    q0 = q_true + 0.3 * jnp.asarray(
        np.random.default_rng(2).normal(size=desc.n))
    q_sol, err = ikm.ik_point(model, q0, target, link, OFF, iters=128,
                              damping=1e-6)
    assert float(err) < 1e-9
    x = kin.point_position(model, q_sol, link, jnp.asarray(OFF))
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-9)


def test_ik_frame_converges_to_reachable_pose():
    desc, _, model = get_setup("iiwa14")
    link = EE["iiwa14"]
    q_true, _, _ = (jnp.asarray(a) for a in random_state(desc.n, seed=31))
    q_true = 0.4 * q_true
    R, p = kin.fk(model, q_true)
    R_t, p_t = R[link], p[link] + R[link] @ jnp.asarray(OFF)
    q0 = q_true + 0.2 * jnp.asarray(
        np.random.default_rng(8).normal(size=desc.n))
    q_sol, err = ikm.ik_frame(model, q0, R_t, p_t, link, OFF, iters=160,
                              damping=1e-6)
    assert float(err) < 1e-8
    R2, p2 = kin.fk(model, q_sol)
    np.testing.assert_allclose(np.asarray(R2[link]), np.asarray(R_t),
                               atol=1e-8)


def test_ik_point_batched_and_limits():
    """Batched solve matches per-state solves; a limits box is respected."""
    desc, _, model = get_setup("iiwa14")
    link, n = EE["iiwa14"], desc.n
    rng = np.random.default_rng(17)
    q_true = jnp.asarray(0.4 * rng.uniform(-2, 2, size=(5, n)))
    targets = jax.vmap(
        lambda q_: kin.point_position(model, q_, link, jnp.asarray(OFF)))(
        q_true)
    q0 = q_true + 0.25 * jnp.asarray(rng.normal(size=(5, n)))
    q_sol, err = ikm.ik_point_batched(model, q0, targets, link, OFF,
                                      iters=128, damping=1e-6)
    assert q_sol.shape == (5, n) and err.shape == (5,)
    assert float(jnp.max(err)) < 1e-9
    for b in range(5):
        qs, es = ikm.ik_point(model, q0[b], targets[b], link, OFF,
                              iters=128, damping=1e-6)
        np.testing.assert_allclose(np.asarray(q_sol[b]), np.asarray(qs),
                                   atol=1e-12)

    lo, hi = -0.5 * jnp.ones(n), 0.5 * jnp.ones(n)
    q_lim, _ = ikm.ik_point_batched(model, q0, targets, link, OFF,
                                    iters=32, limits=(lo, hi))
    assert float(jnp.max(jnp.abs(q_lim))) <= 0.5 + 1e-12


def test_ik_differentiable():
    """The solve differentiates: ∂q*/∂target through the unrolled iteration
    agrees with a finite difference of the converged solution."""
    desc, _, model = get_setup("iiwa14")
    link, n = EE["iiwa14"], desc.n
    q_true = 0.3 * jnp.asarray(np.random.default_rng(5).uniform(-2, 2, n))
    target = kin.point_position(model, q_true, link, jnp.asarray(OFF))
    q0 = q_true + 0.1

    def solve(t):
        return ikm.ik_point(model, q0, t, link, OFF, iters=96,
                            damping=1e-6)[0]

    Jt = jax.jacrev(solve)(target)              # (n, 3)
    eps = 1e-6
    for k in range(3):
        dt = jnp.zeros(3).at[k].set(eps)
        fd = (solve(target + dt) - solve(target - dt)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Jt[:, k]), np.asarray(fd),
                                   atol=1e-4)
