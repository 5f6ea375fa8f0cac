"""Inertial-parameter regressor (``ops/regressor.py``): exactness of
τ = Y(q, q̇, q̈)·θ, inertia-independence of Y, and a least-squares
identification round trip."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from conftest import random_state
from gridcodegenerator_tpu.ops import regressor as rg
import gridcodegenerator_tpu as g

TOL = 1e-10


def test_regressor_reproduces_rnea(robot):
    desc, _, model = robot
    q, qd, qdd = map(jnp.asarray, random_state(desc.n, seed=71))
    Y = rg.joint_torque_regressor(model, q, qd, qdd, with_damping=True)
    theta = jnp.concatenate([rg.inertial_params(model), model.damping])
    tau = g.inverse_dynamics(model, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(Y @ theta), np.asarray(tau),
                               atol=TOL)


def test_regressor_is_inertia_free(iiwa):
    """Y depends on the kinematic constants only: scaling every inertia
    changes τ but not Y, and Y·θ(scaled) tracks the scaled torques."""
    desc, _, model = iiwa
    q, qd, qdd = map(jnp.asarray, random_state(desc.n, seed=72))
    Y = rg.joint_torque_regressor(model, q, qd, qdd)
    m2 = dataclasses.replace(model, inertia=model.inertia * 2.5)
    Y2 = rg.joint_torque_regressor(m2, q, qd, qdd)
    np.testing.assert_array_equal(np.asarray(Y), np.asarray(Y2))
    tau2 = g.inverse_dynamics(m2, q, qd, qdd) - m2.damping * qd
    np.testing.assert_allclose(np.asarray(Y @ rg.inertial_params(m2)),
                               np.asarray(tau2), atol=TOL)


def test_least_squares_identification(iiwa):
    """The system-ID workflow: stack Y over K states, least-squares for θ̂
    from measured torques, predict held-out torques exactly (θ̂ may differ
    from θ in unidentifiable directions; predictions cannot)."""
    desc, _, model = iiwa
    n = desc.n
    K = 60
    q, qd, qdd = (jnp.asarray(a)
                  for a in random_state(n, seed=73, batch=(K + 10,)))
    Ys = jnp.stack([rg.joint_torque_regressor(
        model, q[k], qd[k], qdd[k], with_damping=True) for k in range(K)])
    taus = jnp.stack([g.inverse_dynamics(model, q[k], qd[k], qdd[k])
                      for k in range(K)])
    A = Ys.reshape(K * n, -1)
    b = taus.reshape(K * n)
    theta_hat, *_ = jnp.linalg.lstsq(A, b)
    for k in range(K, K + 10):
        Yk = rg.joint_torque_regressor(model, q[k], qd[k], qdd[k],
                                       with_damping=True)
        tau_k = g.inverse_dynamics(model, q[k], qd[k], qdd[k])
        np.testing.assert_allclose(np.asarray(Yk @ theta_hat),
                                   np.asarray(tau_k), atol=1e-7)


def test_regressor_armature_block(iiwa):
    """with_armature: τ of an armature-bearing model is exactly
    Y·[θ_inertial; damping; armature], and the armature itself is
    recovered from torque logs by least squares (diag(q̈) columns are
    identifiable given exciting accelerations)."""
    desc, _, model = iiwa
    rng = np.random.default_rng(73)
    a_true = rng.uniform(0.05, 0.4, desc.n)
    ma = g.with_armature(model, jnp.asarray(a_true))
    q, qd, qdd = map(jnp.asarray, random_state(desc.n, seed=74))
    Y = rg.joint_torque_regressor(ma, q, qd, qdd, with_damping=True,
                                  with_armature=True)
    theta = jnp.concatenate([rg.inertial_params(ma), ma.damping,
                             ma.armature])
    tau = g.inverse_dynamics(ma, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(Y @ theta), np.asarray(tau),
                               atol=TOL)

    # identification: stack K states, lstsq, read back the armature block
    rows, rhs = [], []
    for k in range(40):
        qk, qdk, qddk = map(jnp.asarray, random_state(desc.n, seed=100 + k))
        rows.append(np.asarray(rg.joint_torque_regressor(
            ma, qk, qdk, qddk, with_damping=True, with_armature=True)))
        rhs.append(np.asarray(g.inverse_dynamics(ma, qk, qdk, qddk)))
    A = np.concatenate(rows)
    b = np.concatenate(rhs)
    theta_hat, *_ = np.linalg.lstsq(A, b, rcond=None)
    # θ̂ may differ from θ only along null(A): torque predictions are exact,
    # and the armature estimate is exact for every joint whose diag(q̈)
    # column is outside the link-parameter span. (The FIRST joints'
    # armature is classically unidentifiable — a rotor on joint 1 is
    # indistinguishable from link-1 inertia about its own axis — so we
    # assert the invariant statement, not elementwise recovery.)
    theta_true = np.asarray(theta)
    np.testing.assert_allclose(A @ theta_hat, b, atol=1e-8)
    np.testing.assert_allclose(A @ (theta_hat - theta_true), 0.0, atol=1e-8)
    # distal joints: identifiable, recovered to float precision
    np.testing.assert_allclose(theta_hat[-desc.n + 2:], a_true[2:],
                               atol=1e-7)
