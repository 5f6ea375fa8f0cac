"""Inverse dynamics (RNEA) parity and properties."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import random_state
from gridcodegenerator_tpu.ops import rnea

TOL = 1e-10


def test_rnea_parity(robot):
    desc, gold, model = robot
    q, qd, qdd = random_state(desc.n, seed=1)
    cg, vg, ag, fg = gold.rnea(q, qd, qdd)
    c, v, a, f = rnea.rnea(model, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd))
    np.testing.assert_allclose(np.asarray(c), cg, atol=TOL)
    np.testing.assert_allclose(np.asarray(v), vg, atol=TOL)
    np.testing.assert_allclose(np.asarray(a), ag, atol=TOL)
    np.testing.assert_allclose(np.asarray(f), fg, atol=TOL)


def test_rnea_no_qdd_variant(robot):
    desc, gold, model = robot
    q, qd, _ = random_state(desc.n, seed=2)
    cg, *_ = gold.rnea(q, qd, None)
    c = rnea.inverse_dynamics(model, jnp.asarray(q), jnp.asarray(qd), None)
    np.testing.assert_allclose(np.asarray(c), cg, atol=TOL)


def test_rnea_vaf_variant(robot):
    """vaf variant: same v,a,f as full rnea, no torque extraction
    (reference ``inverse_dynamics_inner_vaf``)."""
    desc, gold, model = robot
    q, qd, qdd = random_state(desc.n, seed=3)
    _, vg, ag, fg = gold.rnea(q, qd, qdd)
    v, a, f = rnea.rnea_vaf(model, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd))
    np.testing.assert_allclose(np.asarray(f), fg, atol=TOL)


def test_gravity_convention(iiwa):
    """a_base = [0,...,0,−GRAVITY] with default GRAVITY=−9.81
    (reference ``_test.py:13-14``); custom values must propagate."""
    desc, gold, model = iiwa
    q, qd, qdd = random_state(desc.n, seed=4)
    for grav in (-9.81, 0.0, -3.72):
        cg, *_ = gold.rnea(q, qd, qdd, grav)
        c = rnea.inverse_dynamics(model, jnp.asarray(q), jnp.asarray(qd),
                                  jnp.asarray(qdd), gravity=grav)
        np.testing.assert_allclose(np.asarray(c), cg, atol=TOL)


def test_damping_semantics(iiwa):
    """c includes damping·q̇ (golden semantics, reference ``_test.py:103-105``)."""
    desc, gold, model = iiwa
    q, qd, qdd = random_state(desc.n, seed=5)
    c = np.asarray(rnea.inverse_dynamics(model, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd)))
    c2 = np.asarray(rnea.inverse_dynamics(model, jnp.asarray(q), jnp.asarray(2 * qd), jnp.asarray(qdd)))
    # doubling qd changes the damping part linearly; verify against golden deltas
    cg = gold.rnea(q, qd, qdd)[0]
    cg2 = gold.rnea(q, 2 * qd, qdd)[0]
    np.testing.assert_allclose(c2 - c, cg2 - cg, atol=TOL)


def test_mass_matrix_consistency(robot):
    """ID unit responses reconstruct M: M[:,j] = ID(q,0,e_j) − ID(q,0,0),
    cross-checked against CRBA — ties RNEA and CRBA together."""
    desc, gold, model = robot
    n = desc.n
    q, _, _ = random_state(n, seed=6)
    qa = jnp.asarray(q)
    z = jnp.zeros(n)
    c0 = rnea.inverse_dynamics(model, qa, z, z)
    cols = [np.asarray(rnea.inverse_dynamics(model, qa, z, jnp.eye(n)[j]) - c0)
            for j in range(n)]
    M = np.stack(cols, axis=1)
    np.testing.assert_allclose(M, gold.crba(q), atol=1e-9)


def test_newton_euler_sanity(iiwa):
    """Zero velocity, zero gravity, zero qdd → zero torque."""
    desc, gold, model = iiwa
    n = desc.n
    z = jnp.zeros(n)
    q = jnp.asarray(random_state(n, seed=7)[0])
    c = rnea.inverse_dynamics(model, q, z, z, gravity=0.0)
    np.testing.assert_allclose(np.asarray(c), 0.0, atol=1e-12)
