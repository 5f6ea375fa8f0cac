"""Analytic M⁻¹ parity and properties."""

import jax.numpy as jnp
import numpy as np

from conftest import random_state
from gridcodegenerator_tpu.ops import minv

TOL = 1e-9


def test_minv_parity(robot):
    desc, gold, model = robot
    q, _, _ = random_state(desc.n, seed=11)
    got = np.asarray(minv.direct_minv(model, jnp.asarray(q), dense=True))
    np.testing.assert_allclose(got, gold.minv(q, True), atol=TOL)


def test_minv_upper_convention(robot):
    """Raw output is upper-triangular (reference ``_direct_minv.py:32,390``);
    densify mirrors it (golden ``test_densify_Minv``)."""
    desc, gold, model = robot
    q, _, _ = random_state(desc.n, seed=12)
    up = np.asarray(minv.direct_minv(model, jnp.asarray(q), dense=False))
    np.testing.assert_allclose(np.tril(up, -1), 0.0, atol=1e-12)
    dense = np.asarray(minv.densify(jnp.asarray(up)))
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)
    np.testing.assert_allclose(np.triu(dense), np.triu(up), atol=1e-12)


def test_minv_times_crba_mass_matrix_is_identity(robot):
    """M⁻¹ (analytic recursion) × M (CRBA — an independent algorithm) = I."""
    desc, gold, model = robot
    q, _, _ = random_state(desc.n, seed=13)
    Minv = np.asarray(minv.direct_minv(model, jnp.asarray(q), dense=True))
    M = gold.crba(q)
    np.testing.assert_allclose(Minv @ M, np.eye(desc.n), atol=1e-8)


def test_minv_spd(robot):
    desc, gold, model = robot
    q, _, _ = random_state(desc.n, seed=14)
    Minv = np.asarray(minv.direct_minv(model, jnp.asarray(q), dense=True))
    assert np.all(np.linalg.eigvalsh(Minv) > 0)
