"""Spatial algebra: jnp operators vs golden matrices vs reference semantics."""

import jax.numpy as jnp
import numpy as np

from gridcodegenerator_tpu.ops import spatial
from gridcodegenerator_tpu.utils.golden import crf as crf_np, crm as crm_np


def rand6(seed, shape=(6,)):
    return np.random.default_rng(seed).uniform(-2, 2, shape)


def test_crm_crf_apply_match_matrices():
    m, x = rand6(0), rand6(1)
    np.testing.assert_allclose(
        np.asarray(spatial.crm_apply(jnp.asarray(m), jnp.asarray(x))),
        crm_np(m) @ x, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(spatial.crf_apply(jnp.asarray(m), jnp.asarray(x))),
        crf_np(m) @ x, atol=1e-12)


def test_crm_crf_matrix_builders():
    m = rand6(2)
    np.testing.assert_allclose(np.asarray(spatial.crm(jnp.asarray(m))), crm_np(m), atol=1e-12)
    np.testing.assert_allclose(np.asarray(spatial.crf(jnp.asarray(m))), crf_np(m), atol=1e-12)
    # crf = -crmᵀ (reference ``mx``/``fx`` relation, _test.py:610-611)
    np.testing.assert_allclose(crf_np(m), -crm_np(m).T, atol=1e-12)


def test_reference_mx_columns():
    """crm(v)·e_k reproduces the reference's hard-coded mx0..mx5 columns
    (``_test.py:538-608``)."""
    v = rand6(3)
    M = crm_np(v)
    # mx0: [0, v2, -v1, 0, v5, -v4]
    np.testing.assert_allclose(M[:, 0], [0, v[2], -v[1], 0, v[5], -v[4]], atol=1e-15)
    # mx2: [v1, -v0, 0, v4, -v3, 0]
    np.testing.assert_allclose(M[:, 2], [v[1], -v[0], 0, v[4], -v[3], 0], atol=1e-15)
    # mx4: [0, 0, 0, -v2, 0, v0]
    np.testing.assert_allclose(M[:, 4], [0, 0, 0, -v[2], 0, v[0]], atol=1e-15)


def test_reference_fxv():
    """crf_apply reproduces the reference ``fxv`` component formulas
    (``_test.py:649-664``)."""
    a, b = rand6(4), rand6(5)
    got = np.asarray(spatial.crf_apply(jnp.asarray(a), jnp.asarray(b)))
    expected = np.array([
        -a[2] * b[1] + a[1] * b[2] - a[5] * b[4] + a[4] * b[5],
        a[2] * b[0] - a[0] * b[2] + a[5] * b[3] - a[3] * b[5],
        -a[1] * b[0] + a[0] * b[1] - a[4] * b[3] + a[3] * b[4],
        -a[2] * b[4] + a[1] * b[5],
        a[2] * b[3] - a[0] * b[5],
        -a[1] * b[3] + a[0] * b[4],
    ])
    np.testing.assert_allclose(got, expected, atol=1e-15)


def test_batched_broadcast():
    m, x = rand6(6, (4, 3, 6)), rand6(7, (4, 3, 6))
    got = np.asarray(spatial.crm_apply(jnp.asarray(m), jnp.asarray(x)))
    for i in range(4):
        for j in range(3):
            np.testing.assert_allclose(got[i, j], crm_np(m[i, j]) @ x[i, j], atol=1e-12)


def test_xform_coefficient_trick(robot):
    """X(q) via the affine (Xb, Xs, Xc) form equals the golden direct
    rotation-composition path, for every robot in the zoo."""
    desc, gold, model = robot
    q = np.random.default_rng(8).uniform(-2.5, 2.5, desc.n)
    Xj = np.asarray(model.joint_transforms(jnp.asarray(q)))
    np.testing.assert_allclose(Xj, gold.xmats(q), atol=1e-12)
