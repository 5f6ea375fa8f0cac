"""Articulated-body forward dynamics (``ops/aba.py``): golden parity,
equivalence with the M⁻¹-composition FD, batch-last + fused kernel forms.

ABA is a *different recursion* from the engine's production FD (which
mirrors the reference's minv+RNEA composition,
``/root/reference/algorithms/_forward_dynamics.py:72-112``), so agreement
here is an independent in-family cross-check of both."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import get_setup, random_state
from gridcodegenerator_tpu.ops import aba, fd
from gridcodegenerator_tpu.ops.kernels import fused

TOL = 1e-9


def test_aba_golden_parity(robot):
    desc, gold, model = robot
    q, qd, u = random_state(desc.n, seed=31)
    got = np.asarray(aba.aba(model, jnp.asarray(q), jnp.asarray(qd),
                             jnp.asarray(u)))
    np.testing.assert_allclose(got, gold.fd(q, qd, u), atol=TOL)


def test_aba_matches_minv_fd(robot):
    desc, _, model = robot
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=32))
    ref = fd.forward_dynamics(model, q, qd, u)
    got = aba.aba(model, q, qd, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=TOL)


def test_aba_gravity_convention(small_robot):
    """gravity=0, q̇=0, u=0 → q̈ exactly 0; nonzero gravity matches FD."""
    desc, _, model = small_robot
    z = jnp.zeros(desc.n)
    assert float(jnp.abs(aba.aba(model, z, z, z, gravity=0.0)).max()) == 0.0
    ref = fd.forward_dynamics(model, z, z, z, gravity=-3.7)
    got = aba.aba(model, z, z, z, gravity=-3.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=TOL)


def test_aba_batch_last(robot):
    """(n, B) and (n, S, L) batch-last forms against per-state singles."""
    desc, _, model = robot
    n = desc.n
    q, qd, u = map(jnp.asarray, random_state(n, seed=33, batch=(6,)))
    ref = jnp.stack([aba.aba(model, q[b], qd[b], u[b]) for b in range(6)],
                    axis=1)
    got = aba.aba_bl(model, q.T, qd.T, u.T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=TOL)
    got2 = aba.aba_bl(model, q.T.reshape(n, 2, 3), qd.T.reshape(n, 2, 3),
                      u.T.reshape(n, 2, 3))
    np.testing.assert_allclose(np.asarray(got2.reshape(n, 6)),
                               np.asarray(ref), atol=TOL)


@pytest.mark.parametrize("name", ["hyq", "barm"])
def test_fb_aba_matches_mass_matrix_fd(name):
    """Floating-base ABA (one 6×6 base solve, no (6+n)² mass matrix)
    equals the dense free-flyer FD."""
    from gridcodegenerator_tpu.ops import freeflyer as ff

    desc, _, _ = get_setup(name)
    ffm = ff.free_flyer_model(desc)
    n = desc.n
    rng = np.random.default_rng(41)
    quat = rng.standard_normal(4)
    quat = jnp.asarray(quat / np.linalg.norm(quat))
    q, qd, tau = map(jnp.asarray, random_state(n, seed=42))
    vb = jnp.asarray(rng.uniform(-1, 1, 6))
    ref = ff.fb_forward_dynamics(ffm, quat, q, vb, qd, tau)
    got = aba.fb_aba(ffm, quat, q, vb, qd, tau)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=TOL)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=TOL)


@pytest.mark.mid
def test_fb_aba_fused_interpret():
    """Fused floating-base ABA body (interpret mode) vs the mass-matrix
    Cholesky kernel body on a batch."""
    from gridcodegenerator_tpu.ops import freeflyer as ff
    from gridcodegenerator_tpu.ops.kernels import contact_fused as cf

    desc, _, _ = get_setup("hyq")
    ffm = ff.free_flyer_model(desc)
    n = desc.n
    rng = np.random.default_rng(43)
    B = 5
    quat = rng.standard_normal((4, B))
    quat = jnp.asarray(quat / np.linalg.norm(quat, axis=0))
    q, qd, tau = (jnp.asarray(a).T
                  for a in random_state(n, seed=44, batch=(B,)))
    vb = jnp.asarray(rng.uniform(-1, 1, (6, B)))
    ref = cf.fb_fd_fused(ffm, quat, q, vb, qd, tau, interpret=True)
    got = cf.fb_aba_fused(ffm, quat, q, vb, qd, tau, interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=TOL)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=TOL)


@pytest.mark.parametrize(
    "name",
    [pytest.param("iiwa14", marks=pytest.mark.mid), "atlas", "barm"])
def test_aba_fused_interpret(name):
    """The fused kernel body (interpret mode) equals the plain batch-last
    path bit-for-bit — same compute body, tiled dispatch."""
    desc, _, model = get_setup(name)
    n = desc.n
    q, qd, u = (jnp.asarray(a).T
                for a in random_state(n, seed=34, batch=(9,)))
    ref = aba.aba_bl(model, q, qd, u)
    got = fused.forward_dynamics_aba_fused(model, q, qd, u, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=TOL)
