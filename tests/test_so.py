"""Second-order dynamics derivatives (``ops/so.py``): the
forward-over-analytic Hessians vs nested automatic differentiation of the
primal algorithms, structural zeros, symmetry, and the batched API entries.

Validation logic mirrors the first-order strategy (SURVEY.md §4): the
analytic-pipeline result must agree with an independent derivation —
here ``jacfwd∘jacfwd`` over the primal FD/ID — to f64 tightness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.ops import fd as fd_ops
from gridcodegenerator_tpu.ops import rnea as rnea_ops
from gridcodegenerator_tpu.ops import so

from conftest import get_setup, random_state


def _concat_fd(model, gravity=-9.81):
    n = model.topology.n

    def f(x):
        return fd_ops.forward_dynamics(model, x[:n], x[n:2 * n], x[2 * n:],
                                       gravity)

    return f


def test_fd_hessian_vs_nested_ad(small_robot):
    """Forward-over-analytic == jacfwd∘jacfwd over the primal FD."""
    desc, _, model = small_robot
    q, qd, u = (jnp.asarray(a) for a in random_state(desc.n, seed=11))
    H = so.forward_dynamics_hessian(model, q, qd, u)
    x = jnp.concatenate([q, qd, u])
    H_ad = jax.jacfwd(jax.jacfwd(_concat_fd(model)))(x)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad),
                               atol=1e-9, rtol=1e-8)


def test_fd_hessian_structure(iiwa):
    """H is symmetric in the trailing pair; the ∂²q̈/∂u∂u block is exactly
    zero (q̈ is affine in u); ∂²q̈/∂u∂q = ∂M⁻¹/∂q ≠ 0."""
    desc, _, model = iiwa
    n = desc.n
    q, qd, u = (jnp.asarray(a) for a in random_state(n, seed=3))
    H = np.asarray(so.forward_dynamics_hessian(model, q, qd, u))
    np.testing.assert_allclose(H, np.swapaxes(H, 1, 2), atol=1e-10)
    np.testing.assert_array_equal(H[:, 2 * n:, 2 * n:], 0.0)
    np.testing.assert_array_equal(H[:, 2 * n:, n:2 * n], 0.0)  # ∂M⁻¹/∂q̇ = 0
    assert np.max(np.abs(H[:, 2 * n:, :n])) > 1e-3  # ∂M⁻¹/∂q lives


def test_fd_hessian_vp_contracts(iiwa):
    desc, _, model = iiwa
    n = desc.n
    q, qd, u = (jnp.asarray(a) for a in random_state(n, seed=5))
    lam = jnp.asarray(np.random.default_rng(7).standard_normal(n))
    Hvp = so.forward_dynamics_hessian_vp(model, q, qd, u, lam)
    H = so.forward_dynamics_hessian(model, q, qd, u)
    np.testing.assert_allclose(
        np.asarray(Hvp), np.einsum("i,ijk->jk", np.asarray(lam),
                                   np.asarray(H)), atol=1e-10)


def test_id_hessian_vs_nested_ad(small_robot):
    desc, _, model = small_robot
    n = desc.n
    q, qd, qdd = (jnp.asarray(a) for a in random_state(n, seed=21))

    def c_of_x(x):
        return rnea_ops.inverse_dynamics(model, x[:n], x[n:], qdd, -9.81)

    x = jnp.concatenate([q, qd])
    H_ad = jax.jacfwd(jax.jacfwd(c_of_x))(x)
    H = so.inverse_dynamics_hessian(model, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad),
                               atol=1e-9, rtol=1e-8)
    Hvp = so.inverse_dynamics_hessian_vp(
        model, q, qd, jnp.ones(n), qdd)
    np.testing.assert_allclose(np.asarray(Hvp),
                               np.asarray(H).sum(axis=0), atol=1e-10)


@pytest.mark.mid
def test_hessian_api_batched(iiwa):
    """The api entries batch like their first-order siblings and agree with
    the single-state loop; gradient_full's leading 2n columns equal the
    first-order entry and its u-block is M⁻¹."""
    desc, _, model = iiwa
    n = desc.n
    q, qd, u = (jnp.asarray(a) for a in random_state(n, seed=9, batch=(5,)))
    Hb = g.forward_dynamics_hessian(model, q, qd, u)
    assert Hb.shape == (5, n, 3 * n, 3 * n)
    for b in (0, 4):
        Hs = so.forward_dynamics_hessian(model, q[b], qd[b], u[b])
        np.testing.assert_allclose(np.asarray(Hb[b]), np.asarray(Hs),
                                   atol=1e-11)
    Jf = g.forward_dynamics_gradient_full(model, q, qd, u)
    assert Jf.shape == (5, n, 3 * n)
    np.testing.assert_allclose(
        np.asarray(Jf[..., :2 * n]),
        np.asarray(g.forward_dynamics_gradient(model, q, qd, u, impl="vmap")),
        atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(Jf[..., 2 * n:]),
        np.asarray(g.direct_minv(model, q, impl="vmap")), atol=1e-11)
    lam = jnp.ones((5, n))
    Hvp = g.forward_dynamics_hessian_vp(model, q, qd, u, lam)
    assert Hvp.shape == (5, 3 * n, 3 * n)
    np.testing.assert_allclose(
        np.asarray(Hvp), np.einsum("bijk->bjk", np.asarray(Hb)), atol=1e-10)
    Hc = g.inverse_dynamics_hessian(model, q, qd, u)
    assert Hc.shape == (5, n, 2 * n, 2 * n)


@pytest.mark.parametrize(
    "name",
    [pytest.param("dpend", marks=pytest.mark.mid), "barm", "iiwa14"])
def test_fd_hessian_batch_last_equivalence(name):
    """The TPU production path (batch-last linearize over blops) must match
    the vmap nest exactly — both plain and λ-contracted. Three robots only
    (planar / branched tree / iiwa): the vmap-nest reference compile costs
    ~100 s per robot on a 1-core host, and the blops body under the
    linearize is already validated per-robot elsewhere; only the cheapest
    is in the ~5-minute mid tier."""
    desc, _, model = get_setup(name)
    n = desc.n
    q, qd, u = (jnp.asarray(a) for a in random_state(n, seed=17, batch=(3,)))
    lam = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, n)))
    H_ref = g.forward_dynamics_hessian(model, q, qd, u, impl="vmap")
    H_bl = so.forward_dynamics_hessian_bl(model, q.T, qd.T, u.T)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(H_bl, -1, 0)),
                               np.asarray(H_ref), atol=1e-9, rtol=1e-9)
    Hvp_ref = g.forward_dynamics_hessian_vp(model, q, qd, u, lam,
                                            impl="vmap")
    Hvp_bl = so.forward_dynamics_hessian_bl(model, q.T, qd.T, u.T,
                                            lam=lam.T)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(Hvp_bl, -1, 0)),
                               np.asarray(Hvp_ref), atol=1e-9, rtol=1e-9)
    # api routing with impl="pallas" uses the bl adapter on any backend
    H_api = g.forward_dynamics_hessian(model, q, qd, u, impl="pallas")
    np.testing.assert_allclose(np.asarray(H_api), np.asarray(H_ref),
                               atol=1e-9, rtol=1e-9)


def test_fd_hessian_taylor(iiwa):
    """Second-order Taylor expansion of FD beats first-order by the
    expected order: |fd(x+δ) − fd(x) − J δ − ½ δᵀHδ| = O(|δ|³)."""
    desc, _, model = iiwa
    n = desc.n
    q, qd, u = (jnp.asarray(a) for a in random_state(n, seed=33))
    x0 = jnp.concatenate([q, qd, u])
    f = _concat_fd(model)
    J = np.asarray(g.forward_dynamics_gradient_full(model, q, qd, u))
    H = np.asarray(so.forward_dynamics_hessian(model, q, qd, u))
    rng = np.random.default_rng(1)
    d = rng.standard_normal(3 * n)
    d /= np.linalg.norm(d)
    errs = []
    for eps in (1e-2, 1e-3):
        delta = eps * d
        f1 = np.asarray(f(x0 + jnp.asarray(delta)))
        pred = (np.asarray(f(x0)) + J @ delta
                + 0.5 * np.einsum("ijk,j,k->i", H, delta, delta))
        errs.append(np.max(np.abs(f1 - pred)))
    # third-order remainder: error ratio ~1e3 per decade of eps
    assert errs[1] < errs[0] * 1e-2
