"""Tangent-space second-order derivatives (ops/so_md.py).

Ground truth is nested forward-mode AD of the pullback itself:
``H_true = ∂²/∂z∂z [λᵀ q̈(q ⊕ δ, q̇, u)]`` at z = 0 — symmetric by
construction and chart-correct by construction. The analytic path must
reproduce it exactly (f64): this is what pins the chart-composition
correction D(δ) (module docstring) — WITHOUT it the q-q block of the
jacfwd-over-analytic object is asymmetric by O(|gradient|)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import multidof as md
from gridcodegenerator_tpu.ops import so, so_md


def _model(urdf):
    return md.multidof_model_from_description(g.parse_urdf(urdf),
                                              dtype=jnp.float64)


def _state(mdm, seed=0):
    rng = np.random.default_rng(seed)
    q = md.md_tangent_apply(
        mdm, md.neutral_q(mdm),
        jnp.asarray(rng.uniform(-0.8, 0.8, mdm.nv)))
    qd, u, lam = (jnp.asarray(rng.uniform(-1, 1, mdm.nv))
                  for _ in range(3))
    return q, qd, u, lam


def _h_true(mdm, q, qd, u, lam, gravity=-9.81):
    nv = mdm.nv

    def h(z):
        qz = md.md_tangent_apply(mdm, q, z[:nv])
        return lam @ md.md_forward_dynamics(mdm, qz, z[nv:2 * nv] + qd,
                                            z[2 * nv:] + u, gravity)

    return np.asarray(jax.jacfwd(jax.jacfwd(h))(jnp.zeros(3 * nv,
                                                          jnp.float64)))


@pytest.mark.parametrize("urdf_fn, seed", [
    (lambda: zoo.ball_arm(damping=0.1), 3),
    (lambda: zoo.with_free_joint(zoo.iiwa14(damping=0.1)), 7),
])
def test_md_hessian_vp_matches_nested_ad(urdf_fn, seed):
    """Spherical chain and TRUE floating base (quaternion + position —
    the coupled δφ/δρ chart blocks) vs nested AD of the pullback."""
    mdm = _model(urdf_fn())
    q, qd, u, lam = _state(mdm, seed)
    H = np.asarray(so_md.md_forward_dynamics_hessian_vp(mdm, q, qd, u, lam))
    ref = _h_true(mdm, q, qd, u, lam)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(H - ref).max() / scale < 1e-10
    # the pullback Hessian is symmetric — and would NOT be without the
    # chart correction (the uncorrected q-q block error is O(gradient))
    assert np.abs(H - H.T).max() / scale < 1e-10


def test_md_hessian_vp_reduces_to_fixed_base():
    """All-1-dof robot: D(δ) = I and the tangent chart is the coordinate
    chart, so the md Hessian equals the fixed-base ops/so.py object."""
    urdf = zoo.iiwa14(damping=0.1)
    mdm = _model(urdf)
    model = g.load_robot(urdf, dtype=jnp.float64)
    rng = np.random.default_rng(11)
    q, qd, u, lam = (jnp.asarray(rng.uniform(-1, 1, mdm.nv))
                     for _ in range(4))
    H = np.asarray(so_md.md_forward_dynamics_hessian_vp(mdm, q, qd, u, lam))
    ref = np.asarray(so.forward_dynamics_hessian_vp(model, q, qd, u, lam))
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(H - ref).max() / scale < 1e-10


def test_md_full_hessian_contracts_to_vp():
    mdm = _model(zoo.ball_arm(damping=0.05))
    q, qd, u, lam = _state(mdm, 13)
    Hfull = so_md.md_forward_dynamics_hessian(mdm, q, qd, u)
    vp = so_md.md_forward_dynamics_hessian_vp(mdm, q, qd, u, lam)
    np.testing.assert_allclose(
        np.einsum("i,ijk->jk", np.asarray(lam), np.asarray(Hfull)),
        np.asarray(vp), atol=1e-11)


def test_md_id_hessian_vp_matches_nested_ad():
    mdm = _model(zoo.with_free_joint(zoo.iiwa14(damping=0.1)))
    nv = mdm.nv
    q, qd, _, lam = _state(mdm, 17)
    rng = np.random.default_rng(19)
    qdd = jnp.asarray(rng.uniform(-1, 1, nv))

    def h(z):
        qz = md.md_tangent_apply(mdm, q, z[:nv])
        tau, _, _, _ = md.md_rnea(mdm, qz, z[nv:] + qd, qdd)
        return lam @ tau

    ref = np.asarray(jax.jacfwd(jax.jacfwd(h))(jnp.zeros(2 * nv,
                                                         jnp.float64)))
    H = np.asarray(so_md.md_inverse_dynamics_hessian_vp(mdm, q, qd, lam,
                                                        qdd))
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(H - ref).max() / scale < 1e-10


def test_chart_correction_shape_and_identity():
    mdm = _model(zoo.with_free_joint(zoo.iiwa14()))
    D0 = np.asarray(so_md.chart_correction(mdm, jnp.zeros(mdm.nv,
                                                          jnp.float64)))
    np.testing.assert_allclose(D0, np.eye(mdm.nv), atol=0)
    # at a nonzero δ the floating block is non-identity and orthogonal-ish
    d = jnp.zeros(mdm.nv, jnp.float64).at[0].set(0.3).at[4].set(-0.2)
    D = np.asarray(so_md.chart_correction(mdm, d))
    assert np.abs(D[:3, :3] - np.eye(3)).max() > 1e-3
