"""Whole-body stance inverse dynamics — ops/contact.py
``fb_stance_inverse_dynamics``.

Validation (float64, CPU):
1. FD∘ID round trip: for a stance-consistent target acceleration (taken
   from the stance FD itself), the returned τ reproduces exactly that
   (v̇b, q̈, λ) through :func:`fb_constrained_forward_dynamics`;
2. Newton–Euler consistency: ``fb_inverse_dynamics(v̇_des) == [0; τ] +
   Jᵀλ`` row by row;
3. gravity statics: standing at rest with v̇_des = 0, the contact normals
   carry exactly the robot's weight and the base residual vanishes;
4. degeneracy reporting: one point foot cannot realize a base moment —
   the residual carries the unrealizable component instead of silently
   returning garbage torques;
5. the batched wrapper matches per-state calls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import contact as ct
from gridcodegenerator_tpu.ops import freeflyer as ff

_FEET = (2, 5, 8, 11)
_FOOT_OFF = np.tile(np.array([0.35, 0.0, 0.0]), (4, 1))


def _stance_state(seed=0):
    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                              dtype=jnp.float64)
    rng = np.random.default_rng(seed)
    quat = jnp.asarray([1.0, 0.05, -0.03, 0.02], jnp.float64)
    quat = quat / jnp.linalg.norm(quat)
    pos = jnp.asarray([0.1, -0.2, 0.55], jnp.float64)
    q = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4)
                    + rng.uniform(-0.1, 0.1, 12), jnp.float64)
    vb = jnp.asarray(rng.uniform(-0.3, 0.3, 6), jnp.float64)
    qd = jnp.asarray(rng.uniform(-0.4, 0.4, 12), jnp.float64)
    return ffm, quat, pos, q, vb, qd, rng


def test_stance_id_fd_roundtrip():
    ffm, quat, pos, q, vb, qd, rng = _stance_state(1)
    tau0 = jnp.asarray(rng.normal(size=12) * 8.0, jnp.float64)
    vbdot, qdd, lam_fd = ct.fb_constrained_forward_dynamics(
        ffm, quat, pos, q, vb, qd, tau0, _FEET, _FOOT_OFF)
    tau_id, lam_id, res = ct.fb_stance_inverse_dynamics(
        ffm, quat, pos, q, vb, qd, vbdot, qdd, _FEET, _FOOT_OFF)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-9)
    # τ_id realizes the SAME motion (with its own min-norm λ)
    vbdot2, qdd2, lam2 = ct.fb_constrained_forward_dynamics(
        ffm, quat, pos, q, vb, qd, tau_id, _FEET, _FOOT_OFF)
    np.testing.assert_allclose(np.asarray(vbdot2), np.asarray(vbdot),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(qdd2), np.asarray(qdd),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(lam2), np.asarray(lam_id),
                               atol=1e-8)
    # min-norm λ is never longer than the FD's λ (same affine family)
    assert float(jnp.linalg.norm(lam_id)) <= float(
        jnp.linalg.norm(lam_fd)) + 1e-12


def test_stance_id_newton_euler_rows():
    ffm, quat, pos, q, vb, qd, rng = _stance_state(2)
    vbdot_des = jnp.asarray(rng.uniform(-1, 1, 6), jnp.float64)
    qdd_des = jnp.asarray(rng.uniform(-2, 2, 12), jnp.float64)
    tau, lam, res = ct.fb_stance_inverse_dynamics(
        ffm, quat, pos, q, vb, qd, vbdot_des, qdd_des, _FEET, _FOOT_OFF)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-9)
    tau_full, fb_wrench = ff.fb_inverse_dynamics(ffm, quat, q, vb, qd,
                                                 vbdot_des, qdd_des)
    J = ct.fb_contact_jacobian(ffm, quat, q, _FEET,
                               jnp.asarray(_FOOT_OFF, jnp.float64))
    rhs = jnp.concatenate([jnp.zeros(6, jnp.float64), tau]) + J.T @ lam
    np.testing.assert_allclose(np.asarray(fb_wrench), np.asarray(rhs[:6]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(tau_full), np.asarray(rhs[6:]),
                               atol=1e-9)


def test_stance_id_gravity_statics():
    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                              dtype=jnp.float64)
    quat = jnp.asarray([1.0, 0, 0, 0], jnp.float64)
    pos = jnp.asarray([0.0, 0.0, 0.55], jnp.float64)
    q = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4), jnp.float64)
    z6 = jnp.zeros(6, jnp.float64)
    z12 = jnp.zeros(12, jnp.float64)
    tau, lam, res = ct.fb_stance_inverse_dynamics(
        ffm, quat, pos, q, z6, z12, z6, z12, _FEET, _FOOT_OFF)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-9)
    from gridcodegenerator_tpu.ops.centroidal import total_mass
    weight = float(total_mass(ffm.arm) +
                   np.asarray(ffm.I_base)[5, 5]) * 9.81
    np.testing.assert_allclose(float(jnp.sum(lam[2::3])), weight,
                               rtol=1e-9)
    # hold without lateral force at rest on flat ground
    np.testing.assert_allclose(float(jnp.sum(lam[0::3])), 0.0, atol=1e-8)


def test_stance_id_degenerate_single_foot():
    """One point foot: a requested base angular acceleration about the
    contact point is unrealizable — the residual must carry it."""
    ffm, quat, pos, q, vb, qd, rng = _stance_state(3)
    vbdot_des = jnp.zeros(6, jnp.float64).at[0].set(5.0)  # roll the base
    tau, lam, res = ct.fb_stance_inverse_dynamics(
        ffm, quat, pos, q, jnp.zeros(6, jnp.float64),
        jnp.zeros(12, jnp.float64), vbdot_des, jnp.zeros(12, jnp.float64),
        (_FEET[0],), _FOOT_OFF[:1])
    assert float(jnp.max(jnp.abs(res))) > 1e-2
    assert bool(jnp.all(jnp.isfinite(tau))) and bool(
        jnp.all(jnp.isfinite(lam)))


def test_stance_id_batched_matches_single():
    ffm, quat, pos, q, vb, qd, rng = _stance_state(4)
    B = 3
    st = [jnp.stack([x] * B) + jnp.asarray(rng.uniform(-0.02, 0.02,
                                                       (B,) + x.shape))
          for x in (quat, pos, q, vb, qd)]
    st[0] = st[0] / jnp.linalg.norm(st[0], axis=1, keepdims=True)
    vbd = jnp.asarray(rng.uniform(-1, 1, (B, 6)))
    qdd = jnp.asarray(rng.uniform(-1, 1, (B, 12)))
    tb, lb, rb = ct.fb_stance_inverse_dynamics_batched(
        ffm, *st, vbd, qdd, _FEET, _FOOT_OFF)
    for e in range(B):
        t1, l1, r1 = ct.fb_stance_inverse_dynamics(
            ffm, *(x[e] for x in st), vbd[e], qdd[e], _FEET, _FOOT_OFF)
        np.testing.assert_allclose(np.asarray(tb[e]), np.asarray(t1),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(lb[e]), np.asarray(l1),
                                   atol=1e-12)
