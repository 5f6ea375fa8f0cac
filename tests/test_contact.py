"""Kinematics + constrained (contact) dynamics — ops/kinematics.py,
ops/contact.py.

Validation strategy (all float64 on CPU):
1. FK against the golden model's independent NumPy FK;
2. analytic world Jacobian against forward-mode AD of the FK point position
   (the strongest check of the column geometry);
3. J̇q̇ against finite differences of J(q(t))·q̇;
4. constrained FD: (a) the KKT residual J q̈ + J̇q̇ = a* vanishes at the
   solution, (b) the ID round trip ``inverse_dynamics(q̈) == u + Jᵀλ``
   (constraint forces enter exactly as generalized forces), (c) a pinned
   end-effector stays on its anchor through a Baumgarte-stabilized rollout,
   (d) statics: a gravity-loaded pin carries the robot's weight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from conftest import random_state
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import contact as ct
from gridcodegenerator_tpu.ops import kinematics as kin


@pytest.fixture(scope="module")
def iiwa64():
    desc = g.parse_urdf(zoo.iiwa14(damping=0.1))
    return desc, g.GoldenDynamics(desc), \
        g.robot_model_from_description(desc, dtype=jnp.float64)


def test_fk_vs_golden(iiwa64):
    desc, gold, model = iiwa64
    q, _, _ = random_state(desc.n, seed=3)
    R, p = kin.fk(model, jnp.asarray(q))
    Rg, pg = gold.fk(np.asarray(q, np.float64))
    np.testing.assert_allclose(np.asarray(R), Rg, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p), pg, atol=1e-12)


def test_world_jacobian_vs_ad(iiwa64):
    """Analytic geometric Jacobian == jacfwd of the FK point position
    (linear rows) and of the incremental world rotation (angular rows)."""
    desc, _, model = iiwa64
    n = desc.n
    q, qd, _ = (jnp.asarray(x) for x in random_state(n, seed=11))
    link, off = n - 1, jnp.asarray([0.05, -0.02, 0.11])
    J = kin.world_jacobian(model, q, link, off)

    Jlin = jax.jacfwd(lambda q_: kin.point_position(model, q_, link, off))(q)
    np.testing.assert_allclose(np.asarray(J[3:]), np.asarray(Jlin),
                               atol=1e-12)
    # angular: ω = unskew(Ṙ Rᵀ) for q̇ = e_k
    R0 = kin.fk(model, q)[0][link]
    for k in (0, 2, n - 1):
        e = jnp.zeros(n).at[k].set(1.0)
        _, Rdot = jax.jvp(lambda q_: kin.fk(model, q_)[0][link], (q,), (e,))
        W = Rdot @ R0.T
        omega = jnp.stack([W[2, 1], W[0, 2], W[1, 0]])
        np.testing.assert_allclose(np.asarray(J[:3, k]), np.asarray(omega),
                                   atol=1e-12)
    # mid-chain link: distal columns must be exactly zero
    Jm = kin.world_jacobian(model, q, 2, off)
    np.testing.assert_allclose(np.asarray(Jm[:, 3:]), 0.0, atol=0.0)


def test_bias_acceleration_vs_fd(iiwa64):
    desc, _, model = iiwa64
    n = desc.n
    q, qd, _ = (jnp.asarray(x) for x in random_state(n, seed=7))
    link, off = n - 1, jnp.asarray([0.0, 0.03, 0.08])
    jdqd = kin.point_bias_acceleration(model, q, qd, link, off)
    eps = 1e-6
    Jp = kin.world_jacobian(model, q + eps * qd, link, off)
    Jm = kin.world_jacobian(model, q - eps * qd, link, off)
    ref = ((Jp - Jm) / (2 * eps)) @ qd
    np.testing.assert_allclose(np.asarray(jdqd), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)


def test_constrained_fd_kkt_and_id_roundtrip(iiwa64):
    """The two defining identities of the constrained solution."""
    desc, _, model = iiwa64
    n = desc.n
    q, qd, u = (jnp.asarray(x) for x in random_state(n, seed=23))
    links = (n - 1,)
    offs = jnp.asarray([[0.02, 0.0, 0.1]])

    qdd, lam = ct.constrained_forward_dynamics(model, q, qd, u, links, offs)
    # (a) acceleration-level constraint holds
    J = ct.contact_jacobian(model, q, links, offs)
    jdqd = ct.contact_bias(model, q, qd, links, offs)
    np.testing.assert_allclose(np.asarray(J @ qdd + jdqd), 0.0, atol=1e-9)
    # (b) λ enters exactly as a generalized force
    u_back = g.inverse_dynamics(model, q, qd, qdd) - J.T @ lam
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), atol=1e-9)
    # (c) the consistency helper agrees
    u2 = ct.constrained_inverse_dynamics(model, q, qd, qdd, lam, links, offs)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-9)


def test_pin_inactive_at_equilibrium():
    """If the applied torques already hold the arm still, the pin is
    force-free: q̈ = 0 and λ = 0 exactly (no spurious constraint forces at a
    consistent equilibrium)."""
    desc = g.parse_urdf(zoo.iiwa14(damping=0.0))
    model = g.robot_model_from_description(desc, dtype=jnp.float64)
    n = desc.n
    # a generic (bent) configuration and an off-axis pin point, so the
    # Delassus operator is nonsingular (a point ON a joint axis sheds rank —
    # see test_degenerate_contact_needs_reg)
    q = jnp.asarray([0.4, -0.7, 0.3, 1.1, -0.5, 0.8, 0.2])
    qd = jnp.zeros(n)
    links = (n - 1,)
    offs = jnp.asarray([[0.04, -0.03, 0.1]])
    # choose u that would hold the arm still WITHOUT the pin; then λ must be 0
    u_hold = g.inverse_dynamics(model, q, qd, jnp.zeros(n))
    qdd, lam = ct.constrained_forward_dynamics(model, q, qd, u_hold, links,
                                               offs)
    np.testing.assert_allclose(np.asarray(qdd), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lam), 0.0, atol=1e-8)


def test_pinned_rollout_stays_on_anchor():
    """Baumgarte-stabilized rollout: the pinned tip never leaves its anchor
    (drift < 0.5 mm over 4000 steps of vigorous unactuated swinging)."""
    desc = g.parse_urdf(zoo.iiwa14(damping=0.05))
    model = g.robot_model_from_description(desc, dtype=jnp.float64)
    n = desc.n
    rng = np.random.default_rng(5)
    q0 = jnp.asarray(rng.uniform(-0.6, 0.6, n))
    qd0 = jnp.asarray(rng.uniform(-0.5, 0.5, n))
    links = (n - 1,)
    offs = jnp.asarray([[0.04, -0.03, 0.1]])
    # make the initial velocity constraint-consistent (inelastic-impact map);
    # otherwise Baumgarte fights a persistent O(J q̇₀) offset
    qd0 = ct.project_velocity(model, q0, qd0, links, offs)
    anchor = kin.point_position(model, q0, links[0], offs[0])
    taus = jnp.zeros((4000, n))

    roll = jax.jit(lambda q, qd: ct.simulate_constrained(
        model, q, qd, taus, 5e-4, links, offs, anchors=anchor[None],
        baumgarte=(20.0, 20.0)))
    (qT, qdT), (qs, qds, lams) = roll(q0, qd0)
    assert bool(jnp.all(jnp.isfinite(qs)))
    # measure drift at a few sampled states across the trajectory
    for k in (500, 2000, 3999):
        x = kin.point_position(model, qs[k], links[0], offs[0])
        assert float(jnp.linalg.norm(x - anchor)) < 5e-4


def test_constrained_batched_jit(iiwa64):
    """vmap+jit over a batch of states — deployment shape for stance-phase
    trajectory optimization."""
    desc, _, model = iiwa64
    n = desc.n
    rng = np.random.default_rng(19)
    B = 8
    q = jnp.asarray(rng.uniform(-1, 1, (B, n)))
    qd = jnp.asarray(rng.uniform(-1, 1, (B, n)))
    u = jnp.asarray(rng.uniform(-4, 4, (B, n)))
    links = (3, n - 1)
    offs = jnp.asarray([[0.06, 0.04, 0.05], [0.02, -0.05, 0.1]])
    # self-check: this contact set must be well-conditioned at these states
    from gridcodegenerator_tpu.ops.minv import densify, minv_inner
    for k in (0, B - 1):
        J = ct.contact_jacobian(model, q[k], links, offs)
        Mi = densify(minv_inner(model, model.joint_transforms(q[k])))
        assert float(jnp.linalg.eigvalsh(J @ Mi @ J.T).min()) > 1e-6

    f = jax.jit(jax.vmap(
        lambda a, b, c: ct.constrained_forward_dynamics(
            model, a, b, c, links, offs)))
    qdd, lam = f(q, qd, u)
    assert qdd.shape == (B, n) and lam.shape == (B, 6)
    for k in (0, B - 1):
        ref_qdd, ref_lam = ct.constrained_forward_dynamics(
            model, q[k], qd[k], u[k], links, offs)
        np.testing.assert_allclose(np.asarray(qdd[k]), np.asarray(ref_qdd),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(lam[k]), np.asarray(ref_lam),
                                   atol=1e-10)


def test_degenerate_contact_needs_reg():
    """A pin point lying exactly ON its joint's axis sheds a Jacobian rank
    (found the hard way: pure-z offsets on the zoo iiwa are axis-aligned).
    The Delassus operator is then singular — the Cholesky solve produces
    non-finite λ — and the documented remedy, a ridge ``reg``, restores a
    finite minimum-norm-ish solution whose achieved accelerations still
    satisfy the constraint in the range space."""
    desc = g.parse_urdf(zoo.iiwa14(damping=0.1))
    model = g.robot_model_from_description(desc, dtype=jnp.float64)
    n = desc.n
    q, qd, u = (jnp.asarray(x) for x in random_state(n, seed=19))
    links = (3, n - 1)
    offs = jnp.asarray([[0.0, 0.0, 0.05], [0.02, 0.0, 0.1]])  # on-axis pt 1

    qdd0, lam0 = ct.constrained_forward_dynamics(model, q, qd, u, links, offs)
    assert not bool(jnp.all(jnp.isfinite(qdd0)))   # singular G, no reg
    qdd, lam = ct.constrained_forward_dynamics(model, q, qd, u, links, offs,
                                               reg=1e-10)
    assert bool(jnp.all(jnp.isfinite(qdd))) and bool(jnp.all(jnp.isfinite(lam)))
    # the constraint can only be enforced in range(G): null(G) = null(Jᵀ) is
    # a row combination no contact force can affect. Project the residual.
    from gridcodegenerator_tpu.ops.minv import densify, minv_inner
    J = ct.contact_jacobian(model, q, links, offs)
    jdqd = ct.contact_bias(model, q, qd, links, offs)
    Mi = densify(minv_inner(model, model.joint_transforms(q)))
    w, V = np.linalg.eigh(np.asarray(J @ Mi @ J.T))
    r = np.asarray(J @ qdd + jdqd)
    r_range = V[:, w > 1e-9] @ (V[:, w > 1e-9].T @ r)
    np.testing.assert_allclose(r_range, 0.0, atol=1e-4)
