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
   end-effector stays on its anchor through a Baumgarte-stabilized rollout;
5. floating-base stance: J_fb columns vs the derivative of the independent
   world-position map, vanishing foot accelerations at the solution, the
   free-flyer ID round trip, a quadruped holding its static equilibrium;
6. unilateral ground contact: drop-and-settle (impulse rate = weight, cone
   conditions), stick-vs-slide friction, exact non-action at a distance
   (ballistic flight), batched == single-environment stepping;
7. batch-last layers == their per-state references to f64 round-off.
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


@pytest.mark.mid
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


# --------------------------------------------------------------------------
# Free-flyer contact (stance dynamics)
# --------------------------------------------------------------------------
from gridcodegenerator_tpu.ops import freeflyer as ff
from gridcodegenerator_tpu.models.urdf import rpy_to_matrix


def _hyq_ff():
    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    return ff.free_flyer_model(desc, dtype=jnp.float64)


_FEET = (2, 5, 8, 11)                     # the four lowerleg links
_FOOT_OFF = np.tile(np.array([0.35, 0.0, 0.0]), (4, 1))


def test_fb_contact_jacobian_vs_flow():
    """J_fb columns == the world point velocity produced by the state flow:
    ẋ_w = d/dt [pos + R(quat)·x_b(q)] along (ṗos = R v_b, quaṫ = ½q⊗[0,ω],
    q̇) must equal J_fb · [vb; q̇] for random velocities — an end-to-end check
    of the twist conventions, computed through a completely independent map
    (world position, not the velocity formula J_fb is built from)."""
    from gridcodegenerator_tpu.ops import contact as ctt
    ffm = _hyq_ff()
    n = ffm.n
    rng = np.random.default_rng(3)
    quat = ff.rot_to_quat(jnp.asarray(rpy_to_matrix(rng.uniform(-0.6, 0.6, 3))))
    pos = jnp.asarray(rng.uniform(-1, 1, 3))
    q = jnp.asarray(rng.uniform(-0.7, 0.7, n))
    vb = jnp.asarray(rng.uniform(-1, 1, 6))
    qd = jnp.asarray(rng.uniform(-1, 1, n))

    J = ctt.fb_contact_jacobian(ffm, quat, q, _FEET, _FOOT_OFF)
    assert J.shape == (12, 6 + n)

    def xw(quat_, pos_, q_):
        R = ff.quat_to_rot(quat_)
        return jnp.concatenate([
            pos_ + R @ ctt._fb_point_base(ffm, q_, l, jnp.asarray(_FOOT_OFF[i]))[0]
            for i, l in enumerate(_FEET)])

    dquat = 0.5 * ff.quat_mul(quat, jnp.concatenate([jnp.zeros(1), vb[:3]]))
    dpos = ff.quat_to_rot(quat) @ vb[3:]
    _, xdot = jax.jvp(xw, (quat, pos, q), (dquat, dpos, qd))
    np.testing.assert_allclose(np.asarray(J @ jnp.concatenate([vb, qd])),
                               np.asarray(xdot), atol=1e-12)


def test_fb_constrained_kkt_and_id_roundtrip():
    """Stance FD identities: (a) the achieved point world accelerations
    vanish (checked through a second jvp of the independent position map
    along the full state derivative, accelerations included); (b) the
    free-flyer ID round trip gen(v̇b, q̈) == [0;τ] + J_fbᵀ λ."""
    from gridcodegenerator_tpu.ops import contact as ctt
    ffm = _hyq_ff()
    n = ffm.n
    rng = np.random.default_rng(7)
    quat = ff.rot_to_quat(jnp.asarray(rpy_to_matrix(rng.uniform(-0.3, 0.3, 3))))
    pos = jnp.asarray([0.0, 0.0, 0.6])
    q = jnp.asarray(rng.uniform(-0.5, 0.5, n))
    vb = jnp.asarray(rng.uniform(-0.5, 0.5, 6))
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, n))
    tau = jnp.asarray(rng.uniform(-5, 5, n))

    dvb, qdd, lam = ctt.fb_constrained_forward_dynamics(
        ffm, quat, pos, q, vb, qd, tau, _FEET, _FOOT_OFF)

    # (a) ẍ_feet == 0: second derivative of the position map along the flow
    def xdot_of(quat_, q_, vb_, qd_):
        def xw(quat__, q__):
            R = ff.quat_to_rot(quat__)
            return jnp.concatenate([
                R @ ctt._fb_point_base(ffm, q__, l, jnp.asarray(_FOOT_OFF[i]))[0]
                for i, l in enumerate(_FEET)])
        dq_ = 0.5 * ff.quat_mul(quat_, jnp.concatenate([jnp.zeros(1), vb_[:3]]))
        _, xd = jax.jvp(xw, (quat_, q_), (dq_, qd_))
        # + ṗos = R v_b (world translation rate, identical for every point)
        return xd + jnp.tile(ff.quat_to_rot(quat_) @ vb_[3:], len(_FEET))

    dquat = 0.5 * ff.quat_mul(quat, jnp.concatenate([jnp.zeros(1), vb[:3]]))
    _, xddot = jax.jvp(xdot_of, (quat, q, vb, qd), (dquat, qd, dvb, qdd))
    np.testing.assert_allclose(np.asarray(xddot), 0.0, atol=1e-9)

    # (b) ID round trip with the contact wrench
    J = ctt.fb_contact_jacobian(ffm, quat, q, _FEET, _FOOT_OFF)
    gen_contact = J.T @ lam                       # rows [base wrench; τ]
    tau_id, wrench = ff.fb_inverse_dynamics(ffm, quat, q, vb, qd, dvb, qdd)
    np.testing.assert_allclose(np.asarray(tau_id),
                               np.asarray(tau + gen_contact[6:]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(wrench),
                               np.asarray(gen_contact[:6]), atol=1e-9)


def test_quadruped_stance_rollout():
    """HyQ standing: feet pinned in a crouch. The static-equilibrium torque
    is solved from the stance force balance (λ* = min-norm contact forces
    carrying the base gravity wrench, τ* = c_j − (Jᵀλ*)[τ rows]); the stance
    FD must then report zero accelerations, the rollout must hold the pose
    (feet drift < 0.1 mm, joints < 1e-3 rad over 800 steps), and the total
    vertical ground reaction must equal the robot's weight."""
    from gridcodegenerator_tpu.ops import contact as ctt
    ffm = _hyq_ff()
    n = ffm.n
    quat0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    pos0 = jnp.array([0.0, 0.0, 0.6])
    # a crouched stance: hips out, knees bent
    q0 = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4))
    vb0 = jnp.zeros(6)
    qd0 = jnp.zeros(n)
    R0 = ff.quat_to_rot(quat0)
    anchors = jnp.concatenate([
        pos0 + R0 @ ctt._fb_point_base(ffm, q0, l, jnp.asarray(_FOOT_OFF[i]))[0]
        for i, l in enumerate(_FEET)])

    # static equilibrium: [0; τ*] + Jᵀ λ* = [p_b; c_j] (bias at rest)
    X = ffm.arm.joint_transforms(q0)
    p_b, c_j = ff.fb_bias(ffm, X, R0, vb0, qd0)
    J = ctt.fb_contact_jacobian(ffm, quat0, q0, _FEET, _FOOT_OFF)
    lam_star = jnp.linalg.pinv(J[:, :6].T) @ p_b          # min-norm carrier
    tau_star = c_j - (J.T @ lam_star)[6:]

    dvb, qdd, lam = ctt.fb_constrained_forward_dynamics(
        ffm, quat0, pos0, q0, vb0, qd0, tau_star, _FEET, _FOOT_OFF)
    np.testing.assert_allclose(np.asarray(dvb), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(qdd), 0.0, atol=1e-8)

    taus = jnp.tile(tau_star, (800, 1))
    roll = jax.jit(lambda s: ctt.fb_simulate_constrained(
        ffm, s, taus, 1e-3, _FEET, _FOOT_OFF, anchors=anchors,
        baumgarte=(20.0, 20.0)))
    (quatT, posT, qT, vbT, qdT), (states, lams) = roll(
        (quat0, pos0, q0, vb0, qd0))
    assert bool(jnp.all(jnp.isfinite(qT)))
    assert float(jnp.abs(qT - q0).max()) < 1e-3

    RT = ff.quat_to_rot(quatT)
    feetT = jnp.concatenate([
        posT + RT @ ctt._fb_point_base(ffm, qT, l, jnp.asarray(_FOOT_OFF[i]))[0]
        for i, l in enumerate(_FEET)])
    assert float(jnp.abs(feetT - anchors).max()) < 1e-4

    # vertical ground reaction carries the weight (60.96 + 4·6.449 kg)
    m_tot = 60.96 + 4 * (2.93 + 2.638 + 0.881)
    fz = float(jnp.sum(lams[-1].reshape(4, 3)[:, 2]))
    np.testing.assert_allclose(fz, m_tot * 9.81, rtol=0.02)


def test_fb_constrained_linearize_vs_fd():
    """Stance linearization (whole-body-MPC blocks) vs central finite
    differences on the manifold, one column per input family."""
    from gridcodegenerator_tpu.ops import contact as ctt
    ffm = _hyq_ff()
    n = ffm.n
    rng = np.random.default_rng(11)
    quat = ff.rot_to_quat(jnp.asarray(rpy_to_matrix(rng.uniform(-0.2, 0.2, 3))))
    pos = jnp.asarray([0.0, 0.0, 0.6])
    q = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4)) \
        + jnp.asarray(rng.uniform(-0.05, 0.05, n))
    vb = jnp.asarray(rng.uniform(-0.2, 0.2, 6))
    qd = jnp.asarray(rng.uniform(-0.2, 0.2, n))
    tau = jnp.asarray(rng.uniform(-10, 10, n))

    Jl = ctt.fb_constrained_linearize(ffm, quat, pos, q, vb, qd, tau,
                                      _FEET, _FOOT_OFF)
    assert Jl["dphi"].shape == (6 + n, 3) and Jl["dtau"].shape == (6 + n, n)

    def out(quat_, q_, vb_, tau_):
        dvb, qdd, _ = ctt.fb_constrained_forward_dynamics(
            ffm, quat_, pos, q_, vb_, qd, tau_, _FEET, _FOOT_OFF)
        return np.concatenate([np.asarray(dvb), np.asarray(qdd)])

    eps = 1e-6
    # one attitude column
    d = np.zeros(3); d[1] = eps
    qp = ff.quat_mul(quat, ff.quat_exp_body(jnp.asarray(d)))
    qm = ff.quat_mul(quat, ff.quat_exp_body(jnp.asarray(-d)))
    fd_col = (out(qp, q, vb, tau) - out(qm, q, vb, tau)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(Jl["dphi"][:, 1]), fd_col,
                               rtol=2e-5, atol=2e-5)
    # one column each of q, vb, tau
    for key, base, idx in (("dq", q, 4), ("dvb", vb, 2), ("dtau", tau, 7)):
        arr = np.asarray(base)
        d = np.zeros_like(arr); d[idx] = eps
        args_p = [quat, q, vb, tau]
        args_m = [quat, q, vb, tau]
        slot = {"dq": 1, "dvb": 2, "dtau": 3}[key]
        args_p[slot] = jnp.asarray(arr + d)
        args_m[slot] = jnp.asarray(arr - d)
        fd_col = (out(*args_p) - out(*args_m)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Jl[key][:, idx]), fd_col,
                                   rtol=2e-5, atol=2e-5)


# --------------------------------------------------------------------------
# Unilateral ground contact (PGS, friction)
# --------------------------------------------------------------------------
def _stand_setup(mu=0.8, drop=0.0):
    from gridcodegenerator_tpu.ops import contact as ctt
    ffm = _hyq_ff()
    n = ffm.n
    quat0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    q0 = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4))
    # place the base so the feet touch z = 0, plus an optional drop height
    R0 = ff.quat_to_rot(quat0)
    foot_z = min(
        float(ctt._fb_point_base(ffm, q0, l, jnp.asarray(_FOOT_OFF[i]))[0][2])
        for i, l in enumerate(_FEET))
    pos0 = jnp.array([0.0, 0.0, -foot_z + drop])
    # gravity-compensation torque from the bilateral stance solution
    X = ffm.arm.joint_transforms(q0)
    p_b, c_j = ff.fb_bias(ffm, X, R0, jnp.zeros(6), jnp.zeros(n))
    J = ctt.fb_contact_jacobian(ffm, quat0, q0, _FEET, _FOOT_OFF)
    lam = jnp.linalg.pinv(J[:, :6].T) @ p_b
    tau_g = c_j - (J.T @ lam)[6:]
    return ctt, ffm, (quat0, pos0, q0, jnp.zeros(6), jnp.zeros(n)), tau_g


def test_ground_contact_settles_standing():
    """HyQ dropped 5 mm above the plane with gravity-compensating + PD
    torques: it lands, settles, and stands — penetration bounded by the
    stabilization, total normal impulse rate ≈ weight, every contact
    satisfies the cone conditions."""
    ctt, ffm, state0, tau_g = _stand_setup(drop=5e-3)
    n = ffm.n
    q0 = state0[2]
    dt = 1e-3
    T = 1200
    kp, kd = 300.0, 20.0

    @jax.jit
    def roll(s):
        def step(s_, _):
            quat, pos, q, vb, qd = s_
            tau = tau_g + kp * (q0 - q) - kd * qd
            nxt, imp = ctt.fb_step_ground(ffm, s_, tau, dt, _FEET, _FOOT_OFF,
                                          mu=0.9)
            return nxt, imp
        return jax.lax.scan(step, s, None, length=T)

    (quatT, posT, qT, vbT, qdT), imps = roll(state0)
    assert bool(jnp.all(jnp.isfinite(posT)))
    # settled: base nearly still
    assert float(jnp.linalg.norm(vbT)) < 0.05
    # feet on (not inside) the ground beyond the stabilization tolerance
    RT = ff.quat_to_rot(quatT)
    gaps = [float((posT + RT @ ctt._fb_point_base(
        ffm, qT, l, jnp.asarray(_FOOT_OFF[i]))[0])[2]) for i, l in
        enumerate(_FEET)]
    assert min(gaps) > -2e-3
    # impulse rate ≈ weight once settled; cone conditions hold
    m_tot = 60.96 + 4 * (2.93 + 2.638 + 0.881)
    last = np.asarray(imps[-1])               # (4, 3) [t1,t2,n]
    assert np.all(last[:, 2] >= 0)
    np.testing.assert_allclose(last[:, 2].sum() / dt, m_tot * 9.81,
                               rtol=0.05)
    tnorm = np.linalg.norm(last[:, :2], axis=1)
    assert np.all(tnorm <= 0.9 * last[:, 2] + 1e-9)


def test_ground_contact_friction_stick_vs_slide():
    """The same lateral base velocity decays fast on high-friction ground
    (sticking) and persists on near-frictionless ground (sliding)."""
    finals = {}
    for mu in (1.0, 0.02):
        ctt, ffm, state0, tau_g = _stand_setup()
        quat0, pos0, q0, vb0, qd0 = state0
        vb0 = vb0.at[3].set(0.5)              # 0.5 m/s along body-x
        n = ffm.n
        dt = 1e-3

        @jax.jit
        def roll(s):
            def step(s_, _):
                quat, pos, q, vb, qd = s_
                tau = tau_g + 300.0 * (q0 - q) - 20.0 * qd
                nxt, imp = ctt.fb_step_ground(
                    ffm, s_, tau, dt, _FEET, _FOOT_OFF, mu=mu)
                return nxt, None
            return jax.lax.scan(step, s, None, length=400)[0]

        quatT, posT, qT, vbT, qdT = roll((quat0, pos0, q0, vb0, qd0))
        finals[mu] = abs(float(vbT[3]))
    # measured (f64): 0.022 residual at μ=1.0 (small rocking), 0.42 at μ=0.02
    assert finals[1.0] < 0.05                 # stuck
    assert finals[0.02] > 5 * finals[1.0]     # still sliding


def test_ground_contact_liftoff_ballistic():
    """An upward launch: impulses vanish while airborne and the base
    follows the ballistic arc (the contact layer must not act at a
    distance). The legs are PD-held rigid so the base tracks the COM; the
    first ~20 ms are excluded — the launching feet legitimately stay in
    contact while they clear the activation margin."""
    ctt, ffm, state0, tau_g = _stand_setup()
    quat0, pos0, q0, vb0, qd0 = state0
    vb0 = vb0.at[5].set(1.5)                  # 1.5 m/s upward
    dt = 1e-3
    T = 150

    @jax.jit
    def roll(s):
        def step(s_, _):
            quat, pos, q, vb, qd = s_
            # PD only — no stance feedforward: in flight the correct
            # gravity compensation is ZERO (uniform gravity exerts no
            # internal torques), so tau_g would wrongly extend the legs
            # and push the base off the COM parabola
            tau = 600.0 * (q0 - q) - 40.0 * qd
            nxt, imp = ctt.fb_step_ground(ffm, s_, tau, dt, _FEET,
                                          _FOOT_OFF, mu=0.8)
            return nxt, (nxt[1][2], nxt[3][5], jnp.abs(imp).max())
        return jax.lax.scan(step, s, None, length=T)

    (quatT, posT, qT, vbT, qdT), (zs, vzs, imp_max) = roll(
        (quat0, pos0, q0, vb0, qd0))
    m = 20
    assert float(jnp.max(imp_max[m:])) == 0.0
    # semi-implicit ballistic arc from step m: z_N = z_m + K·dt·v_m −
    # g·dt²·K(K+1)/2, K = N−m (body z ≈ world z: attitude stays level)
    K = T - 1 - m
    z_expect = (float(zs[m]) + K * dt * float(vzs[m])
                - 9.81 * dt * dt * K * (K + 1) / 2)
    np.testing.assert_allclose(float(zs[-1]), z_expect, atol=3e-3)


def test_fb_constrained_batched_matches_single():
    """The batch-last stance solver must reproduce the single-state
    formulation to f64 round-off (same math, lane-parallel layout)."""
    from gridcodegenerator_tpu.ops import contact as ctt
    ffm = _hyq_ff()
    n = ffm.n
    rng = np.random.default_rng(53)
    B = 6
    quats = []
    for _ in range(B):
        quats.append(np.asarray(ff.rot_to_quat(
            jnp.asarray(rpy_to_matrix(rng.uniform(-0.4, 0.4, 3))))))
    quat = jnp.asarray(np.stack(quats))
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)) + [0, 0, 0.6])
    q = jnp.asarray(np.tile([-0.1, 0.7, -1.2], (B, 4))
                    + rng.uniform(-0.1, 0.1, (B, n)))
    vb = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 6)))
    qd = jnp.asarray(rng.uniform(-0.4, 0.4, (B, n)))
    tau = jnp.asarray(rng.uniform(-8, 8, (B, n)))
    anchors = np.asarray(rng.uniform(-0.5, 0.5, (4, 3)))

    for kwargs in (dict(),
                   dict(anchors=anchors, baumgarte=(10.0, 10.0), reg=1e-12)):
        dvb_b, qdd_b, lam_b = jax.jit(
            lambda *a: ctt.fb_constrained_fd_batched(
                ffm, *a, _FEET, _FOOT_OFF, **kwargs))(quat, pos, q, vb, qd,
                                                      tau)
        for kk in (0, B - 1):
            dvb_s, qdd_s, lam_s = ctt.fb_constrained_forward_dynamics(
                ffm, quat[kk], pos[kk], q[kk], vb[kk], qd[kk], tau[kk],
                _FEET, _FOOT_OFF, **kwargs)
            np.testing.assert_allclose(np.asarray(dvb_b[kk]),
                                       np.asarray(dvb_s), atol=1e-9)
            np.testing.assert_allclose(np.asarray(qdd_b[kk]),
                                       np.asarray(qdd_s), atol=1e-9)
            np.testing.assert_allclose(np.asarray(lam_b[kk]),
                                       np.asarray(lam_s), atol=1e-9)


def test_fb_step_ground_batched_matches_single():
    """The batched RL-environment stepper must reproduce N independent
    single-environment steps exactly (same PGS sweeps, lane-parallel)."""
    from gridcodegenerator_tpu.ops import contact as ctt
    ffm = _hyq_ff()
    n = ffm.n
    rng = np.random.default_rng(71)
    B = 5
    quat = []
    for _ in range(B):
        quat.append(np.asarray(ff.rot_to_quat(
            jnp.asarray(rpy_to_matrix(rng.uniform(-0.2, 0.2, 3))))))
    quat = jnp.asarray(np.stack(quat))
    pos = jnp.asarray(rng.uniform(-0.2, 0.2, (B, 3)) + [0, 0, 0.55])
    q = jnp.asarray(np.tile([-0.1, 0.7, -1.2], (B, 4))
                    + rng.uniform(-0.05, 0.05, (B, n)))
    vb = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 6)))
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)))
    tau = jnp.asarray(rng.uniform(-10, 10, (B, n)))

    nxt, imp = jax.jit(lambda s, t: ctt.fb_step_ground_batched(
        ffm, s, t, 1e-3, _FEET, _FOOT_OFF, mu=0.7))(
        (quat, pos, q, vb, qd), tau)
    assert imp.shape == (B, 4, 3)
    for kk in (0, 2, B - 1):
        s_ref, imp_ref = ctt.fb_step_ground(
            ffm, (quat[kk], pos[kk], q[kk], vb[kk], qd[kk]), tau[kk], 1e-3,
            _FEET, _FOOT_OFF, mu=0.7)
        for a, b in zip(nxt, s_ref):
            np.testing.assert_allclose(np.asarray(a[kk]), np.asarray(b),
                                       atol=1e-9)
        np.testing.assert_allclose(np.asarray(imp[kk]), np.asarray(imp_ref),
                                   atol=1e-9)


def test_fb_step_ground_batched_per_env_mu():
    """Per-environment friction coefficients (a traced (B, k) array — the
    domain-randomization shape) must match per-environment single steps with
    the matching scalar mu (ADVICE r2: mu used to be trace-time static)."""
    from gridcodegenerator_tpu.ops import contact as ctt
    ffm = _hyq_ff()
    n = ffm.n
    rng = np.random.default_rng(17)
    B = 3
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1))
    pos = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.5])
    q = jnp.asarray(np.tile([-0.1, 0.7, -1.2], (B, 4))
                    + rng.uniform(-0.05, 0.05, (B, n)))
    vb = jnp.asarray(rng.uniform(-0.8, 0.8, (B, 6)))
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)))
    tau = jnp.asarray(rng.uniform(-10, 10, (B, n)))
    mus = np.asarray([0.2, 0.7, 1.1])
    mu_bk = jnp.asarray(np.tile(mus[:, None], (1, len(_FEET))))

    nxt, imp = jax.jit(lambda s, t, m: ctt.fb_step_ground_batched(
        ffm, s, t, 1e-3, _FEET, _FOOT_OFF, mu=m))(
        (quat, pos, q, vb, qd), tau, mu_bk)
    for kk in range(B):
        s_ref, imp_ref = ctt.fb_step_ground(
            ffm, (quat[kk], pos[kk], q[kk], vb[kk], qd[kk]), tau[kk], 1e-3,
            _FEET, _FOOT_OFF, mu=float(mus[kk]))
        for a, b in zip(nxt, s_ref):
            np.testing.assert_allclose(np.asarray(a[kk]), np.asarray(b),
                                       atol=1e-9)
        np.testing.assert_allclose(np.asarray(imp[kk]), np.asarray(imp_ref),
                                   atol=1e-9)


def test_ground_contact_geometry_validated():
    """fb_step_ground / fb_step_ground_batched fail fast on malformed
    contact geometry (ADVICE r2: they used to bypass _check_contacts)."""
    from gridcodegenerator_tpu.ops import contact as ctt
    ffm = _hyq_ff()
    n = ffm.n
    state = (jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3) + 0.5,
             jnp.zeros(n), jnp.zeros(6), jnp.zeros(n))
    tau = jnp.zeros(n)
    with pytest.raises(ValueError, match="out of range"):
        ctt.fb_step_ground(ffm, state, tau, 1e-3, (999,), [[0, 0, 0.0]])
    with pytest.raises(ValueError, match="offsets"):
        ctt.fb_step_ground_batched(
            ffm, tuple(x[None] for x in state), tau[None], 1e-3,
            _FEET, np.zeros((2, 3)))


def test_fb_ground_batched_rollout_all_settle():
    """A fleet of quadruped environments dropped from different heights with
    PD-held joints: every environment settles standing (the parallel-RL
    deployment shape: one scan over time, lanes over environments)."""
    from gridcodegenerator_tpu.ops import contact as ctt
    ffm = _hyq_ff()
    n = ffm.n
    B = 8
    rng = np.random.default_rng(3)
    q0 = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4))
    foot_z = min(
        float(ctt._fb_point_base(ffm, q0, l, jnp.asarray(_FOOT_OFF[i]))[0][2])
        for i, l in enumerate(_FEET))
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1))
    pos = jnp.asarray(np.stack([
        [0, 0, -foot_z + h] for h in rng.uniform(0.0, 0.02, B)]))
    q = jnp.tile(q0, (B, 1))
    vb = jnp.zeros((B, 6))
    qd = jnp.zeros((B, n))

    # stance gravity-compensation + PD
    X = ffm.arm.joint_transforms(q0)
    p_b, c_j = ff.fb_bias(ffm, X, ff.quat_to_rot(quat[0]), jnp.zeros(6),
                          jnp.zeros(n))
    J = ctt.fb_contact_jacobian(ffm, quat[0], q0, _FEET, _FOOT_OFF)
    tau_g = c_j - (J.T @ (jnp.linalg.pinv(J[:, :6].T) @ p_b))[6:]

    @jax.jit
    def roll(state):
        def step(s, _):
            tau = tau_g[None] + 300.0 * (q0[None] - s[2]) - 20.0 * s[4]
            nxt, imp = ctt.fb_step_ground_batched(
                ffm, s, tau, 1e-3, _FEET, _FOOT_OFF, mu=0.9)
            return nxt, None
        return jax.lax.scan(step, state, None, length=900)[0]

    quatT, posT, qT, vbT, qdT = roll((quat, pos, q, vb, qd))
    assert bool(jnp.all(jnp.isfinite(posT)))
    # every environment: nearly still, base at standing height, feet at z≈0
    assert float(jnp.abs(vbT).max()) < 0.1
    np.testing.assert_allclose(np.asarray(posT[:, 2]), -foot_z, atol=0.02)


def test_fk_bl_matches_fk(iiwa64):
    """Batch-last FK == per-state FK (layout refactor guard)."""
    desc, _, model = iiwa64
    n = desc.n
    rng = np.random.default_rng(59)
    B = 5
    qs = jnp.asarray(rng.uniform(-2, 2, (B, n)))
    Rbl, pbl = kin.fk_bl(model, qs.T)
    for k in range(B):
        R, p = kin.fk(model, qs[k])
        for i in range(n):
            np.testing.assert_allclose(np.asarray(Rbl[i][..., k]),
                                       np.asarray(R[i]), atol=1e-13)
            np.testing.assert_allclose(np.asarray(pbl[i][..., k]),
                                       np.asarray(p[i]), atol=1e-13)
    # rows too
    links = (2, n - 1)
    offs = np.array([[0.03, 0.02, 0.05], [0.04, -0.03, 0.1]])
    Jbl = kin.contact_rows_bl(model, qs.T, links, offs)
    for k in (0, B - 1):
        J = ct.contact_jacobian(model, qs[k], links, jnp.asarray(offs))
        np.testing.assert_allclose(np.asarray(Jbl[..., k]), np.asarray(J),
                                   atol=1e-13)


def test_contact_geometry_validation(iiwa64):
    """Malformed contact sets fail fast with typed errors (the gpuAssert-
    at-the-host-boundary analog for the contact layer)."""
    desc, _, model = iiwa64
    n = desc.n
    q = qd = u = jnp.zeros(n)
    with pytest.raises(ValueError, match="empty"):
        ct.constrained_forward_dynamics(model, q, qd, u, (), np.zeros((0, 3)))
    with pytest.raises(ValueError, match="out of range"):
        ct.contact_jacobian(model, q, (n + 3,), np.zeros((1, 3)))
    with pytest.raises(ValueError, match="offsets"):
        ct.contact_jacobian(model, q, (0, 1), np.zeros((1, 3)))


def test_joint_limits_and_effort_in_ground_stepper():
    """URDF <limit> support: parse_urdf exposes q_lower/q_upper/effort/
    velocity; the stepper's ``limits=`` projection keeps q in bounds with
    zero outward velocity at a stop; ``effort=`` saturates τ."""
    import functools

    desc = g.parse_urdf(zoo.hyq(damping=0.5))
    ffm = ff.free_flyer_model(desc)
    n = desc.n
    np.testing.assert_allclose(desc.q_upper, 2.96)
    np.testing.assert_allclose(desc.effort, 300.0)
    assert np.all(np.isinf(g.parse_urdf(zoo.serial_chain(
        2)).velocity) | (g.parse_urdf(zoo.serial_chain(2)).velocity > 0))

    knees = np.array([2, 5, 8, 11])
    lo = jnp.asarray(desc.q_lower).at[knees].set(-0.8)
    hi = jnp.asarray(desc.q_upper).at[knees].set(0.8)
    tau = jnp.zeros(n).at[knees].set(40.0)
    state = (jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0, 0.55]),
             jnp.zeros(n), jnp.zeros(6), jnp.zeros(n))
    links, offs = (2, 5, 8, 11), np.array([[0.35, 0.0, 0.0]] * 4)
    step = jax.jit(functools.partial(
        ct.fb_step_ground, ffm, dt=0.002, links=links, offsets=offs,
        limits=(lo, hi), effort=desc.effort))
    s = state
    for _ in range(700):
        s, _ = step(state=s, tau=tau)
    q, qd = np.asarray(s[2]), np.asarray(s[4])
    assert np.isfinite(q).all() and np.isfinite(qd).all()
    assert (q <= np.asarray(hi) + 1e-12).all()
    assert (q >= np.asarray(lo) - 1e-12).all()
    at_stop = np.isclose(q, np.asarray(hi)) | np.isclose(q, np.asarray(lo))
    assert at_stop.any(), "the driven knees should reach their stop"
    assert np.all(np.abs(qd[at_stop]) < 1e-12)

    # effort saturation: clamped torque == the clipped value exactly
    big = jnp.full(n, 1e4)
    np.testing.assert_allclose(
        np.asarray(ct.clamp_effort(big, desc.effort)), 300.0)

    # batched stepper: same projection semantics (vmap/XLA body)
    B = 3
    bt = lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim)
    sb = tuple(bt(x) for x in state)
    stepb = jax.jit(functools.partial(
        ct.fb_step_ground_batched, ffm, dt=0.002, links=links, offsets=offs,
        impl="vmap", limits=(lo, hi), effort=desc.effort))
    for _ in range(250):
        sb, _ = stepb(state=sb, tau=bt(tau))
    qb = np.asarray(sb[2])
    assert np.isfinite(qb).all()
    assert (qb <= np.asarray(hi)[None] + 1e-12).all()


def test_limit_impulse_mode_momentum_consistent():
    """``limit_mode="impulse"`` treats the joint stop as a constraint row
    in the PGS solve, so the stopping impulse is INTERNAL: in flight
    (gravity off), centroidal momentum is conserved through the stop
    event; the cheap projection mode is not momentum-consistent (its
    violation here is ~200× larger). Batched impulse mode equals the
    single-state path exactly."""
    import functools

    from gridcodegenerator_tpu.ops import centroidal as cd

    desc = g.parse_urdf(zoo.hyq(damping=0.0))
    ffm = ff.free_flyer_model(desc)
    n = desc.n
    links, offs = (2, 5, 8, 11), np.array([[0.35, 0.0, 0.0]] * 4)
    lo = jnp.asarray(desc.q_lower).at[2].set(-0.3)
    hi = jnp.asarray(desc.q_upper).at[2].set(0.3)
    state = (jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0, 100.0]),
             jnp.zeros(n), jnp.zeros(6), jnp.zeros(n).at[2].set(3.0))
    drift = {}
    for mode in ("impulse", "project"):
        step = jax.jit(functools.partial(
            ct.fb_step_ground, ffm, dt=0.002, links=links, offsets=offs,
            limits=(lo, hi), gravity=0.0, limit_mode=mode))
        s = state
        h0 = np.asarray(cd.fb_centroidal_momentum(ffm, *s))
        for _ in range(200):
            s, _ = step(state=s, tau=jnp.zeros(n))
        h1 = np.asarray(cd.fb_centroidal_momentum(ffm, *s))
        drift[mode] = np.abs(h1 - h0).max()
        assert float(s[2][2]) <= 0.3 + 1e-9   # stopped at the bound
    assert drift["impulse"] < 5e-3
    assert drift["impulse"] < drift["project"] / 50.0

    # batched impulse mode == single-state, elementwise
    rng = np.random.default_rng(3)
    B = 3
    quat = rng.standard_normal((B, 4))
    quat = jnp.asarray(quat / np.linalg.norm(quat, axis=1, keepdims=True))
    pos = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 3))) + jnp.array([0, 0, 0.5])
    q = jnp.asarray(rng.uniform(-0.9, 0.9, (B, n)))
    vb = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 6)))
    qd = jnp.asarray(rng.uniform(-2, 2, (B, n)))
    tau = jnp.asarray(rng.uniform(-40, 40, (B, n)))
    lo2, hi2 = jnp.full(n, -0.85), jnp.full(n, 0.85)
    sb, impb = ct.fb_step_ground_batched(
        ffm, (quat, pos, q, vb, qd), tau, 0.002, links, offs, impl="vmap",
        limits=(lo2, hi2), limit_mode="impulse")
    for b in range(B):
        ss, imp = ct.fb_step_ground(
            ffm, tuple(x[b] for x in (quat, pos, q, vb, qd)), tau[b],
            0.002, links, offs, limits=(lo2, hi2), limit_mode="impulse")
        for a, got in zip(ss, [x[b] for x in sb]):
            np.testing.assert_allclose(np.asarray(got), np.asarray(a),
                                       atol=1e-12)
        np.testing.assert_allclose(np.asarray(impb[b]), np.asarray(imp),
                                   atol=1e-12)
