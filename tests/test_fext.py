"""External forces (``f_ext`` — link-local wrenches, Pinocchio's ``fext``
semantics; no counterpart in the reference, which has no external-force
input).

Validation strategy:
  * ID∘FD round trip with the SAME f_ext recovers u exactly.
  * ABA(f_ext) == M⁻¹-composition FD(f_ext) (two independent recursions).
  * A pure world-frame point force built by ``point_force_fext`` shifts the
    torques by exactly −J_linᵀ f_world (the world point-Jacobian identity).
  * The analytic ∂ID/∇FD with f_ext match jacfwd of the f_ext-aware primal.
  * The custom-VJP FD entry propagates exact gradients to f_ext itself
    (vs plain AD through the unrolled recursions).
  * f_ext=None and f_ext=0 are bitwise identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import get_setup, random_state
from gridcodegenerator_tpu.ops import aba, fd, fd_grad, kinematics, rnea
from gridcodegenerator_tpu.ops import rnea_grad

TOL = 1e-9


def _fext(n, seed=5):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-6.0, 6.0, (n, 6)))


def test_id_fd_roundtrip_with_fext(robot):
    desc, _, model = robot
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=51))
    fe = _fext(desc.n)
    qdd = fd.forward_dynamics(model, q, qd, u, f_ext=fe)
    u_back = rnea.inverse_dynamics(model, q, qd, qdd, f_ext=fe)
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), atol=1e-8)


def test_aba_matches_fd_with_fext(robot):
    desc, _, model = robot
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=52))
    fe = _fext(desc.n, seed=7)
    ref = fd.forward_dynamics(model, q, qd, u, f_ext=fe)
    got = aba.aba(model, q, qd, u, f_ext=fe)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=TOL)


def test_point_force_jacobian_identity(iiwa):
    """c(f_ext from world point force) == c(0) − J_linᵀ f_world."""
    desc, _, model = iiwa
    n = desc.n
    q, qd, _ = map(jnp.asarray, random_state(n, seed=53))
    qdd = jnp.asarray(np.random.default_rng(3).uniform(-2, 2, n))
    link, off = n - 1, jnp.asarray([0.05, -0.02, 0.11])
    f_w = jnp.asarray([3.0, -7.0, 4.5])
    fe = kinematics.point_force_fext(model, q, link, off, f_w)
    c0 = rnea.inverse_dynamics(model, q, qd, qdd)
    c1 = rnea.inverse_dynamics(model, q, qd, qdd, f_ext=fe)
    J = kinematics.world_jacobian(model, q, link, off)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0 - J[3:].T @ f_w),
                               atol=1e-9)


def test_point_force_with_moment(iiwa):
    """A world moment enters through the J_ang rows."""
    desc, _, model = iiwa
    n = desc.n
    q, qd, _ = map(jnp.asarray, random_state(n, seed=54))
    link, off = 3, jnp.asarray([0.0, 0.0, 0.0])
    m_w = jnp.asarray([1.5, -0.5, 2.0])
    fe = kinematics.point_force_fext(model, q, link, off,
                                     jnp.zeros(3), moment_world=m_w)
    c0 = rnea.inverse_dynamics(model, q, qd, None)
    c1 = rnea.inverse_dynamics(model, q, qd, None, f_ext=fe)
    J = kinematics.world_jacobian(model, q, link, off)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0 - J[:3].T @ m_w),
                               atol=1e-9)


def test_id_grad_analytic_vs_ad_with_fext(grad_robot):
    desc, _, model = grad_robot
    n = desc.n
    q, qd, u = map(jnp.asarray, random_state(n, seed=55))
    qdd = jnp.asarray(np.random.default_rng(9).uniform(-2, 2, n))
    fe = _fext(n, seed=11)
    got = rnea_grad.inverse_dynamics_gradient(model, q, qd, qdd, f_ext=fe)
    jq = jax.jacfwd(lambda x: rnea.inverse_dynamics(model, x, qd, qdd,
                                                    f_ext=fe))(q)
    jqd = jax.jacfwd(lambda x: rnea.inverse_dynamics(model, q, x, qdd,
                                                     f_ext=fe))(qd)
    np.testing.assert_allclose(np.asarray(got[:, :n]), np.asarray(jq),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(got[:, n:]), np.asarray(jqd),
                               atol=1e-8)


def test_fd_grad_analytic_vs_ad_with_fext(grad_robot):
    desc, _, model = grad_robot
    n = desc.n
    q, qd, u = map(jnp.asarray, random_state(n, seed=56))
    fe = _fext(n, seed=13)
    got = fd_grad.forward_dynamics_gradient(model, q, qd, u, f_ext=fe)
    jq = jax.jacfwd(lambda x: fd.forward_dynamics(model, x, qd, u,
                                                  f_ext=fe))(q)
    jqd = jax.jacfwd(lambda x: fd.forward_dynamics(model, q, x, u,
                                                   f_ext=fe))(qd)
    np.testing.assert_allclose(np.asarray(got[:, :n]), np.asarray(jq),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(got[:, n:]), np.asarray(jqd),
                               atol=1e-8)


def test_fd_diff_vjp_to_fext(iiwa):
    """The custom-VJP FD entry: exact cotangents into f_ext (and into
    q/q̇/u in the presence of f_ext) vs plain AD."""
    desc, _, model = iiwa
    n = desc.n
    q, qd, u = map(jnp.asarray, random_state(n, seed=57))
    fe = _fext(n, seed=17)
    w = jnp.asarray(np.random.default_rng(19).uniform(-1, 1, n))

    loss_diff = lambda q, qd, u, fe: jnp.dot(
        w, fd.forward_dynamics_diff(model, q, qd, u, f_ext=fe))
    loss_plain = lambda q, qd, u, fe: jnp.dot(
        w, fd.forward_dynamics(model, q, qd, u, f_ext=fe))
    g1 = jax.grad(loss_diff, argnums=(0, 1, 2, 3))(q, qd, u, fe)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(q, qd, u, fe)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)


def test_zero_fext_identity(iiwa):
    desc, _, model = iiwa
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=58))
    z = jnp.zeros((desc.n, 6))
    a = fd.forward_dynamics(model, q, qd, u)
    b = fd.forward_dynamics(model, q, qd, u, f_ext=z)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_api_batched_fext(iiwa):
    """api entries: batched f_ext through the vmap tier == per-state."""
    import gridcodegenerator_tpu as g
    desc, _, model = iiwa
    n = desc.n
    B = 4
    q, qd, u = map(jnp.asarray, random_state(n, seed=59, batch=(B,)))
    fe = jnp.asarray(np.random.default_rng(23).uniform(-5, 5, (B, n, 6)))
    got = g.forward_dynamics(model, q, qd, u, f_ext=fe)
    for b in range(B):
        ref = fd.forward_dynamics(model, q[b], qd[b], u[b], f_ext=fe[b])
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(ref),
                                   atol=1e-9)
    gfd = g.forward_dynamics_gradient(model, q, qd, u, f_ext=fe)
    ref0 = fd_grad.forward_dynamics_gradient(model, q[0], qd[0], u[0],
                                             f_ext=fe[0])
    np.testing.assert_allclose(np.asarray(gfd[0]), np.asarray(ref0),
                               atol=1e-9)
    gid = g.inverse_dynamics(model, q, qd, u, f_ext=fe)
    refi = rnea.inverse_dynamics(model, q[0], qd[0], u[0], f_ext=fe[0])
    np.testing.assert_allclose(np.asarray(gid[0]), np.asarray(refi),
                               atol=1e-9)


def test_fb_aba_fext_roundtrip():
    """Floating-base ABA with arm + base external wrenches: round trip
    against the free-flyer inverse dynamics (independent formulation)."""
    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import freeflyer as ff

    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.15)),
                              dtype=jnp.float64)
    n = ffm.n
    rng = np.random.default_rng(61)
    quat = jnp.asarray(rng.normal(size=4))
    quat = quat / jnp.linalg.norm(quat)
    q = jnp.asarray(rng.uniform(-1, 1, n))
    vb = jnp.asarray(rng.uniform(-0.5, 0.5, 6))
    qd = jnp.asarray(rng.uniform(-1, 1, n))
    tau = jnp.asarray(rng.uniform(-5, 5, n))
    fe = jnp.asarray(rng.uniform(-4, 4, (n, 6)))
    fb = jnp.asarray(rng.uniform(-10, 10, 6))

    ab, qdd = aba.fb_aba(ffm, quat, q, vb, qd, tau, f_ext=fe, f_base=fb)
    # Identity: the engine's fb FD convention is
    #   M [v̇b; q̈] = [−p_b + τ_ext_b; τ − c_j + τ_ext_q]
    # (fb_forward_dynamics assembly) with τ_ext the generalized projection
    # of the external wrenches — computed here INDEPENDENTLY via AD of the
    # instantaneous power P(vb, q̇) = ⟨f_base, vb⟩ + Σ ⟨f_ext_i, v_i⟩.
    X = ffm.arm.joint_transforms(q)
    R = ff.quat_to_rot(quat)
    M = ff.fb_mass_matrix(ffm, X)
    p_b, c_j = ff.fb_bias(ffm, X, R, vb, qd)
    lhs = M @ jnp.concatenate([ab, qdd]) + jnp.concatenate([p_b, c_j])

    def vel_power(vb_, qd_):
        from gridcodegenerator_tpu.ops.spatial import xform_apply
        arm = ffm.arm
        topo = arm.topology
        v = [None] * n
        P = jnp.dot(fb, vb_)
        for i in range(n):
            p = topo.parents[i]
            vp = vb_ if p < 0 else v[p]
            v[i] = xform_apply(X[i], vp) + arm.S[i] * qd_[i]
            P = P + jnp.dot(fe[i], v[i])
        return P

    tau_ext_b = jax.grad(vel_power, argnums=0)(vb, qd)
    tau_ext_q = jax.grad(vel_power, argnums=1)(vb, qd)
    rhs = jnp.concatenate([tau_ext_b, tau + tau_ext_q])
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-8)


# ---------------------------------------------------------------- steppers
def _hyq_env():
    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import freeflyer as ff

    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                              dtype=jnp.float64)
    feet = (2, 5, 8, 11)
    offs = np.tile([0.35, 0.0, 0.0], (4, 1))
    return ffm, feet, offs


def test_step_ground_push_freefall_matches_aba():
    """No contact (feet high above ground): one stepper dt with a base
    push equals the explicit-Euler step of fb_aba with the same f_base."""
    from gridcodegenerator_tpu.ops import contact as ct

    ffm, feet, offs = _hyq_env()
    n = ffm.n
    rng = np.random.default_rng(71)
    quat = jnp.asarray(rng.normal(size=4)); quat = quat / jnp.linalg.norm(quat)
    pos = jnp.asarray([0.0, 0.0, 5.0])            # far above the plane
    q = jnp.asarray(rng.uniform(-0.5, 0.5, n))
    vb = jnp.asarray(rng.uniform(-0.3, 0.3, 6))
    qd = jnp.asarray(rng.uniform(-0.3, 0.3, n))
    tau = jnp.asarray(rng.uniform(-5, 5, n))
    fb = jnp.asarray(rng.uniform(-30, 30, 6))
    dt = 1e-3

    (q2, p2, qq2, vb2, qd2), imp = ct.fb_step_ground(
        ffm, (quat, pos, q, vb, qd), tau, dt, feet, offs, f_base=fb)
    assert float(jnp.abs(imp).max()) == 0.0        # airborne
    from gridcodegenerator_tpu.ops import aba
    dvb, qdd = aba.fb_aba(ffm, quat, q, vb, qd, tau, f_base=fb)
    np.testing.assert_allclose(np.asarray(vb2), np.asarray(vb + dt * dvb),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(qd2), np.asarray(qd + dt * qdd),
                               atol=1e-10)


def test_step_ground_push_batched_matches_single():
    """Batched XLA body and fused-interpret kernel with per-env pushes ==
    the single-state path per environment."""
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops.kernels import contact_fused as cf

    ffm, feet, offs = _hyq_env()
    n = ffm.n
    B = 3
    rng = np.random.default_rng(73)
    quat = np.tile([1.0, 0, 0, 0], (B, 1))
    pos = np.column_stack([np.zeros((B, 2)), 0.55 + rng.uniform(0, .05, B)])
    q = np.tile([-0.1, 0.7, -1.2], (B, 4)) + rng.uniform(-0.05, .05, (B, n))
    vb = rng.uniform(-0.3, 0.3, (B, 6))
    qd = rng.uniform(-0.3, 0.3, (B, n))
    tau = rng.uniform(-8, 8, (B, n))
    push = rng.uniform(-40, 40, (B, 6))
    arr = lambda a: jnp.asarray(a, jnp.float64)
    state = tuple(map(arr, (quat, pos, q, vb, qd)))
    dt = 1e-3

    nxt, imp = ct.fb_step_ground_batched(ffm, state, arr(tau), dt, feet,
                                         offs, f_base=arr(push), impl="vmap")
    for b in range(B):
        sb = tuple(x[b] for x in state)
        nb, ib = ct.fb_step_ground(ffm, sb, arr(tau)[b], dt, feet, offs,
                                   f_base=arr(push)[b])
        for a_, r_ in zip((x[b] for x in nxt), nb):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(r_),
                                       atol=1e-9)
        np.testing.assert_allclose(np.asarray(imp[b]), np.asarray(ib),
                                   atol=1e-9)

    # fused kernel body (interpret mode) sees the same push operand
    flat = lambda x: arr(x).T
    outs = cf.step_ground_fused(ffm, flat(quat), flat(pos), flat(q),
                                flat(vb), flat(qd), flat(tau),
                                jnp.full((4, B), 0.8, jnp.float64), dt,
                                feet, offs, push=flat(push), interpret=True)
    q2k, p2k, qq2k, vb2k, qd2k, impk = outs
    np.testing.assert_allclose(np.asarray(vb2k.T), np.asarray(nxt[3]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(qd2k.T), np.asarray(nxt[4]),
                               atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(impk.T.reshape(B, len(feet), 3)), np.asarray(imp),
        atol=1e-9)


def test_step_ground_push_zero_identity():
    from gridcodegenerator_tpu.ops import contact as ct

    ffm, feet, offs = _hyq_env()
    n = ffm.n
    B = 2
    rng = np.random.default_rng(74)
    state = (jnp.asarray(np.tile([1.0, 0, 0, 0], (B, 1))),
             jnp.asarray(np.column_stack([np.zeros((B, 2)),
                                          np.full(B, 0.5)])),
             jnp.asarray(np.tile([-0.1, 0.7, -1.2], (B, 4))),
             jnp.asarray(rng.uniform(-0.2, 0.2, (B, 6))),
             jnp.asarray(rng.uniform(-0.2, 0.2, (B, n))))
    tau = jnp.asarray(rng.uniform(-5, 5, (B, n)))
    a = ct.fb_step_ground_batched(ffm, state, tau, 1e-3, feet, offs,
                                  impl="vmap")
    b = ct.fb_step_ground_batched(ffm, state, tau, 1e-3, feet, offs,
                                  impl="vmap", f_base=jnp.zeros((B, 6)))
    for x, y in zip(a[0], b[0]):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_env_push_fb_vs_md():
    """env.step(push=) through BOTH pipelines on the same freejoint doc:
    the fb path's f_base equals the md path's base generalized-force rows."""
    import re

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu import envs
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import md_contact as mc
    from gridcodegenerator_tpu.ops import multidof as md

    src = re.sub(r"<actuator>.*</actuator>", "",
                 zoo.ant_mjcf().replace('<body name="torso">',
                                        '<body name="torso"><freejoint/>',
                                        1), flags=re.S)
    env = envs.make_ground_env(src, dt=1e-3, iters=15, use_limits=False,
                               dtype=jnp.float64)
    assert env.kind == "fb"
    B = 2
    s = env.reset(B, seed=11)
    rng = np.random.default_rng(12)
    ctrl = jnp.asarray(rng.uniform(-2, 2, (B, env.n_ctrl)))
    push = jnp.asarray(rng.uniform(-25, 25, (B, 6)))
    (q2, p2, qj2, vb2, qd2), imp = env.step(s, ctrl, push=push)

    desc = g.parse_mjcf(src)
    mdm = md.multidof_model_from_description(desc, dtype=jnp.float64)
    sites = g.mjcf_sites(src)
    feet_md = tuple(sites[f"foot{k}"].link for k in range(4))
    offs = np.stack([sites[f"foot{k}"].pos for k in range(4)])
    q_md = jnp.concatenate([s[0], s[1], s[2]], axis=1)
    qd_md = jnp.concatenate([s[3], s[4]], axis=1)
    tau_md = jnp.concatenate([push, ctrl], axis=1)
    (q2m, qd2m), impm = mc.md_step_ground_batched(
        mdm, q_md, qd_md, tau_md, env.dt, feet_md, offs, mu=env.mu,
        iters=env.iters)
    np.testing.assert_allclose(np.asarray(qd2m[:, :6]), np.asarray(vb2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(qd2m[:, 6:]), np.asarray(qd2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(impm), np.asarray(imp), atol=1e-6)


# ------------------------------------------------------------ dry friction
def test_frictionloss_stiction_and_sliding():
    """Joint dry friction as box impulse rows: airborne 1-joint analytic
    check — below the breakaway bound the joint STOPS exactly (stiction);
    above it, the step removes exactly the bound impulse (sliding)."""
    from gridcodegenerator_tpu.ops import contact as ct
    import gridcodegenerator_tpu as g

    u = """<robot name="p"><link name="base"><inertial><mass value="1"/>
    <inertia ixx="1" iyy="1" izz="1" ixy="0" ixz="0" iyz="0"/></inertial>
    </link><link name="l1"><inertial><origin xyz="0 0 0"/><mass value="2"/>
    <inertia ixx=".4" iyy=".4" izz=".4" ixy="0" ixz="0" iyz="0"/></inertial>
    </link><joint name="j1" type="revolute"><parent link="base"/>
    <child link="l1"/><axis xyz="0 0 1"/>
    <dynamics friction="0.5"/></joint></robot>"""
    desc = g.parse_urdf(u)
    from gridcodegenerator_tpu.ops import freeflyer as ff
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    dt = 1e-2
    feet, offs = (0,), np.zeros((1, 3))
    quat = jnp.asarray([1.0, 0, 0, 0])
    pos = jnp.asarray([0.0, 0.0, 9.0])          # airborne
    q = jnp.zeros(1)
    fl = desc.frictionloss                      # (1,) = 0.5 N·m

    def one(qd0, vb0=None):
        vb = jnp.zeros(6) if vb0 is None else vb0
        (q2, p2, qq2, vb2, qd2), _ = ct.fb_step_ground(
            ffm, (quat, pos, q, vb, jnp.asarray([qd0])), jnp.zeros(1),
            dt, feet, offs, gravity=0.0, frictionloss=fl, iters=100)
        return float(qd2[0])

    # joint inertia about z at q=0: a spinning joint drags the base too
    # (free-floating), so use the APPARENT inertia from the solver itself:
    # measured slide decrement must equal bound/I_app, with I_app from a
    # reference no-friction step comparison at unit torque.
    # Stiction: tiny velocity → zero after one step (to the Delassus
    # Tikhonov floor, G += 1e-9·I — not bitwise zero)
    assert abs(one(1e-3)) < 1e-10
    assert abs(one(-1e-3)) < 1e-10
    # Sliding: large velocity → decrement equal to the breakaway decrement
    d_fast = 3.0 - one(3.0)
    d_slow = 2.0 - one(2.0)
    assert d_fast > 0 and abs(d_fast - d_slow) < 1e-10  # constant torque
    # direction opposes motion
    assert one(-3.0) > -3.0


def test_frictionloss_batched_matches_single_and_grad():
    from gridcodegenerator_tpu.ops import contact as ct

    ffm, feet, offs = _hyq_env()
    n = ffm.n
    fl = np.zeros(n)
    fl[[0, 3, 7]] = [0.4, 0.8, 0.2]             # sparse static losses
    B = 3
    rng = np.random.default_rng(81)
    quat = np.tile([1.0, 0, 0, 0], (B, 1))
    pos = np.column_stack([np.zeros((B, 2)), 0.55 + rng.uniform(0, .05, B)])
    q = np.tile([-0.1, 0.7, -1.2], (B, 4))
    vb = rng.uniform(-0.3, 0.3, (B, 6))
    qd = rng.uniform(-0.3, 0.3, (B, n))
    tau = rng.uniform(-8, 8, (B, n))
    arr = lambda a: jnp.asarray(a, jnp.float64)
    state = tuple(map(arr, (quat, pos, q, vb, qd)))

    nxt, imp = ct.fb_step_ground_batched(ffm, state, arr(tau), 1e-3, feet,
                                         offs, frictionloss=fl,
                                         impl="vmap")
    for b in range(B):
        sb = tuple(x[b] for x in state)
        nb, _ = ct.fb_step_ground(ffm, sb, arr(tau)[b], 1e-3, feet, offs,
                                  frictionloss=fl)
        for a_, r_ in zip((x[b] for x in nxt), nb):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(r_),
                                       atol=1e-9)

    # differentiable in the loss (friction identification) through the
    # implicit-diff path: gradient matches central finite differences.
    # Airborne state with every joint firmly SLIDING (impulse pinned at
    # its bound, away from the stick/slide kink) — there the post-step
    # velocity is LINEAR in the loss and the IFT gradient is exact.
    sb = (arr(quat)[0], jnp.asarray([0.0, 0.0, 9.0]),   # far above ground
          arr(q)[0], arr(vb)[0],
          jnp.asarray(np.full(n, 2.0)))                 # fast joints

    def loss(fl_):
        (q2, p2, qq2, vb2, qd2), _ = ct.fb_step_ground(
            ffm, sb, jnp.zeros(n), 1e-3, feet, offs, frictionloss=fl_,
            diff_mode="implicit", iters=120)
        return jnp.sum(qd2 ** 2)

    flj = jnp.asarray(fl + 0.05)                # all-positive (traced path)
    gr = jax.grad(loss)(flj)
    eps = 1e-6
    for j in (0, 3):
        e = jnp.zeros(n).at[j].set(eps)
        fd = (loss(flj + e) - loss(flj - e)) / (2 * eps)
        np.testing.assert_allclose(float(gr[j]), float(fd), rtol=1e-6,
                                   atol=1e-10)


def test_frictionloss_zero_identity():
    from gridcodegenerator_tpu.ops import contact as ct

    ffm, feet, offs = _hyq_env()
    n = ffm.n
    B = 2
    rng = np.random.default_rng(83)
    state = (jnp.asarray(np.tile([1.0, 0, 0, 0], (B, 1))),
             jnp.asarray(np.column_stack([np.zeros((B, 2)),
                                          np.full(B, 0.5)])),
             jnp.asarray(np.tile([-0.1, 0.7, -1.2], (B, 4))),
             jnp.asarray(rng.uniform(-0.2, 0.2, (B, 6))),
             jnp.asarray(rng.uniform(-0.2, 0.2, (B, n))))
    tau = jnp.asarray(rng.uniform(-5, 5, (B, n)))
    a = ct.fb_step_ground_batched(ffm, state, tau, 1e-3, feet, offs,
                                  impl="vmap")
    b = ct.fb_step_ground_batched(ffm, state, tau, 1e-3, feet, offs,
                                  impl="vmap", frictionloss=np.zeros(n))
    for x, y in zip(a[0], b[0]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
