"""Fixed tendons (MJCF ``<tendon><fixed>``): parsing, passive
spring/damper forces, actuator tendon transmission, range (limit) rows in
the contact solve on both stepper routes, and tendon sensors.

No reference analog: the reference consumes a bare URDFParser robot with
no coupling/actuation layer (``/root/reference/README.md:8``) — this is
front-end/constraint surface beyond the reference, mirroring MuJoCo's
fixed-tendon semantics (L = Σ coef·q, passive F = −k(L−L0) − b·L̇,
range rows in the constraint solve, gear-scaled transmission)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gridcodegenerator_tpu.models.mjcf import mjcf_actuators, mjcf_tendons
from gridcodegenerator_tpu.envs import make_ground_env
from gridcodegenerator_tpu.ops import contact as ct
from gridcodegenerator_tpu.ops import freeflyer as ff
import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo

DOC = """
<mujoco model="tendon-test">
  <compiler angle="radian"/>
  <default>
    <tendon stiffness="5" damping="0.5"/>
  </default>
  <worldbody>
    <body name="b1" pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 0 1"/>
      <inertial pos="0 0 0" mass="1" diaginertia="0.1 0.1 0.1"/>
      <body name="b2" pos="0.5 0 0">
        <joint name="j2" type="hinge" axis="0 0 1"/>
        <inertial pos="0 0 0" mass="1" diaginertia="0.1 0.1 0.1"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="coupler" range="-0.4 0.4" springlength="0.1">
      <joint joint="j1" coef="1"/>
      <joint joint="j2" coef="-1"/>
    </fixed>
    <fixed name="free_t">
      <joint joint="j2" coef="2"/>
    </fixed>
  </tendon>
  <actuator>
    <motor name="mt" tendon="coupler" gear="3" ctrlrange="-1 1"/>
    <motor name="mj" joint="j1" gear="2"/>
    <position name="pt" tendon="free_t" kp="10"/>
  </actuator>
</mujoco>
"""

WALKER = """
<mujoco model="tendon-walker">
  <compiler angle="radian"/>
  <worldbody>
    <body name="torso" pos="0 0 0.5">
      <freejoint/>
      <inertial pos="0 0 0" mass="5" diaginertia="0.1 0.1 0.1"/>
      <body name="thigh" pos="0.2 0 0">
        <joint name="hip" type="hinge" axis="0 1 0"/>
        <inertial pos="0 0 -0.1" mass="1" diaginertia="0.02 0.02 0.02"/>
        <body name="shin" pos="0 0 -0.25">
          <joint name="knee" type="hinge" axis="0 1 0"/>
          <inertial pos="0 0 -0.1" mass="0.5"
                    diaginertia="0.01 0.01 0.01"/>
          <site name="foot1" pos="0 0 -0.25"/>
        </body>
      </body>
      <body name="thigh2" pos="-0.2 0 0">
        <joint name="hip2" type="hinge" axis="0 1 0"/>
        <inertial pos="0 0 -0.1" mass="1" diaginertia="0.02 0.02 0.02"/>
        <body name="shin2" pos="0 0 -0.25">
          <joint name="knee2" type="hinge" axis="0 1 0"/>
          <inertial pos="0 0 -0.1" mass="0.5"
                    diaginertia="0.01 0.01 0.01"/>
          <site name="foot2" pos="0 0 -0.25"/>
        </body>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="hipsync" range="-0.3 0.3">
      <joint joint="hip" coef="1"/>
      <joint joint="hip2" coef="-1"/>
    </fixed>
    <fixed name="kneespring" stiffness="20" damping="1">
      <joint joint="knee" coef="1"/>
    </fixed>
  </tendon>
  <actuator>
    <motor name="a_hip" joint="hip" gear="1"/>
    <motor name="a_sync" tendon="hipsync" gear="2"/>
    <motor name="a_knee2" joint="knee2"/>
  </actuator>
  <sensor>
    <tendonpos name="tp" tendon="hipsync"/>
    <tendonvel name="tv" tendon="hipsync"/>
  </sensor>
</mujoco>
"""


# ------------------------------------------------------------------ parsing
def test_parse_tendons():
    t = mjcf_tendons(DOC)
    assert t.names == ("coupler", "free_t")
    np.testing.assert_allclose(t.coef, [[1.0, -1.0], [0.0, 2.0]])
    np.testing.assert_allclose(t.lo, [-0.4, -np.inf])
    np.testing.assert_allclose(t.hi, [0.4, np.inf])
    # <default><tendon> class resolution
    np.testing.assert_allclose(t.stiffness, [5.0, 5.0])
    np.testing.assert_allclose(t.damping, [0.5, 0.5])
    np.testing.assert_allclose(t.springlength, [0.1, 0.0])
    np.testing.assert_array_equal(t.limited, [True, False])
    A, lo, hi = t.stepper_rows()
    np.testing.assert_allclose(A, [[1.0, -1.0]])


def test_passive_law():
    t = mjcf_tendons(DOC)
    q = np.array([0.3, 0.1])
    qd = np.array([0.2, -0.1])
    L = t.coef @ q
    V = t.coef @ qd
    F = -(t.stiffness * (L - t.springlength) + t.damping * V)
    np.testing.assert_allclose(t.passive_force(q, qd), F)
    np.testing.assert_allclose(t.passive_torque(q, qd), F @ t.coef)


def test_actuator_tendon_transmission():
    a = mjcf_actuators(DOC)
    np.testing.assert_array_equal(a.tendon, [0, -1, 1])
    np.testing.assert_array_equal(a.joint, [-1, 0, -1])
    # moment rows: gear·coef for tendon actuators, gear·e_j for joint
    np.testing.assert_allclose(a.moment,
                               [[3.0, -3.0], [2.0, 0.0], [0.0, 2.0]])
    np.testing.assert_allclose(a.gear_matrix(), np.asarray(a.moment).T)
    q = np.array([0.3, 0.1])
    qd = np.array([0.2, -0.1])
    ctrl = np.array([0.5, 1.0, 0.2])
    # mt: f = 0.5 (ctrl clamp inactive); mj: f = 1;
    # pt (position servo on tendon length): f = 10·(0.2 − moment·q)
    exp = (0.5 * np.array([3.0, -3.0]) + 1.0 * np.array([2.0, 0.0])
           + 10.0 * (0.2 - 2.0 * q[1]) * np.array([0.0, 2.0]))
    np.testing.assert_allclose(a.torque(ctrl, q, qd), exp)


def test_parse_rejects():
    bad_spatial = DOC.replace('<fixed name="coupler"', '<spatial ') \
                     .replace("</fixed>", "</spatial>", 1)
    with pytest.raises(NotImplementedError):
        mjcf_tendons(bad_spatial)
    with pytest.raises(ValueError):
        mjcf_tendons(DOC.replace('joint="j2" coef="-1"',
                                 'joint="nope" coef="-1"'))
    with pytest.raises(NotImplementedError):
        mjcf_tendons(DOC.replace('springlength="0.1"',
                                 'springlength="0.1 0.3"'))
    # MuJoCo compile-error surface this parser must not silently absorb
    # (ADVICE r4): negative springlength other than the -1 sentinel;
    # duplicate <joint> rows; limited="true" without a usable range;
    # consumed-but-unimplemented attributes (dry friction etc.)
    with pytest.raises(ValueError, match="springlength"):
        mjcf_tendons(DOC.replace('springlength="0.1"',
                                 'springlength="-0.5"'))
    td = mjcf_tendons(DOC.replace('springlength="0.1"',
                                  'springlength="-1"'))  # sentinel: L(q0)=0
    assert td.springlength[0] == 0.0
    with pytest.raises(ValueError, match="more than once"):
        mjcf_tendons(DOC.replace('<joint joint="j2" coef="-1"/>',
                                 '<joint joint="j1" coef="-1"/>'))
    with pytest.raises(ValueError, match="limited"):
        mjcf_tendons(DOC.replace('range="-0.4 0.4"', 'limited="true"'))
    with pytest.raises(NotImplementedError, match="frictionloss"):
        mjcf_tendons(DOC.replace('springlength="0.1"',
                                 'frictionloss="0.3"'))


def test_ball_joint_coef_rejected():
    doc = DOC.replace('<joint name="j2" type="hinge" axis="0 0 1"/>',
                      '<joint name="j2" type="ball"/>')
    with pytest.raises(ValueError, match="scalar"):
        mjcf_tendons(doc)


# --------------------------------------------------- stepper range rows (fb)
def _fb_fixture():
    desc = g.parse_urdf(zoo.serial_chain(2, damping=0.1))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    n = ffm.n
    state = (jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0, 0.6]),
             jnp.zeros(n), jnp.zeros(6), jnp.zeros(n))
    links = (n - 1,)
    offs = np.array([[0.0, 0, -0.2]])
    return ffm, state, links, offs


def test_single_joint_tendon_equals_joint_limit():
    """A one-joint tendon with coef 1 IS that joint's limit — the two row
    machineries must produce the same step to solver precision."""
    ffm, state, links, offs = _fb_fixture()
    n = ffm.n
    tau = jnp.zeros(n).at[0].set(8.0)
    lo = np.full(n, -np.inf)
    hi = np.full(n, np.inf)
    lo[0], hi[0] = -0.2, 0.2
    A = np.zeros((1, n))
    A[0, 0] = 1.0
    st_lim, st_tnd = state, state
    for _ in range(30):
        st_lim, _ = ct.fb_step_ground(ffm, st_lim, tau, 1e-3, links, offs,
                                      limits=(lo, hi),
                                      limit_mode="impulse")
        st_tnd, _ = ct.fb_step_ground(
            ffm, st_tnd, tau, 1e-3, links, offs,
            tendons=(A, np.array([-0.2]), np.array([0.2])))
    for a, b in zip(st_lim, st_tnd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-10)
    assert float(st_tnd[2][0]) < 0.21


def test_coupled_tendon_holds_range():
    """L = q0 + q1 range-limited: a hard push on both joints must stop at
    the bound even though each joint alone is unlimited."""
    ffm, state, links, offs = _fb_fixture()
    n = ffm.n
    tau = jnp.zeros(n).at[0].set(8.0).at[1].set(8.0)
    A = np.zeros((1, n))
    A[0, 0] = 1.0
    A[0, 1] = 1.0
    tend = (A, np.array([-0.05]), np.array([0.05]))

    def body(s, _):
        s2, _ = ct.fb_step_ground(ffm, s, tau, 1e-3, links, offs,
                                  tendons=tend)
        return s2, None

    st = jax.jit(lambda s: jax.lax.scan(body, s, None, length=120)[0])(
        state)
    L = float(st[2][0] + st[2][1])
    assert L < 0.08, L
    # and without the tendon the same push runs far past the bound
    def body2(s, _):
        s2, _ = ct.fb_step_ground(ffm, s, tau, 1e-3, links, offs)
        return s2, None
    st2 = jax.jit(lambda s: jax.lax.scan(body2, s, None, length=120)[0])(
        state)
    assert float(st2[2][0] + st2[2][1]) > 3 * L


def test_batched_matches_single():
    ffm, state, links, offs = _fb_fixture()
    n = ffm.n
    rng = np.random.default_rng(3)
    tau = jnp.asarray(rng.uniform(-2, 2, n))
    A = np.zeros((1, n))
    A[0, 0], A[0, 1] = 1.0, 1.0
    tend = (A, np.array([-0.05]), np.array([0.05]))
    B = 3
    stB = tuple(jnp.tile(x[None], (B,) + (1,) * x.ndim) for x in state)
    tauB = jnp.tile(tau[None], (B, 1))
    nb, _ = ct.fb_step_ground_batched(ffm, stB, tauB, 1e-3, links, offs,
                                      tendons=tend)
    ns, _ = ct.fb_step_ground(ffm, state, tau, 1e-3, links, offs,
                              tendons=tend)
    for a, b in zip(nb, ns):
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b),
                                   atol=1e-12)


def test_tendon_rows_differentiable():
    """d(step)/d(τ) through an ACTIVE tendon row stays finite and matches
    finite differences (the row enters the PGS like any limit row)."""
    ffm, state, links, offs = _fb_fixture()
    n = ffm.n
    A = np.zeros((1, n))
    A[0, 0] = 1.0
    tend = (A, np.array([-0.01]), np.array([0.01]))  # active immediately

    def out(t0):
        tau = jnp.zeros(n).at[0].set(t0)
        st = state
        for _ in range(3):
            st, _ = ct.fb_step_ground(ffm, st, tau, 1e-3, links, offs,
                                      tendons=tend)
        return st[2][0]

    grad = float(jax.grad(out)(4.0))
    eps = 1e-5
    fd = (float(out(4.0 + eps)) - float(out(4.0 - eps))) / (2 * eps)
    assert np.isfinite(grad)
    np.testing.assert_allclose(grad, fd, rtol=2e-4, atol=1e-9)


# ------------------------------------------------------------- env layer
def test_env_fb_end_to_end():
    env = make_ground_env(WALKER, dt=2e-3)
    assert env.kind == "fb" and env.n_ctrl == 3
    A_q, A_v, lo, hi = env.tendons
    np.testing.assert_allclose(A_v, [[1.0, 0.0, -1.0, 0.0]])
    np.testing.assert_allclose([lo[0], hi[0]], [-0.3, 0.3])
    assert env.tendon_passive is not None
    np.testing.assert_allclose(env.act_moment_v,
                               [[1, 0, 0, 0], [2, 0, -2, 0],
                                [0, 0, 0, 1]])
    st = env.reset(2, seed=1)
    ctrl = jnp.zeros((2, 3))
    st2, imp = env.step(st, ctrl)
    sd = env.sensordata(st2, prev_state=st, impulses=imp, ctrl=ctrl)
    q = np.asarray(st2[2])
    np.testing.assert_allclose(np.asarray(sd[:, 0]), q[:, 0] - q[:, 2],
                               atol=1e-5)
    qd = np.asarray(st2[4])
    np.testing.assert_allclose(np.asarray(sd[:, 1]), qd[:, 0] - qd[:, 2],
                               atol=1e-5)


def test_env_passive_spring_damps_knee():
    """The knee spring (stiffness 20 toward 0) must pull a bent knee back
    relative to the no-tendon document."""
    env = make_ground_env(WALKER, dt=2e-3, init_height=1.5)  # airborne
    bare = make_ground_env(
        WALKER.replace('stiffness="20" damping="1"',
                       'stiffness="0" damping="0"'),
        dt=2e-3, init_height=1.5)
    n = env.model.n
    st = env.reset(1, seed=0, pos_noise=0.0, vel_noise=0.0,
                   height_noise=0.0)
    st = (st[0], st[1], st[2].at[:, 1].set(0.8), st[3], st[4])  # bend knee
    ctrl = jnp.zeros((1, 3))
    s_env, s_bare = st, st
    for _ in range(25):
        s_env, _ = env.step(s_env, ctrl)
        s_bare, _ = bare.step(s_bare, ctrl)
    assert float(s_env[2][0, 1]) < float(s_bare[2][0, 1]) - 1e-3


def test_env_md_route():
    doc = WALKER.replace(
        '<joint name="hip2" type="hinge" axis="0 1 0"/>',
        '<joint name="hip2" type="ball"/>').replace(
        '<fixed name="hipsync" range="-0.3 0.3">\n      '
        '<joint joint="hip" coef="1"/>\n      '
        '<joint joint="hip2" coef="-1"/>\n    </fixed>',
        '<fixed name="hipsync" range="-0.3 0.3">\n      '
        '<joint joint="hip" coef="1"/>\n      '
        '<joint joint="knee" coef="1"/>\n    </fixed>').replace(
        '<motor name="a_knee2" joint="knee2"/>', '')
    env = make_ground_env(doc, dt=2e-3)
    assert env.kind == "md"
    A_q, A_v, lo, hi = env.tendons
    assert A_q.shape == (1, env.model.nq)
    assert A_v.shape == (1, env.model.nv)
    # the hip/knee scalar coordinates carry the coefs, ball slots zero
    assert np.count_nonzero(A_q) == 2 and np.count_nonzero(A_v) == 2
    st = env.reset(2, seed=0)
    ctrl = jnp.zeros((2, env.n_ctrl))
    st2, imp = env.step(st, ctrl)
    sd = env.sensordata(st2, prev_state=st, impulses=imp, ctrl=ctrl)
    L = np.asarray(st2[0]) @ np.asarray(A_q[0])
    np.testing.assert_allclose(np.asarray(sd[:, 0]), L, atol=1e-5)


def test_env_root_tendon_actuator_rejected():
    doc = WALKER.replace('<motor name="a_hip" joint="hip" gear="1"/>',
                         '')
    # a hand-built moment on the root column must be rejected on demote
    from gridcodegenerator_tpu.envs import _joint_matrix_to_env
    from gridcodegenerator_tpu.ops.freeflyer import free_flyer_model
    desc = g.parse_mjcf(doc)
    with pytest.raises(ValueError, match="root free joint"):
        _joint_matrix_to_env(np.eye(len(desc.joint_types)), "fb", None,
                             True)
