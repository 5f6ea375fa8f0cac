"""Multi-dof ground contact (ops/md_contact.py): the generalized-coordinate
steppers must reproduce the free-flyer stepper on floating+1-dof robots
(two independent formulations of identical physics), satisfy the contact
complementarity/envelope identities on genuinely multi-dof (ball-joint)
robots, and compose with the MJCF front-end (freejoint + ball hips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import contact as ct
from gridcodegenerator_tpu.ops import md_contact as mc
from gridcodegenerator_tpu.ops import multidof as md
from gridcodegenerator_tpu.ops.freeflyer import free_flyer_model

jax.config.update("jax_enable_x64", True)

pytestmark = pytest.mark.mid

_FEET_FF = (2, 5, 8, 11)
_OFF = np.tile([0.35, 0.0, 0.0], (4, 1))


@pytest.fixture(scope="module")
def hyq_pair():
    urdf = zoo.hyq(damping=0.2)
    ffm = free_flyer_model(g.parse_urdf(urdf), dtype=jnp.float64)
    mdm = md.multidof_model_from_description(
        g.parse_urdf(zoo.with_free_joint(urdf)), dtype=jnp.float64)
    return ffm, mdm


def _rand_state(n, rng):
    quat = rng.standard_normal(4)
    quat /= np.linalg.norm(quat)
    quat = 0.9 * np.array([1.0, 0, 0, 0]) + 0.1 * quat   # mostly upright
    quat /= np.linalg.norm(quat)
    pos = np.array([*rng.uniform(-0.1, 0.1, 2), rng.uniform(0.3, 0.45)])
    q = np.tile([-0.1, 0.7, -1.2], 4) + rng.uniform(-0.1, 0.1, n)
    vb = rng.uniform(-0.4, 0.4, 6)
    qd = rng.uniform(-0.4, 0.4, n)
    tau = rng.uniform(-8, 8, n)
    return quat, pos, q, vb, qd, tau


def test_md_step_ground_matches_freeflyer(hyq_pair):
    """Floating+hinge HyQ: md_step_ground == fb_step_ground — the generic
    tangent-space formulation vs the dedicated free-flyer pipeline. The
    velocity solve (M, bias, J, PGS) must agree to round-off; the
    configuration update differs at O(dt²) (md_tangent_apply translates
    with the PRE-update attitude, the ff integrator with the post-update
    one — both first-order consistent)."""
    ffm, mdm = hyq_pair
    n = ffm.n
    links_md = tuple(l + 1 for l in _FEET_FF)    # free joint shifts links
    rng = np.random.default_rng(3)
    touched = 0
    for trial in range(4):
        quat, pos, q, vb, qd, tau = _rand_state(n, rng)
        dt = 1e-3
        (q2, v2), imp_md = mc.md_step_ground(
            mdm, jnp.asarray(np.concatenate([quat, pos, q])),
            jnp.asarray(np.concatenate([vb, qd])),
            jnp.asarray(np.concatenate([np.zeros(6), tau])),
            dt, links_md, _OFF, mu=0.7)
        st = tuple(jnp.asarray(a) for a in (quat, pos, q, vb, qd))
        nxt, imp_ff = ct.fb_step_ground(ffm, st, jnp.asarray(tau), dt,
                                        _FEET_FF, _OFF, mu=0.7)
        np.testing.assert_allclose(np.asarray(imp_md), np.asarray(imp_ff),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(v2[:6]), np.asarray(nxt[3]),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(v2[6:]), np.asarray(nxt[4]),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(q2[:4]), np.asarray(nxt[0]),
                                   atol=1e-9)
        # position: O(dt²·ω·v) integrator-order difference — impact-spiked
        # velocities reach ~|ω||v| ≈ 1.3 here, so dt² · 1.3 ≈ 1.3e-6
        np.testing.assert_allclose(np.asarray(q2[4:7]), np.asarray(nxt[1]),
                                   atol=5e-6)
        np.testing.assert_allclose(np.asarray(q2[7:]), np.asarray(nxt[2]),
                                   atol=1e-9)
        touched += int(np.abs(np.asarray(imp_ff)).max() > 1e-9)
    assert touched >= 2, "too few active-contact trials — vacuous"


def test_md_constrained_fd_matches_freeflyer_stance(hyq_pair):
    """Bilateral stance FD: md_constrained_fd == the ff stance solver at
    matched Baumgarte settings (drift-rate terms measured against the
    current anchors in both)."""
    ffm, mdm = hyq_pair
    n = ffm.n
    links_md = tuple(l + 1 for l in _FEET_FF)
    rng = np.random.default_rng(5)
    quat, pos, q, vb, qd, tau = _rand_state(n, rng)
    acc_md, lam_md = mc.md_constrained_fd(
        mdm, jnp.asarray(np.concatenate([quat, pos, q])),
        jnp.asarray(np.concatenate([vb, qd])),
        jnp.asarray(np.concatenate([np.zeros(6), tau])),
        links_md, _OFF, baumgarte=(2.0, 0.0))
    dvb, qdd, lam_ff = ct.fb_constrained_forward_dynamics(
        ffm, jnp.asarray(quat), jnp.asarray(pos), jnp.asarray(q),
        jnp.asarray(vb), jnp.asarray(qd), jnp.asarray(tau),
        _FEET_FF, _OFF, baumgarte=(2.0, 0.0))
    np.testing.assert_allclose(np.asarray(acc_md[:6]), np.asarray(dvb),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(acc_md[6:]), np.asarray(qdd),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(lam_md), np.asarray(lam_ff).ravel(),
                               atol=1e-6)


def _ball_ant():
    """MJCF quadruped with a freejoint torso, BALL hips, hinge knees —
    the genuinely multi-dof contact robot (nq=21+7? → parse decides), via
    the MJCF front-end: the full intake→md→contact composition."""
    legs = []
    for k in range(4):
        ang = 45 + 90 * k
        legs.append(f"""
      <body name="hip{k}" pos="0.18 0 0" euler="0 0 {ang}">
        <joint name="hip{k}_j" type="ball" damping="1.2"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.22 0 0"/>
        <body name="shin{k}" pos="0.22 0 0">
          <joint name="knee{k}_j" axis="0 1 0" damping="1.2"/>
          <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0"/>
          <site name="foot{k}" pos="0.3 0 0"/>
        </body>
      </body>""")
    return f"""
<mujoco model="ball_ant"><compiler angle="degree"/>
  <default><geom density="800"/></default>
  <worldbody>
    <body name="torso">
      <freejoint/>
      <geom type="sphere" size="0.18" density="500"/>
      {''.join(legs)}
    </body>
  </worldbody>
</mujoco>"""


@pytest.fixture(scope="module")
def ball_ant():
    src = _ball_ant()
    desc = g.parse_mjcf(src)
    mdm = md.multidof_model_from_description(desc, dtype=jnp.float64)
    sites = g.mjcf_sites(src)
    feet = tuple(sites[f"foot{k}"].link for k in range(4))
    offs = np.stack([sites[f"foot{k}"].pos for k in range(4)])
    return mdm, feet, offs


def test_ball_ant_layout(ball_ant):
    mdm, feet, offs = ball_ant
    # free joint (7/6) + 4 ball hips (4/3) + 4 hinge knees (1/1)
    assert mdm.nq == 7 + 4 * 4 + 4 and mdm.nv == 6 + 4 * 3 + 4
    assert mdm.joint_types[0] == "floating"
    assert mdm.joint_types.count("spherical") == 4


def test_md_gap_gradient_is_normal_row(ball_ant):
    """Envelope identity on the ball-joint robot: d(gap)/dt along the
    tangent flow equals the normal rows times the tangent — validates
    md_point_jacobian's multi-column blocks (ball: 3, free: 6)."""
    mdm, feet, offs = ball_ant
    rng = np.random.default_rng(11)
    q0 = md.neutral_q(mdm)
    v = jnp.asarray(rng.uniform(-0.5, 0.5, mdm.nv))
    q = md.md_tangent_apply(mdm, q0, jnp.asarray(
        rng.uniform(-0.3, 0.3, mdm.nv)))

    def gaps_at(t):
        return mc.md_contact_rows(mdm, md.md_tangent_apply(mdm, q, t * v),
                                  feet, offs)[0]

    _, dgap = jax.jvp(gaps_at, (0.0,), (1.0,))
    _, J = mc.md_contact_rows(mdm, q, feet, offs)
    np.testing.assert_allclose(np.asarray(dgap), np.asarray(J[2::3] @ v),
                               atol=1e-9)


def test_ball_ant_drops_and_settles(ball_ant):
    """Physics: the ball-hip ant (no joint limits, no actuation — the
    unlimited ball hips splay until the belly lands) dropped above the
    plane settles onto its torso sphere (a ground geom, r = 0.18):
    penetrations recover to the margin scale, normal impulses are
    non-negative (pushing only), and motion stops (energy decays under
    damping + friction)."""
    from gridcodegenerator_tpu.ops import collision as col

    mdm, feet, offs = ball_ant
    nq, nv = mdm.nq, mdm.nv
    gg = col.make_geoms([0], a=[[0, 0, 0]], r=0.18, dtype=jnp.float64)
    q0 = np.array(md.neutral_q(mdm))
    q0[6] = 0.45                         # drop height (free-joint z)
    step = jax.jit(lambda q, qd: mc.md_step_ground(
        mdm, q, qd, jnp.zeros(nv), 2e-3, feet, offs, mu=0.8,
        ground_geoms=gg, mu_ground=0.8))
    q, qd = jnp.asarray(q0), jnp.zeros(nv)
    e0 = float(md.md_energy(mdm, q, qd))
    for _ in range(1400):
        (q, qd), imp = step(q, qd)
    imp = np.asarray(imp)
    assert imp.shape == (5, 3)
    assert (imp[:, 2] >= 0).all()
    gaps, _ = mc.md_contact_rows(mdm, q, feet, offs, geoms=gg)
    assert float(jnp.min(gaps)) > -5e-3, "sank through the plane"
    # belly rest: torso center near its radius above ground
    assert 0.1 < float(q[6]) < 0.25, "torso fell through / bounced away"
    # mostly settled (the sphere-belly rock decays through friction alone,
    # so allow residual swing); the strong statements are the gap,
    # impulse-sign, and energy ones
    assert float(jnp.abs(qd).max()) < 0.8
    assert imp[:, 2].max() > 1e-3
    assert float(md.md_energy(mdm, q, qd)) < e0


def test_md_step_ground_batched_matches_single(ball_ant):
    mdm, feet, offs = ball_ant
    rng = np.random.default_rng(17)
    B = 3
    q0 = np.array(md.neutral_q(mdm))
    qs, qds, taus = [], [], []
    for e in range(B):
        d = rng.uniform(-0.2, 0.2, mdm.nv)
        qe = np.array(md.md_tangent_apply(mdm, jnp.asarray(q0),
                                          jnp.asarray(d)))
        qe[6] = rng.uniform(-0.02, 0.05)  # feet at torso height: touch
        qs.append(qe)
        qds.append(rng.uniform(-0.3, 0.3, mdm.nv))
        taus.append(rng.uniform(-2, 2, mdm.nv))
    qs, qds, taus = (jnp.asarray(np.stack(a)) for a in (qs, qds, taus))
    mus = jnp.asarray(rng.uniform(0.4, 1.0, B))
    (q2, v2), imp = mc.md_step_ground_batched(mdm, qs, qds, taus, 5e-3,
                                              feet, offs, mu=mus)
    assert imp.shape == (B, 4, 3)
    touched = 0
    for e in range(B):
        (q1, v1), i1 = mc.md_step_ground(mdm, qs[e], qds[e], taus[e], 5e-3,
                                         feet, offs, mu=mus[e])
        np.testing.assert_allclose(np.asarray(q2[e]), np.asarray(q1),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(v2[e]), np.asarray(v1),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(imp[e]), np.asarray(i1),
                                   atol=1e-11)
        touched += int(np.abs(np.asarray(i1)).max() > 1e-9)
    assert touched, "no environment touched the ground — vacuous"


def test_md_ground_geoms_and_scan_rollout(ball_ant):
    """Torso sphere + shin capsules as md ground geoms (regular link
    indices — no base link here): a legs-up ant rests on its torso at
    z = r, and the scan rollout threads ground_geoms."""
    from gridcodegenerator_tpu.ops import collision as col

    mdm, feet, offs = ball_ant
    nv = mdm.nv
    gg = col.make_geoms([0], a=[[0, 0, 0]], r=0.18, dtype=jnp.float64)
    q0 = np.array(md.neutral_q(mdm))
    q0[6] = 0.4
    taus = jnp.zeros((500, nv))
    (qT, vT), (qh, vh, imph) = mc.md_simulate_ground(
        mdm, jnp.asarray(q0), jnp.zeros(nv), taus, 2e-3,
        feet, offs + np.array([0.0, 0.0, 5.0]),   # feet never touch
        mu=0.8, ground_geoms=gg, mu_ground=0.8)
    assert imph.shape == (500, 5, 3)
    # torso sphere supports the whole robot at z = r
    assert abs(float(qT[6]) - 0.18) < 8e-3
    assert float(np.asarray(imph)[-1, 4, 2]) > 1e-4


def test_md_step_ground_fused_interpret_matches_vmap(ball_ant):
    """The fused md step kernel (interpret mode — the identical body the
    TPU lowers) == the vmap reference, with foot AND torso-geom contacts
    active, per-env friction, and quaternion retraction exercised."""
    from gridcodegenerator_tpu.ops import collision as col
    from gridcodegenerator_tpu.ops.kernels import md_contact_fused as mcf

    mdm, feet, offs = ball_ant
    gg = col.make_geoms([0], a=[[0, 0, 0]], r=0.18, dtype=jnp.float64)
    rng = np.random.default_rng(29)
    B = 4
    q0 = np.array(md.neutral_q(mdm))
    qs, qds, taus = [], [], []
    for e in range(B):
        d = rng.uniform(-0.25, 0.25, mdm.nv)
        qe = np.array(md.md_tangent_apply(mdm, jnp.asarray(q0),
                                          jnp.asarray(d)))
        qe[6] = rng.uniform(0.0, 0.15)       # feet/torso touch range
        qs.append(qe)
        qds.append(rng.uniform(-0.4, 0.4, mdm.nv))
        taus.append(rng.uniform(-3, 3, mdm.nv))
    qs, qds, taus = (jnp.asarray(np.stack(a)) for a in (qs, qds, taus))
    mus = jnp.asarray(rng.uniform(0.4, 1.0, B))

    (q_r, v_r), imp_r = mc.md_step_ground_batched(
        mdm, qs, qds, taus, 2e-3, feet, offs, mu=mus, ground_geoms=gg,
        mu_ground=0.6, impl="vmap")
    mu_bl = jnp.broadcast_to(mus[None, :], (4, B))
    q_f, v_f, imp_f = mcf.md_step_ground_fused(
        mdm, qs.T, qds.T, taus.T, mu_bl, 2e-3, feet,
        np.asarray(offs, np.float64), ground_geoms=gg, mu_ground=0.6,
        interpret=True)
    np.testing.assert_allclose(np.asarray(q_f.T), np.asarray(q_r),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(v_f.T), np.asarray(v_r),
                               atol=1e-10)
    imp_f3 = jnp.moveaxis(imp_f, 0, -1).reshape(B, 5, 3)
    np.testing.assert_allclose(np.asarray(imp_f3), np.asarray(imp_r),
                               atol=1e-10)
    assert (np.asarray(imp_r)[:, :, 2] > 1e-9).any(), "vacuous"
    # the plain-XLA fallback of the same body agrees too (gate path)
    q_x, v_x, imp_x = mcf.md_step_ground_fused(
        mdm, qs.T, qds.T, taus.T, mu_bl, 2e-3, feet,
        np.asarray(offs, np.float64), ground_geoms=gg, mu_ground=0.6,
        force_xla=True)
    np.testing.assert_allclose(np.asarray(q_x), np.asarray(q_f), atol=1e-12)
    np.testing.assert_allclose(np.asarray(imp_x), np.asarray(imp_f),
                               atol=1e-12)
