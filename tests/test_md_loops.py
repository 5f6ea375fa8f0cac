"""Loop-closure connects and weld constraints on the MULTI-DOF route
(`md_loop_rows`/`md_weld_rows`, `loops=`/`welds=` on
``md_step_ground(_batched)``) — closing the fb↔md feature asymmetry the
r3 review flagged as a pattern: the same MJCF <equality> block now acts
on ball-hip/freejoint robots.

Validation: Jacobians are the exact d(gap)/dt (jvp along the tangent
flow, ball joints included); a step-for-step fb-vs-md cross-route check
with an active loop cut AND a weld on the same freejoint document; a
world pin holds a point; a welded pair on the ball ant holds its full
relative pose through a contact rollout while the cut pair drifts; and
the MJCF <equality> block wires through make_ground_env on the md
route end-to-end."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu import envs
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import md_contact as mc
from gridcodegenerator_tpu.ops import multidof as md

DT = 1e-3


@pytest.fixture(scope="module")
def ball_env():
    return envs.make_ground_env(zoo.ball_ant_mjcf(), dt=DT, iters=25,
                                dtype=jnp.float64, init_height=0.35)


def test_md_loop_weld_jacobians_are_exact(ball_env):
    """J rows == d(gap)/dt under the tangent flow q ⊕ t·q̇ — exercises the
    ball-joint quaternion chart through md_tangent_apply."""
    mdm = ball_env.model
    rng = np.random.default_rng(4)
    q0 = jnp.asarray(md.neutral_q(mdm), jnp.float64)
    d0 = jnp.asarray(rng.uniform(-0.3, 0.3, mdm.nv))
    q = md.md_tangent_apply(mdm, q0, d0)
    qd = jnp.asarray(rng.uniform(-1.0, 1.0, mdm.nv))

    pairs = ((2, 4), (6, -1))
    oa = np.array([[0.1, 0.0, 0.05], [0.2, 0.0, 0.0]])
    R, p = mc.md_fk(mdm, q)
    x6 = np.asarray(p[6] + R[6] @ jnp.asarray(oa[1]))
    ob = np.array([[0.0, 0.1, 0.0], x6])      # world anchor for the pin
    R0 = jnp.stack([R[2].T @ R[4], R[6].T])

    for rows_fn, args in ((mc.md_loop_rows, (pairs, oa, ob)),
                          (mc.md_weld_rows, (pairs, R0))):
        gap, J = rows_fn(mdm, q, *args)
        _, dgap = jax.jvp(
            lambda t: rows_fn(mdm, md.md_tangent_apply(mdm, q, t),
                              *args)[0],
            (jnp.zeros(mdm.nv),), (qd,))
        np.testing.assert_allclose(np.asarray(dgap), np.asarray(J @ qd),
                                   atol=1e-9)
    # world weld gap is zero at capture, world pin gap zero at capture
    gap_w, _ = mc.md_weld_rows(mdm, q, pairs, R0)
    np.testing.assert_allclose(np.asarray(gap_w), 0.0, atol=1e-12)
    gap_l, _ = mc.md_loop_rows(mdm, q, ((6, -1),), oa[1:], ob[1:])
    np.testing.assert_allclose(np.asarray(gap_l), 0.0, atol=1e-12)


def test_fb_md_loops_welds_cross_route():
    """SAME freejoint hinge document, same loop cut + weld, one step
    through both pipelines → post-step velocities and impulses at 1e-6
    (extends test_md_limits' cross-route check to the equality rows)."""
    src = re.sub(r"<actuator>.*</actuator>", "",
                 zoo.ant_mjcf().replace(
                     "<body name=\"torso\">",
                     "<body name=\"torso\"><freejoint/>"), flags=re.S)
    dt, iters = 1e-3, 25
    fb = envs.make_ground_env(src, dt=dt, iters=iters, use_limits=False,
                              dtype=jnp.float64)
    desc = g.parse_mjcf(src)
    mdm = md.multidof_model_from_description(desc, dtype=jnp.float64)
    sites = g.mjcf_sites(src)
    feet_md = tuple(sites[f"foot{k}"].link for k in range(4))
    offs = np.stack([sites[f"foot{k}"].pos for k in range(4)])

    # cut between shin0 and shin1 tips + weld of shin2 to shin3
    # (fb link = md link − 1 after root demotion)
    a_md, b_md = feet_md[0], feet_md[1]
    w1_md, w2_md = feet_md[2], feet_md[3]
    oa = np.array([[0.4, 0.0, 0.0]])
    q0md = jnp.asarray(md.neutral_q(mdm), jnp.float64)
    Rm, pm = mc.md_fk(mdm, q0md)
    x_w = pm[a_md] + Rm[a_md] @ jnp.asarray(oa[0])
    ob = np.asarray(Rm[b_md].T @ (x_w - pm[b_md]))[None]
    loops_md = (((a_md, b_md),), oa, ob)
    R0_md = np.asarray(Rm[w1_md].T @ Rm[w2_md])[None]
    welds_md = (((w1_md, w2_md),), R0_md)
    # same constraints on the fb side (base-relative link rotations at
    # q=0 equal the parser-chain rotations used above)
    loops_fb = (((a_md - 1, b_md - 1),), oa, ob)
    welds_fb = (((w1_md - 1, w2_md - 1),), R0_md)

    B = 2
    rng = np.random.default_rng(17)
    n = fb.model.n
    quat = np.tile([1.0, 0, 0, 0], (B, 1))
    pos = np.column_stack([np.zeros((B, 2)), 0.35 + rng.uniform(0, .05, B)])
    qj = rng.uniform(-0.15, 0.15, (B, n))
    vb = rng.uniform(-0.3, 0.3, (B, 6))
    qdj = rng.uniform(-0.4, 0.4, (B, n))
    tau = rng.uniform(-3, 3, (B, n))
    arr = lambda a: jnp.asarray(a, jnp.float64)

    from gridcodegenerator_tpu.ops import contact as ct
    s_fb = (arr(quat), arr(pos), arr(qj), arr(vb), arr(qdj))
    (quat2, pos2, qj2, vb2, qdj2), imp_fb = ct.fb_step_ground_batched(
        fb.model, s_fb, arr(tau), dt, fb.feet, fb.offsets, mu=fb.mu,
        iters=iters, loops=loops_fb, welds=welds_fb)

    q_md = jnp.concatenate([arr(quat), arr(pos), arr(qj)], axis=1)
    qd_md = jnp.concatenate([arr(vb), arr(qdj)], axis=1)
    tau_md = jnp.concatenate([jnp.zeros((B, 6)), arr(tau)], axis=1)
    (q2_md, qd2_md), imp_md = mc.md_step_ground_batched(
        mdm, q_md, qd_md, tau_md, dt, feet_md, offs, mu=fb.mu,
        iters=iters, impl="vmap", loops=loops_md, welds=welds_md)

    np.testing.assert_allclose(np.asarray(qd2_md[:, :6]), np.asarray(vb2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(qd2_md[:, 6:]), np.asarray(qdj2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(imp_md), np.asarray(imp_fb),
                               atol=1e-6)


def test_md_weld_holds_relative_pose(ball_env):
    """Ball ant with two shins welded (connect + orientation rows): the
    pair's relative pose holds through 150 contact steps; without the
    rows it drifts >20×."""
    env = ball_env
    mdm = env.model
    a, b = 2, 4                                    # shin0, shin1
    anchor = jnp.asarray([0.15, 0.0, 0.0], jnp.float64)
    q0 = jnp.asarray(md.neutral_q(mdm), jnp.float64)
    q0 = q0.at[6].set(0.32)
    R, p = mc.md_fk(mdm, q0)
    x_w = p[a] + R[a] @ anchor
    ob = (R[b].T @ (x_w - p[b]))[None]
    loops = (((a, b),), anchor[None], ob)
    welds = (((a, b),), (R[a].T @ R[b])[None])

    def rel(q):
        R_, p_ = mc.md_fk(mdm, q)
        return (np.asarray(R_[a].T @ (p_[b] - p_[a])),
                np.asarray(R_[a].T @ R_[b]))

    rng = np.random.default_rng(9)
    qd = jnp.asarray(np.concatenate([rng.uniform(-0.3, 0.3, 6),
                                     rng.uniform(-0.5, 0.5, mdm.nv - 6)]))
    dp0, dR0 = rel(q0)
    tau = jnp.zeros(mdm.nv)

    def roll(constrained):
        q, v = q0, qd
        for _ in range(150):
            (q, v), _ = mc.md_step_ground(
                mdm, q, v, tau, DT, env.feet, env.offsets, iters=40,
                loops=loops if constrained else None,
                welds=welds if constrained else None)
        return rel(q)

    dp_w, dR_w = roll(True)
    np.testing.assert_allclose(dp_w, dp0, atol=3e-4)
    np.testing.assert_allclose(dR_w, dR0, atol=3e-3)
    dp_f, dR_f = roll(False)
    assert (np.abs(dp_f - dp0).max() > 20 * np.abs(dp_w - dp0).max()
            or np.abs(dR_f - dR0).max() > 20 * np.abs(dR_w - dR0).max())


def test_md_weld_end_to_end_from_mjcf():
    src = zoo.ball_ant_mjcf().replace(
        "</mujoco>",
        '<equality><weld body1="shin0" body2="shin1"/></equality></mujoco>')
    env = envs.make_ground_env(src, dt=DT, iters=25, dtype=jnp.float64,
                               init_height=0.35)
    assert env.kind == "md" and env.welds is not None
    assert env.loops is not None
    a, b = env.welds[0][0]
    st = env.reset(2, seed=1, pos_noise=0.0, vel_noise=0.15)

    def rel(qb):
        out = []
        for e in range(qb.shape[0]):
            R_, p_ = mc.md_fk(env.model, qb[e])
            out.append((np.asarray(R_[a].T @ (p_[b] - p_[a])),
                        np.asarray(R_[a].T @ R_[b])))
        return out

    r0 = rel(st[0])
    ctrl = jnp.zeros((2, env.n_ctrl))
    s = st
    for _ in range(60):
        s, _ = env.step(s, ctrl, impl="vmap")
    rT = rel(s[0])
    for e in range(2):
        np.testing.assert_allclose(rT[e][0], r0[e][0], atol=5e-4)
        np.testing.assert_allclose(rT[e][1], r0[e][1], atol=5e-3)
