"""MJCF front-end (models/mjcf.py): the parsed description must be
DYNAMICALLY equivalent to the same robot expressed as URDF — the strongest
cross-format check (frame conventions, anchors, inertia lumping all feed the
same numbers), plus unit checks for the MJCF-specific machinery (defaults,
degrees, geom-derived inertia, multi-joint bodies, free/ball joints)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models.urdf import rpy_to_matrix

jax.config.update("jax_enable_x64", True)


def _mat_to_rpy_str(R):
    from gridcodegenerator_tpu.models.urdf import _matrix_to_rpy
    return " ".join(f"{float(v):.17g}" for v in _matrix_to_rpy(R))


def _vec(v):
    return " ".join(f"{float(x):.17g}" for x in v)


# --------------------------------------------------------------------------
# cross-format equivalence: a 3-dof arm with rotated frames, joint anchors,
# off-axis inertias, damping/armature — MJCF vs hand-converted URDF
# --------------------------------------------------------------------------
def _arm_mjcf():
    return """
<mujoco model="xarm">
  <compiler angle="radian"/>
  <worldbody>
    <body name="l1" pos="0.1 0 0.2" euler="0.3 -0.2 0.5">
      <joint name="j1" type="hinge" pos="0.05 -0.02 0.01" axis="0 0 1"
             damping="0.3" armature="0.02"/>
      <inertial pos="0.2 0.05 0" mass="2.5" diaginertia="0.05 0.04 0.02"/>
      <body name="l2" pos="0.4 0 0" euler="0 0.7 0">
        <joint name="j2" type="slide" axis="1 0 0" damping="0.1"/>
        <inertial pos="0.15 0 0.02" quat="0.9238795 0 0.3826834 0"
                  mass="1.2" diaginertia="0.03 0.02 0.01"/>
        <body name="l3" pos="0.3 0.05 0">
          <joint name="j3" type="hinge" pos="0 0 0.04" axis="0 1 0"
                 damping="0.2" range="-1.0 1.5"/>
          <inertial pos="0.1 0 0" mass="0.8" diaginertia="0.01 0.008 0.006"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def _arm_urdf():
    """The same arm hand-converted to URDF: joint origin = body pose
    composed with Trans(anchor); child inertial shifted by -anchor (the
    MJCF link frame keeps the body axes with the origin at the anchor);
    each child body's pos is expressed from its parent's body frame, i.e.
    from the parent link frame shifted by +parent_anchor."""
    e1 = np.array([0.3, -0.2, 0.5])
    R1 = rpy_to_matrix(e1)          # URDF rpy == MJCF euler only when the
    # composition orders agree; build rotations explicitly below instead.

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    # MJCF euler (default seq xyz, intrinsic) = Rx @ Ry @ Rz
    R1 = rx(0.3) @ ry(-0.2) @ rz(0.5)
    a1 = np.array([0.05, -0.02, 0.01])
    o1 = np.array([0.1, 0, 0.2]) + R1 @ a1
    R2 = ry(0.7)
    a2 = np.zeros(3)
    # body2 pos is in body1 coordinates; link1 origin sits at anchor1
    o2 = (np.array([0.4, 0, 0]) - a1)
    R3 = np.eye(3)
    a3 = np.array([0, 0, 0.04])
    o3 = np.array([0.3, 0.05, 0]) + R3 @ a3 - a2

    q8 = 2 * np.arctan2(0.3826834, 0.9238795)  # l2 inertial quat (about y)
    return f"""
<robot name="xarm">
  <link name="base"/>
  <link name="l1">
    <inertial><origin xyz="{_vec(np.array([0.2, 0.05, 0]) - a1)}"/>
      <mass value="2.5"/>
      <inertia ixx="0.05" iyy="0.04" izz="0.02" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="l2">
    <inertial>
      <origin xyz="{_vec(np.array([0.15, 0, 0.02]) - a2)}"
              rpy="{_mat_to_rpy_str(ry(q8))}"/>
      <mass value="1.2"/>
      <inertia ixx="0.03" iyy="0.02" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="l3">
    <inertial><origin xyz="{_vec(np.array([0.1, 0, 0]) - a3)}"/>
      <mass value="0.8"/>
      <inertia ixx="0.01" iyy="0.008" izz="0.006" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="{_vec(o1)}" rpy="{_mat_to_rpy_str(R1)}"/>
    <axis xyz="0 0 1"/><dynamics damping="0.3" armature="0.02"/>
  </joint>
  <joint name="j2" type="prismatic">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="{_vec(o2)}" rpy="{_mat_to_rpy_str(R2)}"/>
    <axis xyz="1 0 0"/><dynamics damping="0.1"/>
  </joint>
  <joint name="j3" type="revolute">
    <parent link="l2"/><child link="l3"/>
    <origin xyz="{_vec(o3)}" rpy="{_mat_to_rpy_str(R3)}"/>
    <axis xyz="0 1 0"/><dynamics damping="0.2"/>
    <limit lower="-1.0" upper="1.5"/>
  </joint>
</robot>
"""


@pytest.fixture(scope="module")
def arm_pair():
    dm = g.parse_mjcf(_arm_mjcf())
    du = g.parse_urdf(_arm_urdf())
    return dm, du


@pytest.mark.smoke
def test_arm_description_matches_urdf(arm_pair):
    dm, du = arm_pair
    assert dm.joint_types == du.joint_types
    assert dm.topology.parents == du.topology.parents
    np.testing.assert_allclose(dm.axis, du.axis, atol=1e-12)
    np.testing.assert_allclose(dm.damping, du.damping, atol=1e-12)
    np.testing.assert_allclose(dm.armature, du.armature, atol=1e-12)
    np.testing.assert_allclose(dm.q_lower, du.q_lower)
    np.testing.assert_allclose(dm.q_upper, du.q_upper)
    np.testing.assert_allclose(dm.origin_xyz, du.origin_xyz, atol=1e-12)
    for Rm, Ru in zip(dm.origin_rpy, du.origin_rpy):
        np.testing.assert_allclose(rpy_to_matrix(Rm), rpy_to_matrix(Ru),
                                   atol=1e-12)
    np.testing.assert_allclose(dm.inertia, du.inertia, atol=1e-12)


def test_arm_dynamics_match_urdf(arm_pair):
    """Full dynamical equivalence: RNEA and FD agree state-for-state."""
    dm, du = arm_pair
    mm = g.robot_model_from_description(dm, dtype=jnp.float64)
    mu_ = g.robot_model_from_description(du, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    q, qd, u = (jnp.asarray(rng.uniform(-1, 1, (16, 3))) for _ in range(3))
    np.testing.assert_allclose(
        np.asarray(g.inverse_dynamics(mm, q, qd, u)),
        np.asarray(g.inverse_dynamics(mu_, q, qd, u)), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g.forward_dynamics(mm, q, qd, u)),
        np.asarray(g.forward_dynamics(mu_, q, qd, u)), atol=1e-10)


# --------------------------------------------------------------------------
# MJCF-specific machinery
# --------------------------------------------------------------------------
def test_degrees_default_and_range():
    d = g.parse_mjcf("""
<mujoco><worldbody>
  <body name="b"><joint name="j" range="-90 90"/>
    <inertial pos="0 0 0" mass="1" diaginertia="1 1 1"/></body>
</worldbody></mujoco>""")
    np.testing.assert_allclose(d.q_lower, [-np.pi / 2])
    np.testing.assert_allclose(d.q_upper, [np.pi / 2])


def test_euler_degree_orientation_matches_quat():
    """90° about z as euler-in-degrees == the same rotation as quat."""
    mj_e = g.parse_mjcf("""
<mujoco><worldbody>
  <body name="b" pos="1 0 0" euler="0 0 90"><joint name="j"/>
    <inertial pos="0.3 0 0" mass="1" diaginertia="1 1 1"/></body>
</worldbody></mujoco>""")
    s2 = np.sqrt(0.5)
    mj_q = g.parse_mjcf(f"""
<mujoco><worldbody>
  <body name="b" pos="1 0 0" quat="{s2} 0 0 {s2}"><joint name="j"/>
    <inertial pos="0.3 0 0" mass="1" diaginertia="1 1 1"/></body>
</worldbody></mujoco>""")
    np.testing.assert_allclose(rpy_to_matrix(mj_e.origin_rpy[0]),
                               rpy_to_matrix(mj_q.origin_rpy[0]),
                               atol=1e-9)


def test_defaults_inheritance():
    d = g.parse_mjcf("""
<mujoco>
  <compiler angle="radian"/>
  <default>
    <joint damping="0.5" armature="0.01"/>
    <default class="wrist"><joint damping="0.1" axis="0 1 0"/></default>
  </default>
  <worldbody>
    <body name="a"><joint name="j1"/>
      <inertial pos="0 0 0" mass="1" diaginertia="1 1 1"/>
      <body name="b" pos="0.2 0 0"><joint name="j2" class="wrist"/>
        <inertial pos="0 0 0" mass="1" diaginertia="1 1 1"/>
      </body>
    </body>
  </worldbody>
</mujoco>""")
    np.testing.assert_allclose(d.damping, [0.5, 0.1])
    np.testing.assert_allclose(d.armature, [0.01, 0.01])
    np.testing.assert_allclose(d.axis[1], [0, 1, 0])


def test_geom_inertia_sphere_box_exact():
    """Geom-derived inertia (no <inertial>): sphere + box vs closed form."""
    d = g.parse_mjcf("""
<mujoco><compiler angle="radian"/><worldbody>
  <body name="b"><joint name="j"/>
    <geom type="sphere" size="0.1" pos="0.2 0 0" density="2000"/>
    <geom type="box" size="0.1 0.2 0.3" pos="0 0 0.5" mass="3"/>
  </body>
</worldbody></mujoco>""")
    m_s = 2000 * 4 / 3 * np.pi * 0.1 ** 3
    m_b = 3.0
    m = m_s + m_b
    I6 = d.inertia[0]
    np.testing.assert_allclose(I6[5, 5], m, rtol=1e-12)
    com = np.array([0.2 * m_s, 0, 0.5 * m_b]) / m
    np.testing.assert_allclose(I6[:3, 3:][(2, 0, 1), (1, 2, 0)],
                               m * com, rtol=1e-12)
    # rotational inertia about the COM, recomposed exactly
    Is = 2 / 5 * m_s * 0.01 * np.eye(3)
    Ib = m_b / 3 * np.diag([0.04 + 0.09, 0.01 + 0.09, 0.01 + 0.04])
    from gridcodegenerator_tpu.models.urdf import spatial_inertia
    parts = np.zeros((3, 3))
    for mi, ci, Ii in ((m_s, np.array([0.2, 0, 0]), Is),
                       (m_b, np.array([0, 0, 0.5]), Ib)):
        dd = ci - com
        parts += Ii + mi * (dd @ dd * np.eye(3) - np.outer(dd, dd))
    np.testing.assert_allclose(I6, spatial_inertia(m, com, parts),
                               atol=1e-12)


def test_capsule_fromto_inertia_matches_posquat():
    """A capsule given as fromto == the same capsule as pos+zaxis."""
    d1 = g.parse_mjcf("""
<mujoco><compiler angle="radian"/><worldbody>
  <body name="b"><joint name="j"/>
    <geom type="capsule" size="0.05" fromto="0.1 0 0 0.5 0 0"/>
  </body>
</worldbody></mujoco>""")
    d2 = g.parse_mjcf("""
<mujoco><compiler angle="radian"/><worldbody>
  <body name="b"><joint name="j"/>
    <geom type="capsule" size="0.05 0.2" pos="0.3 0 0" zaxis="1 0 0"/>
  </body>
</worldbody></mujoco>""")
    np.testing.assert_allclose(d1.inertia, d2.inertia, atol=1e-12)
    assert d1.inertia[0, 5, 5] > 0


def test_multi_joint_body_matches_nested():
    """Two hinges in one body (MuJoCo composition order: document order
    outermost-first) == the same mechanism as nested bodies."""
    two_in_one = g.parse_mjcf("""
<mujoco><compiler angle="radian"/><worldbody>
  <body name="b" pos="0.3 0 0">
    <joint name="jx" axis="1 0 0" pos="0.05 0 0"/>
    <joint name="jy" axis="0 1 0" pos="0.05 0 0"/>
    <inertial pos="0.2 0 0" mass="1.5" diaginertia="0.02 0.02 0.01"/>
  </body>
</worldbody></mujoco>""")
    nested = g.parse_mjcf("""
<mujoco><compiler angle="radian"/><worldbody>
  <body name="b1" pos="0.3 0 0">
    <joint name="jx" axis="1 0 0" pos="0.05 0 0"/>
    <body name="b" pos="0 0 0">
      <joint name="jy" axis="0 1 0" pos="0.05 0 0"/>
      <inertial pos="0.2 0 0" mass="1.5" diaginertia="0.02 0.02 0.01"/>
    </body>
  </body>
</worldbody></mujoco>""")
    m1 = g.robot_model_from_description(two_in_one, dtype=jnp.float64)
    m2 = g.robot_model_from_description(nested, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    q, qd, u = (jnp.asarray(rng.uniform(-1, 1, (8, 2))) for _ in range(3))
    np.testing.assert_allclose(
        np.asarray(g.forward_dynamics(m1, q, qd, u)),
        np.asarray(g.forward_dynamics(m2, q, qd, u)), atol=1e-11)


def test_jointless_body_welds_inertia():
    """A body without joints lumps its inertia into the governing link,
    through the accumulated transform — same semantics as URDF fixed
    joints."""
    welded = g.parse_mjcf("""
<mujoco><compiler angle="radian"/><worldbody>
  <body name="b"><joint name="j"/>
    <inertial pos="0 0 0" mass="1" diaginertia="0.01 0.01 0.01"/>
    <body name="tool" pos="0.4 0 0" euler="0 1.2 0">
      <inertial pos="0.05 0 0" mass="0.7" diaginertia="0.004 0.003 0.002"/>
    </body>
  </body>
</worldbody></mujoco>""")
    assert welded.n == 1
    assert welded.inertia[0, 5, 5] == pytest.approx(1.7)
    # against the URDF fixed-joint path on the identical numbers
    u = g.parse_urdf("""
<robot name="r"><link name="base"/>
  <link name="b"><inertial><mass value="1"/>
    <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <link name="tool"><inertial><origin xyz="0.05 0 0"/><mass value="0.7"/>
    <inertia ixx="0.004" iyy="0.003" izz="0.002" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <joint name="j" type="revolute">
    <parent link="base"/><child link="b"/>
    <axis xyz="0 0 1"/></joint>
  <joint name="w" type="fixed">
    <parent link="b"/><child link="tool"/>
    <origin xyz="0.4 0 0" rpy="0 1.2 0"/></joint>
</robot>""")
    np.testing.assert_allclose(welded.inertia, u.inertia, atol=1e-12)


def test_freejoint_and_ball_to_multidof():
    """freejoint root + ball elbow parses to the multi-dof stack and runs:
    generalized FD is finite and matches energy bookkeeping shape-wise."""
    from gridcodegenerator_tpu.ops import multidof as md

    d = g.parse_mjcf("""
<mujoco><compiler angle="radian"/><worldbody>
  <body name="trunk" pos="0 0 1"><freejoint/>
    <inertial pos="0 0 0" mass="5" diaginertia="0.2 0.2 0.1"/>
    <body name="arm" pos="0.3 0 0">
      <joint name="shoulder" type="ball" damping="0.1"/>
      <inertial pos="0.2 0 0" mass="1" diaginertia="0.02 0.02 0.01"/>
    </body>
  </body>
</worldbody></mujoco>""")
    assert d.joint_types == ("floating", "spherical")
    m = md.multidof_model_from_description(d, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    q = md.md_tangent_apply(m, md.neutral_q(m),
                         jnp.asarray(rng.uniform(-0.3, 0.3, m.nv)))
    qd = jnp.asarray(rng.uniform(-1, 1, m.nv))
    tau = jnp.asarray(rng.uniform(-1, 1, m.nv))
    qdd = md.md_forward_dynamics(m, q, qd, tau)
    assert qdd.shape == (m.nv,)
    assert bool(jnp.isfinite(qdd).all())
    tau2 = md.md_inverse_dynamics(m, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(tau2), np.asarray(tau),
                               atol=1e-9)


def test_mjcf_errors():
    with pytest.raises(ValueError, match="mujoco"):
        g.parse_mjcf("<robot name='x'/>")
    with pytest.raises(NotImplementedError, match="include"):
        g.parse_mjcf("<mujoco><include file='x.xml'/>"
                     "<worldbody/></mujoco>")
    with pytest.raises(ValueError, match="free joint"):
        g.parse_mjcf("""
<mujoco><worldbody><body name="b"><freejoint/><joint name="j"/>
  <inertial pos="0 0 0" mass="1" diaginertia="1 1 1"/>
</body></worldbody></mujoco>""")
    with pytest.raises(ValueError, match="no joints"):
        g.parse_mjcf("<mujoco><worldbody><body name='b'/>"
                     "</worldbody></mujoco>")


def test_collision_extraction():
    """mjcf_collision_model: body capsules land on their moving links in
    LINK coordinates (anchor shift + weld transform applied), worldbody
    geoms become obstacles, visual-only geoms are skipped, and the set
    composes with the ground stepper."""
    src = """
<mujoco><compiler angle="radian"/><worldbody>
  <geom type="capsule" size="0.2" fromto="1 0 0 1 1 0"/>
  <geom type="plane" size="5 5 0.1"/>
  <body name="a" pos="0 0 0.5">
    <joint name="j1" pos="0.1 0 0"/>
    <geom type="capsule" size="0.05" fromto="0.2 0 0 0.6 0 0"/>
    <geom type="sphere" size="0.03" pos="0.3 0 0.1"
          contype="0" conaffinity="0"/>
    <body name="tool" pos="0.6 0 0" euler="0 1.5707963267948966 0">
      <geom type="sphere" size="0.04" pos="0.1 0 0"/>
    </body>
    <body name="b" pos="0.6 0 0">
      <joint name="j2" axis="0 1 0"/>
      <geom type="sphere" size="0.06" pos="0.25 0 0" mass="0.5"/>
      <inertial pos="0.2 0 0" mass="1" diaginertia="0.01 0.01 0.01"/>
    </body>
  </body>
</worldbody></mujoco>"""
    desc, cm = g.mjcf_collision_model(src, min_separation=1)
    assert cm is not None
    # link capsule (anchor 0.1 shifted), welded tool sphere (rotated into
    # link a), and b's sphere
    assert cm.geoms.links == (0, 0, 1)
    np.testing.assert_allclose(np.asarray(cm.geoms.a[0]),
                               [0.1, 0, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(cm.geoms.b[0]),
                               [0.5, 0, 0], atol=1e-7)
    # tool frame: +0.5 from anchor, euler(0, pi/2, 0) sends +x to -z
    np.testing.assert_allclose(np.asarray(cm.geoms.a[1]),
                               [0.5, 0, -0.1], atol=1e-7)
    np.testing.assert_allclose(np.asarray(cm.geoms.r),
                               [0.05, 0.04, 0.06], atol=1e-9)
    # world capsule is an obstacle; the plane is skipped
    assert cm.obstacles is not None and cm.obstacles.a.shape[0] == 1
    np.testing.assert_allclose(np.asarray(cm.obstacles.a[0]), [1, 0, 0])
    assert len(cm.obs_pairs) == 3
    # candidate pairs at tree distance >= 1: the (a, b) cross pairs
    assert all(cm.geoms.links[i] != cm.geoms.links[j] for i, j in cm.pairs)
    # composes with the stepper end-to-end
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    st = (jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0, 0.4]),
          jnp.zeros(2), jnp.zeros(6), jnp.zeros(2))
    nxt, imp = ct.fb_step_ground(ffm, st, jnp.zeros(2), 1e-3, (1,),
                                 np.array([[0.3, 0.0, 0.0]]),
                                 collision=cm)
    assert imp.shape == (1 + cm.n_contacts, 3)
    assert all(bool(jnp.isfinite(x).all()) for x in nxt)


def test_ant_fixture():
    """zoo.ant_mjcf — the quadruped MJCF fixture parses to the expected
    structure: degree-mode eulers/ranges, <default> class tree (knee class
    doubles the damping), geom-derived inertia (torso sphere welds into the
    free-flyer base), and a 9-geom self-collision set."""
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import freeflyer as ff

    desc, cm = g.mjcf_collision_model(zoo.ant_mjcf(damping=0.5))
    assert desc.n == 8 and set(desc.joint_types) == {"revolute"}
    # default-class damping: 4 hips at 0.5, 4 knees at the knee-class 1.0;
    # armature from the root default everywhere
    np.testing.assert_allclose(np.sort(desc.damping), [0.5] * 4 + [1.0] * 4)
    np.testing.assert_allclose(desc.armature, 0.01)
    # hips range +-35 deg, knees 25..100 deg — converted from degree mode
    d = np.pi / 180
    hips = desc.damping < 0.75
    np.testing.assert_allclose(desc.q_lower[hips], -35 * d, atol=1e-12)
    np.testing.assert_allclose(desc.q_upper[hips], 35 * d, atol=1e-12)
    np.testing.assert_allclose(desc.q_lower[~hips], 25 * d, atol=1e-12)
    np.testing.assert_allclose(desc.q_upper[~hips], 100 * d, atol=1e-12)
    # torso sphere (no <inertial>): mass rho*4/3*pi*r^3 lumped into the base
    m_torso = 400.0 * 4.0 / 3.0 * np.pi * 0.25**3
    assert np.isclose(float(desc.base_inertia[5, 5]), m_torso, rtol=1e-12)
    # collision set: the torso sphere rides the BASE (link -1 — the
    # jointless-root-body idiom) + 8 leg capsules; no phantom obstacles
    assert cm.geoms.r.shape[0] == 9
    np.testing.assert_allclose(np.sort(np.asarray(cm.geoms.r)),
                               [0.046] * 8 + [0.25])
    assert cm.obstacles is None and len(cm.pairs) > 0
    torso_g = [i for i, l in enumerate(cm.geoms.links) if l < 0]
    assert len(torso_g) == 1
    # auto pairs: torso-shin (tree distance 2) in, torso-hip (adjacent) out
    hips = [i for i in range(8) if i not in
            [desc.topology.link_names.index(f"shin{k}") for k in range(4)]]
    tp = [(a, b) for a, b in cm.pairs if torso_g[0] in (a, b)]
    assert len(tp) == 4
    for a, b in tp:
        other = b if a == torso_g[0] else a
        assert cm.geoms.links[other] not in hips
    # the fixed-base reading pins the torso static instead
    _, cm_fix = g.mjcf_collision_model(zoo.ant_mjcf(),
                                       base_geoms="obstacle")
    assert cm_fix.geoms.r.shape[0] == 8
    assert cm_fix.obstacles is not None and cm_fix.obstacles.a.shape[0] == 1
    # feet anchor points: shin capsules end at (0.4, 0, 0) in the shin frame
    shins = [desc.topology.link_names.index(f"shin{k}") for k in range(4)]
    caps = {int(l): np.asarray(b)
            for l, b in zip(cm.geoms.links, np.asarray(cm.geoms.b))}
    for s in shins:
        np.testing.assert_allclose(caps[s], [0.4, 0.0, 0.0], atol=1e-12)
    # and the whole thing drives the floating-base dynamics
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    vb_dot, qdd = ff.fb_forward_dynamics(
        ffm, jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(8), jnp.zeros(6),
        jnp.zeros(8), jnp.zeros(8))
    assert np.isfinite(np.asarray(vb_dot)).all()
    assert np.isfinite(np.asarray(qdd)).all()
    # free fall: base linear acceleration is -g z, no spin
    np.testing.assert_allclose(np.asarray(vb_dot[:3]), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vb_dot[3:]), [0, 0, -9.81],
                               atol=1e-9)


def test_sites_and_actuators():
    """<site> anchors and the <actuator> block on the ant fixture: foot
    sites land on the shin links at the capsule tips (the stepper's
    offsets come straight from the document), motors carry class-default
    gear/ctrlrange with per-element overrides, and the gear matrix maps
    per-actuator controls to joint torques."""
    from gridcodegenerator_tpu.models import zoo

    src = zoo.ant_mjcf()
    desc = g.parse_mjcf(src)
    sites = g.mjcf_sites(src)
    assert set(sites) == {f"foot{k}" for k in range(4)}
    for k in range(4):
        s = sites[f"foot{k}"]
        assert s.link == desc.topology.link_names.index(f"shin{k}")
        np.testing.assert_allclose(s.pos, [0.4, 0, 0], atol=1e-12)
        np.testing.assert_allclose(s.R, np.eye(3), atol=1e-12)

    act = g.mjcf_actuators(src)
    assert act.n == 8 and len(act.names) == 8
    jn = desc.topology.joint_names
    for i, name in enumerate(act.names):
        # m_hipK drives hipK_j at the default gear 30; m_kneeK overrides 45
        target = name[2:] + "_j"
        assert jn[act.joint[i]] == target
        assert act.gear[i] == (45.0 if "knee" in name else 30.0)
    np.testing.assert_allclose(act.ctrl_lower, -1.0)
    np.testing.assert_allclose(act.ctrl_upper, 1.0)
    T = act.gear_matrix()
    assert T.shape == (8, 8)
    ctrl = np.linspace(-2, 2, 8)            # exceeds ctrlrange
    tau = T @ act.clamp(ctrl)
    # every joint driven by exactly one motor: |tau_j| <= gear_j
    assert (np.abs(tau) <= np.abs(T).sum(1) + 1e-12).all()
    assert np.abs(tau).max() == 45.0        # clamped knee at full gear

    # welded-body site: re-expressed through the fixed transform; world
    # sites get link -2
    src2 = """
<mujoco><compiler angle="radian"/><worldbody>
  <site name="anchor" pos="1 2 3"/>
  <body name="a"><joint name="j" axis="0 0 1"/>
    <inertial pos="0 0 0" mass="1" diaginertia="1 1 1"/>
    <body name="tool" pos="0.5 0 0" euler="0 1.5707963267948966 0">
      <site name="tip" pos="0.1 0 0"/>
    </body>
  </body>
</worldbody></mujoco>"""
    s2 = g.mjcf_sites(src2)
    assert s2["anchor"].link == -2
    np.testing.assert_allclose(s2["anchor"].pos, [1, 2, 3], atol=1e-12)
    assert s2["tip"].link == 0
    # euler(0, pi/2, 0) sends +x to -z: tip at 0.5 + (0, 0, -0.1)
    np.testing.assert_allclose(s2["tip"].pos, [0.5, 0, -0.1], atol=1e-9)

    # position servos parse into the affine gain/bias model (r3s14);
    # genuinely unsupported types still fail loudly
    servo = """
<mujoco><worldbody><body name="a"><joint name="j" axis="0 0 1"/>
  <inertial pos="0 0 0" mass="1" diaginertia="1 1 1"/>
</body></worldbody><actuator><position joint="j" kp="10" kv="2"/>
</actuator></mujoco>"""
    sv = g.mjcf_actuators(servo)
    assert sv.kind == ("position",)
    gain, bq, bv = sv.gains()
    np.testing.assert_allclose([gain[0], bq[0], bv[0]], [10, -10, -2])
    bad = servo.replace("<position joint=\"j\" kp=\"10\" kv=\"2\"/>",
                        "<muscle joint=\"j\"/>")
    with pytest.raises(NotImplementedError, match="actuator type"):
        g.mjcf_actuators(bad)


def _fourbar_mjcf():
    """zoo.four_bar() re-expressed as MJCF with the loop closed by a
    MuJoCo <equality><connect> (anchor in body1's frame; body2's local
    point derived at q = 0 — MuJoCo's compile-time convention)."""
    return """
<mujoco model="four_bar"><compiler angle="radian"/>
  <worldbody>
    <body name="base">
      <inertial pos="0 0 0" mass="2" diaginertia="0.02 0.02 0.02"/>
      <body name="crank">
        <joint name="j_crank" axis="0 1 0"/>
        <inertial pos="0 0 -0.25" mass="1" diaginertia="0.02 0.02 0.004"/>
        <body name="coupler" pos="0 0 -0.5">
          <joint name="j_coupler" axis="0 1 0"/>
          <inertial pos="0.4 0 0" mass="0.8"
                    diaginertia="0.003 0.018 0.018"/>
        </body>
      </body>
      <body name="rocker" pos="0.8 0 0">
        <joint name="j_rocker" axis="0 1 0"/>
        <inertial pos="0 0 -0.25" mass="1" diaginertia="0.02 0.02 0.004"/>
      </body>
    </body>
  </worldbody>
  <equality>
    <connect body1="coupler" body2="rocker" anchor="0.8 0 0"/>
  </equality>
</mujoco>"""


def test_equality_connect_matches_urdf_fourbar():
    """<equality><connect> → mjcf_loops reproduces the hand-written loop
    spec of the URDF four-bar fixture, and the closed-chain dynamics agree
    description-for-description."""
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import loops as lp

    src = _fourbar_mjcf()
    dm = g.parse_mjcf(src)
    pairs, oa, ob = g.mjcf_loops(src)
    names = dm.topology.link_names
    assert pairs == ((names.index("coupler"), names.index("rocker")),)
    np.testing.assert_allclose(oa, [[0.8, 0, 0]], atol=1e-12)
    # body2's local anchor derived at q=0: (0, 0, -0.5) in the rocker frame
    np.testing.assert_allclose(ob, [[0, 0, -0.5]], atol=1e-12)
    # the loop closes exactly at q = 0
    mm = g.robot_model_from_description(dm, dtype=jnp.float64)
    gap = lp.loop_gap(mm, jnp.zeros(3), pairs, oa, ob)
    np.testing.assert_allclose(np.asarray(gap), 0.0, atol=1e-12)
    # closed-chain FD agrees with the URDF fixture state-for-state
    du = g.parse_urdf(zoo.four_bar())
    mu_ = g.robot_model_from_description(du, dtype=jnp.float64)
    pairs_u = ((1, 2),)
    oa_u = np.array([[0.8, 0.0, 0.0]])
    ob_u = np.array([[0.0, 0.0, -0.5]])
    rng = np.random.default_rng(6)
    for _ in range(3):
        q = jnp.asarray(rng.uniform(-0.5, 0.5, 3))
        qd = jnp.asarray(rng.uniform(-1, 1, 3))
        u = jnp.asarray(rng.uniform(-2, 2, 3))
        qdd_m, lam_m = lp.loop_forward_dynamics(mm, q, qd, u, pairs, oa,
                                                ob, reg=1e-10)
        qdd_u, lam_u = lp.loop_forward_dynamics(mu_, q, qd, u, pairs_u,
                                                oa_u, ob_u, reg=1e-10)
        np.testing.assert_allclose(np.asarray(qdd_m), np.asarray(qdd_u),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(lam_m), np.asarray(lam_u),
                                   atol=1e-9)


def test_equality_joint_and_world_connect():
    """<equality><joint> (linear polycoef) lands in RobotDescription.mimic
    with q_j1 = a1*q_j2 + a0 semantics; a connect with body2 omitted (or a
    root-welded body1) becomes a world pin with the q=0 world anchor."""
    src = """
<mujoco><compiler angle="radian"/><worldbody>
  <body name="a"><joint name="jA" axis="0 1 0"/>
    <inertial pos="0.2 0 0" mass="1" diaginertia="0.01 0.01 0.01"/>
    <body name="b" pos="0.4 0 0"><joint name="jB" axis="0 1 0"/>
      <inertial pos="0.2 0 0" mass="1" diaginertia="0.01 0.01 0.01"/>
    </body>
  </body>
</worldbody>
<equality>
  <joint joint1="jB" joint2="jA" polycoef="0.1 -2 0 0 0"/>
  <connect body1="b" anchor="0.4 0 0"/>
</equality></mujoco>"""
    d = g.parse_mjcf(src)
    assert d.mimic == ((1, 0, -2.0, 0.1),)
    pairs, oa, ob = g.mjcf_loops(src)
    assert pairs == ((1, -1),)
    np.testing.assert_allclose(oa, [[0.4, 0, 0]], atol=1e-12)
    np.testing.assert_allclose(ob, [[0.8, 0, 0]], atol=1e-12)  # world, q=0
    # <weld> stopped being unsupported in r4 (ops/loops.py 6-row bilateral
    # pose constraints; surfaced via mjcf_welds) — parsing must accept it
    # and the weld accessor must expose the pair (stale r3 assertion
    # caught by the r5 full-suite record, SUITE.md)
    welded = src.replace('<joint joint1="jB" joint2="jA" '
                         'polycoef="0.1 -2 0 0 0"/>',
                         '<weld body1="a" body2="b"/>')
    g.parse_mjcf(welded)
    wpairs, _, _, _ = g.mjcf_welds(welded)
    assert len(wpairs) == 1
    quad = src.replace('polycoef="0.1 -2 0 0 0"',
                       'polycoef="0.1 -2 0.3 0 0"')
    with pytest.raises(NotImplementedError, match="polycoef"):
        g.parse_mjcf(quad)
