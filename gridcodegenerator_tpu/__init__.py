"""gridcodegenerator_tpu — a TPU-native batched rigid-body dynamics engine.

Brand-new implementation of the capability set of
``robot-acceleration/GRiDCodeGenerator`` (reference mounted read-only at
``/root/reference``): where the reference *generates* robot-specialized CUDA
C++ at Python run time, this framework specializes the same per-joint
recursions at JAX trace time and runs them on TPU via XLA / Pallas, batched
with ``vmap`` and sharded over device meshes with ``shard_map``.

Algorithm families (reference ``README.md:33-40``):
  * inverse dynamics (RNEA)                       → :func:`inverse_dynamics`
  * analytical mass-matrix inverse                → :func:`direct_minv`
  * forward dynamics                              → :func:`forward_dynamics`
  * analytical ∂ID (∂c/∂q, ∂c/∂q̇)                 → :func:`inverse_dynamics_gradient`
  * analytical ∂FD (−M⁻¹·∂c/∂u)                   → :func:`forward_dynamics_gradient`
"""

from .api import (
    bias_force,
    constrained_forward_dynamics,  # batched wrapper over ops.contact
    direct_minv,
    forward_dynamics,
    forward_dynamics_gradient,
    forward_dynamics_gradient_full,
    forward_dynamics_hessian,
    forward_dynamics_hessian_vp,
    forward_dynamics_ad,
    forward_dynamics_gradient_qdd_minv,
    inverse_dynamics,
    inverse_dynamics_gradient,
    inverse_dynamics_hessian,
    map_batched,
)
from .ops.df32 import (  # opt-in f32x2 extended-precision route (PARITY.md)
    fd_grad_x2_bl,
    refine_minv_bl,
    x2_constants,
)
from .codegen import (
    CompiledFreeFlyer,
    CompiledMultiDof,
    CompiledRobot,
    compile_freeflyer,
    compile_multidof,
    compile_robot,
    export_robot,
    load_exported,
)
from .ops.loops import (
    fb_loop_bias,
    fb_loop_forward_dynamics,
    fb_loop_gap,
    fb_loop_jacobian,
    fb_weld_gap,
    fb_weld_jacobian,
    loop_bias,
    loop_forward_dynamics,
    loop_gap,
    loop_inverse_dynamics,
    loop_jacobian,
    loop_project_velocity,
    loop_step,
    loop_fd_batched,
    loop_step_batched,
    fb_loop_fd_batched,
    simulate_loops,
    simulate_loops_batched,
    transmission_rows,
)
from .ops.contact import (
    clamp_effort,
    constrained_inverse_dynamics,
    contact_jacobian,
    fb_constrained_fd_batched,
    fb_constrained_forward_dynamics,
    fb_contact_jacobian,
    fb_simulate_constrained,
    fb_simulate_ground,
    fb_stance_inverse_dynamics,
    fb_stance_inverse_dynamics_batched,
    fb_simulate_ground_batched,
    fb_step_ground,
    fb_step_ground_batched,
    joint_limit_torque,
    pd_torque,
    project_joint_limits,
    project_velocity,
    simulate_constrained,
    soft_contact_params,
)
from .ops.collision import (
    CollisionModel,
    Geoms,
    Obstacles,
    auto_pairs,
    collision_distances,
    collision_rows,
    fb_collision_distances,
    fb_collision_rows,
    fb_ground_geom_rows,
    make_collision_model,
    make_geoms,
    make_obstacles,
    n_ground_contacts,
)
from .ops.terrain import (
    Terrain,
    bumpy_terrain,
    flat_terrain,
    make_terrain,
    slope_terrain,
    terrain_height_grad,
    terrain_surface,
)
from .ops.centroidal import (
    centroidal_momentum,
    centroidal_momentum_batched,
    centroidal_momentum_bias,
    centroidal_momentum_bias_batched,
    centroidal_momentum_matrix,
    centroidal_momentum_matrix_batched,
    com_batched,
    com,
    fb_centroidal_momentum,
    fb_centroidal_momentum_matrix,
    fb_com,
    total_mass,
)
from .ops.aba import aba, aba_bl, fb_aba
from .ops.fd import forward_dynamics_diff
from .ops.regressor import inertial_params, joint_torque_regressor
from .ops.kinematics import (fk, point_force_fext, point_position,
                             world_jacobian)
from .ops.ik import ik_frame, ik_point, ik_point_batched, rotation_log
from .ops.task import (
    dynamically_consistent_pinv,
    osc_torque,
    osc_torque_batched,
    task_jacobian,
    task_pd_acceleration,
    task_space_inertia,
)
from .ops.freeflyer import (
    FreeFlyerModel,
    fb_forward_dynamics,
    fb_forward_dynamics_batched,
    fb_forward_dynamics_gradient,
    fb_id_grad,
    fb_inverse_dynamics,
    fb_simulate,
    free_flyer_model,
)
from .ops.md_contact import (
    md_constrained_fd,
    md_angular_jacobian,
    md_contact_rows,
    md_loop_rows,
    md_weld_rows,
    md_fk,
    md_point_jacobian,
    md_simulate_ground,
    md_step_ground,
    md_step_ground_batched,
)
from .ops.multidof import (
    MultiDofModel,
    md_aba,
    md_crba,
    md_forward_dynamics,
    md_forward_dynamics_batched,
    md_forward_dynamics_gradient,
    md_forward_dynamics_gradient_batched,
    md_id_grad,
    md_id_grad_batched,
    md_inverse_dynamics,
    md_inverse_dynamics_batched,
    multidof_model_from_description,
)
from .ops.so_md import (
    md_forward_dynamics_hessian,
    md_forward_dynamics_hessian_vp,
    md_inverse_dynamics_hessian_vp,
)
from .models.robot import (RobotModel, load_robot,
                           robot_model_from_description, with_armature)
from .models.topology import Topology
from .models.urdf import RobotDescription, parse_urdf
from .models.mjcf import (MjcfActuation, MjcfSite, MjcfTendons,
                          mjcf_actuators, mjcf_collision_model, mjcf_loops,
                          mjcf_sites, mjcf_tendons, mjcf_welds, parse_mjcf)
from .envs import GroundEnv, make_ground_env, make_ground_env_urdf
from .models.urdf import demote_floating_root
from .utils.golden import GoldenDynamics
from .utils.randomize import (model_axes, randomize_model,
                              scale_links, vmap_model)
from .utils.rollout import linearize_trajectory, simulate

__version__ = "0.1.0"

__all__ = [
    "RobotModel", "RobotDescription", "Topology", "GoldenDynamics",
    "GroundEnv", "make_ground_env", "make_ground_env_urdf",
    "demote_floating_root",
    "load_robot", "parse_urdf", "parse_mjcf", "mjcf_collision_model",
    "mjcf_sites", "mjcf_actuators", "mjcf_loops", "mjcf_welds",
    "mjcf_tendons", "MjcfTendons",
    "fb_weld_gap", "fb_weld_jacobian",
    "MjcfSite", "MjcfActuation",
    "randomize_model", "scale_links", "vmap_model", "model_axes",
    "robot_model_from_description",
    "with_armature",
    "inverse_dynamics", "bias_force", "direct_minv", "forward_dynamics",
    "inverse_dynamics_gradient", "forward_dynamics_gradient",
    "forward_dynamics_gradient_qdd_minv", "forward_dynamics_diff",
    "forward_dynamics_ad", "map_batched",
    "forward_dynamics_gradient_full", "forward_dynamics_hessian",
    "forward_dynamics_hessian_vp", "inverse_dynamics_hessian",
    "aba", "aba_bl", "fb_aba", "md_aba",
    "com", "com_batched", "total_mass",
    "centroidal_momentum", "centroidal_momentum_batched",
    "centroidal_momentum_bias", "centroidal_momentum_bias_batched",
    "centroidal_momentum_matrix", "centroidal_momentum_matrix_batched",
    "fb_com", "fb_centroidal_momentum", "fb_centroidal_momentum_matrix",
    "joint_torque_regressor", "inertial_params",
    "compile_robot", "export_robot", "load_exported", "CompiledRobot",
    "compile_freeflyer", "CompiledFreeFlyer",
    "compile_multidof", "CompiledMultiDof",
    "simulate", "linearize_trajectory",
    "fk", "point_force_fext", "point_position", "world_jacobian",
    "ik_point", "ik_point_batched", "ik_frame", "rotation_log",
    "task_jacobian", "task_space_inertia", "dynamically_consistent_pinv",
    "osc_torque", "osc_torque_batched", "task_pd_acceleration",
    "contact_jacobian", "constrained_forward_dynamics",
    "constrained_inverse_dynamics", "simulate_constrained",
    "loop_forward_dynamics", "loop_inverse_dynamics", "loop_jacobian",
    "loop_bias", "loop_gap", "loop_project_velocity", "loop_step",
    "simulate_loops", "fb_loop_forward_dynamics", "fb_loop_jacobian",
    "fb_loop_bias", "fb_loop_gap", "transmission_rows",
    "loop_fd_batched", "loop_step_batched",
    "project_velocity", "fb_contact_jacobian",
    "fb_constrained_forward_dynamics", "fb_constrained_fd_batched",
    "fb_simulate_constrained",
    "fb_stance_inverse_dynamics", "fb_stance_inverse_dynamics_batched",
    "fb_step_ground", "fb_simulate_ground", "fb_step_ground_batched",
    "soft_contact_params",
    "fb_simulate_ground_batched",
    "clamp_effort", "joint_limit_torque", "project_joint_limits",
    "pd_torque",
    "Terrain", "make_terrain", "flat_terrain", "slope_terrain",
    "bumpy_terrain", "terrain_height_grad", "terrain_surface",
    "FreeFlyerModel", "free_flyer_model", "fb_forward_dynamics",
    "fb_forward_dynamics_batched",
    "fb_forward_dynamics_gradient", "fb_id_grad",
    "fb_inverse_dynamics", "fb_simulate",
    "md_fk", "md_point_jacobian", "md_contact_rows", "md_constrained_fd",
    "md_angular_jacobian", "md_loop_rows", "md_weld_rows",
    "md_step_ground", "md_step_ground_batched", "md_simulate_ground",
    "MultiDofModel", "multidof_model_from_description", "md_inverse_dynamics",
    "md_forward_dynamics", "md_forward_dynamics_gradient", "md_id_grad",
    "md_crba", "md_forward_dynamics_batched", "md_inverse_dynamics_batched",
    "md_id_grad_batched", "md_forward_dynamics_gradient_batched",
    "md_forward_dynamics_hessian", "md_forward_dynamics_hessian_vp",
    "md_inverse_dynamics_hessian_vp",
]
