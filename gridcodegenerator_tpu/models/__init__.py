from .robot import RobotModel, load_robot, robot_model_from_description
from .topology import Topology
from .urdf import RobotDescription, parse_urdf
from .mjcf import mjcf_collision_model, parse_mjcf
from . import zoo
