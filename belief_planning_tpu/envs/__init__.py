from belief_planning_tpu.envs.highway import HighwayEnv, highway_sim
from belief_planning_tpu.envs.quadruped import QuadEnv, robot_sim

__all__ = ["HighwayEnv", "highway_sim", "QuadEnv", "robot_sim"]
