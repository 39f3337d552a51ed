from belief_planning_tpu.envs.highway import HighwayEnv, highway_sim
from belief_planning_tpu.envs.merge import HighwayMergeEnv, merge_geometry, merge_ref_lines
from belief_planning_tpu.envs.quadruped import QuadEnv, robot_sim
from belief_planning_tpu.envs.hmm_highway import HMMHighwayEnv

__all__ = [
    "HighwayEnv",
    "highway_sim",
    "HighwayMergeEnv",
    "merge_geometry",
    "merge_ref_lines",
    "QuadEnv",
    "robot_sim",
    "HMMHighwayEnv",
]
