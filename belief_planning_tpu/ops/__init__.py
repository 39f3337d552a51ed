from belief_planning_tpu.ops.softmath import softsat, softmin, softmax, softmin_pair, softmax_pair
from belief_planning_tpu.ops.rollout import rollout_policy
from belief_planning_tpu.ops.linearize import linearize_dynamics

__all__ = [
    "softsat",
    "softmin",
    "softmax",
    "softmin_pair",
    "softmax_pair",
    "rollout_policy",
    "linearize_dynamics",
]
