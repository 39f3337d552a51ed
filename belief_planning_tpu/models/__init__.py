from belief_planning_tpu.models.dynamics import dubins, quad_kinematics
from belief_planning_tpu.models import policies, safety
from belief_planning_tpu.models.predictive import (
    PredictiveModel,
    highway_model,
    quadruped_model,
    merge_model,
)

__all__ = [
    "dubins",
    "quad_kinematics",
    "policies",
    "safety",
    "PredictiveModel",
    "highway_model",
    "quadruped_model",
    "merge_model",
]
