from belief_planning_tpu.tree.topology import TreeTopology
from belief_planning_tpu.tree.engine import TreeState, build_tree, shift_warm_start

__all__ = ["TreeTopology", "TreeState", "build_tree", "shift_warm_start"]
