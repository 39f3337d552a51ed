from belief_planning_tpu.parallel.ensemble import (
    make_batched_step,
    make_sharded_ensemble_step,
    make_mesh,
)

__all__ = ["make_batched_step", "make_sharded_ensemble_step", "make_mesh"]
