from mpctsid_tpu.dist.mesh import (scenario_mesh, shard_scenarios,
                                   sharded_cascade_rollout)

__all__ = ["scenario_mesh", "shard_scenarios", "sharded_cascade_rollout"]
