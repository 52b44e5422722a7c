from mpctsid_tpu.dist.mesh import (scenario_mesh, shard_scenarios,
                                   shard_scenarios_multihost,
                                   sharded_cascade_rollout)

__all__ = ["scenario_mesh", "shard_scenarios", "shard_scenarios_multihost",
           "sharded_cascade_rollout"]
