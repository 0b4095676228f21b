"""Device-mesh parallelism: agents/scenarios sharded over TPU chips."""

from frenetix_tpu.parallel.mesh import (  # noqa: F401
    agent_pose_predictions,
    batched_full_cycle,
    concat_obstacles,
    make_agent_mesh,
    sharded_full_cycle,
    stack_cycle_contexts,
)
from frenetix_tpu.parallel.distributed import (  # noqa: F401
    initialize as distributed_initialize,
    shard_scenarios,
)
from frenetix_tpu.parallel.device_sim import (  # noqa: F401
    DeviceSimResult,
    DeviceSimulation,
    run_fleet,
)
