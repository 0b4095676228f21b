"""Device-mesh parallelism: agents/scenarios sharded over TPU chips."""

from frenetix_tpu.parallel.mesh import (  # noqa: F401
    make_agent_mesh,
    multi_agent_cycle_sharded,
    stack_contexts,
)
