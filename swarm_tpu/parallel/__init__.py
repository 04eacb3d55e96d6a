from swarm_tpu.parallel.mesh import make_mesh  # noqa: F401
from swarm_tpu.parallel.sharded import (  # noqa: F401
    agent_evidence_rows,
    make_sharded_sim_step,
    shard_state,
    state_specs,
)
