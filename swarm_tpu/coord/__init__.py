from swarm_tpu.coord.zones import ZoneState, zone_init, zone_observe, zones_for_agents  # noqa: F401
from swarm_tpu.coord.heartbeat import heartbeat_update  # noqa: F401
from swarm_tpu.coord.assign import greedy_assign  # noqa: F401
