from swarm_tpu.engine.replay import (  # noqa: F401
    PacketStream,
    ReplayOutputs,
    ServerState,
    replay_session,
    server_init,
)
