from swarm_tpu.server.live import LiveServer  # noqa: F401
