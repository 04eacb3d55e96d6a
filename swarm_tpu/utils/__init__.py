from swarm_tpu.utils.angles import wrap_pi  # noqa: F401
