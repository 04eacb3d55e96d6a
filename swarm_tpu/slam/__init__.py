from swarm_tpu.slam.closure import ClosureState, closure_add_pose, closure_init  # noqa: F401
