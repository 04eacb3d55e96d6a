from swarm_tpu.models.ekf import EkfState, ekf_init, ekf_predict, ekf_update  # noqa: F401
from swarm_tpu.models.landmarks import (  # noqa: F401
    LM_CORNER_L,
    LM_CORNER_R,
    LM_CORRIDOR,
    LM_DEAD_END,
    LM_NONE,
    LM_OPEN,
    detect_landmark_fw,
    detect_landmark_sim,
)
from swarm_tpu.models.sensors import sense_4way  # noqa: F401
from swarm_tpu.models.odometry import drift_integrate  # noqa: F401
