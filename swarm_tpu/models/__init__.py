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
from swarm_tpu.models.sensors import sense_4way, sense_4way_median3, sense_true  # noqa: F401
from swarm_tpu.models.odometry import drift_integrate, encoder_emit, firmware_odometry_step  # noqa: F401
from swarm_tpu.models.scan import cmd_vel_drive, scan_angles, sense_scan  # noqa: F401
from swarm_tpu.models.nav import NavCommand, NavParams, NavState, nav_init, nav_step  # noqa: F401
