"""swarm_tpu — a TPU-native distributed multi-agent SLAM swarm simulation framework.

A ground-up re-design of the capabilities of
deevinandu/Distributed-Multi-Agent-SLAM-Swarm-Robotics-System for TPU hardware:
the per-robot firmware loop (sense -> EKF -> navigate -> transmit), the central
mapping server (occupancy grid, pose-graph loop closure, frontier detection,
territory zones, heartbeat failover), and the simulation toolchain (synthetic
sessions, playback, rendering) all become pure, batched JAX programs. One jitted
step advances thousands of agents; the hot mapping ops are Pallas kernels; the
global grid shards across a TPU mesh with `shard_map`.

Layer map (mirrors SURVEY.md section 1):
  geom     — world geometry + batched exact ray casting        (L5 world model)
  models   — EKF, nav FSM, sensor + odometry noise models      (L0/L1 firmware)
  proto    — QuasarPacket wire formats + session CSV schemas   (L2 protocol)
  mapping  — occupancy grid state + update entry points        (L3 server)
  slam     — landmark loop closure, pose-graph GN, scan match  (L3 server)
  coord    — heartbeat, territory zones, frontier assignment   (L3 server)
  ops      — XLA/Pallas kernels (raster, frontier, scan-match) (hot paths)
  engine   — the fused jitted swarm step + packet replay       (the "train step")
  sim      — synthetic scenario generation + fault injection   (L5 tooling)
  render   — JAX rasterizer, PNG/CSV emitters                  (L4 rendering)
  parallel — device mesh, sharded grid, collectives            (scale-out)
  server   — live UDP ingest front-end                         (L2/L3 bridge)
  native   — C++ oracle library for bit-comparison tests
"""

__version__ = "0.1.0"

from swarm_tpu.config import (  # noqa: F401
    EngineConfig,
    GridConfig,
    NavConfig,
    NoiseConfig,
    SlamConfig,
    SwarmConfig,
)
