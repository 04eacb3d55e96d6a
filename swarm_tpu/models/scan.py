"""Servo-scan sensing + velocity-command agent — the PlatformIO firmware
variant (esp32_firmware/src/main.cpp, SURVEY §2 row 16).

`sense_scan` models the 181-point servo sweep (-90..+90 deg relative to
heading, main_firmware_backup.cpp:80-98) as one batched exact ray cast —
the 2-second 15 ms/step physical sweep collapses into a single [N, R]
tensor op. `cmd_vel_drive` is the CMD1 receiver's differential mapping
with the 500 ms dead-man stop (main.cpp:153-174).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from swarm_tpu.config import SensorConfig
from swarm_tpu.geom.world import cast_rays
from swarm_tpu.models.sensors import apply_ultrasonic_noise

SCAN_RAYS = 181                      # esp32_firmware/src/main.cpp:33
SCAN_FOV = jnp.pi                    # -90..+90 deg


def scan_angles(n_rays: int = SCAN_RAYS, dtype=jnp.float32):
    """Relative beam angles, -90 deg first (LaserScan convention the bridge
    publishes: angle_min=-pi/2, increment pi/180 — udp_bridge.py:127-130)."""
    return jnp.linspace(-SCAN_FOV / 2, SCAN_FOV / 2, n_rays, dtype=dtype)


def sense_scan_true(pose_true, walls, n_rays: int = SCAN_RAYS):
    """Noise-free sweep distances from true poses. pose: [..., 3] ->
    [..., R]."""
    rel = scan_angles(n_rays, pose_true.dtype)
    world = pose_true[..., 2:3] + rel
    origins = jnp.broadcast_to(pose_true[..., None, :2], world.shape + (2,))
    return cast_rays(origins, world, walls)


def sense_scan(key, pose_true, walls, n_rays: int = SCAN_RAYS,
               cfg: SensorConfig = SensorConfig()):
    """Sweep with the ultrasonic noise model applied per beam."""
    return apply_ultrasonic_noise(key, sense_scan_true(pose_true, walls,
                                                       n_rays), cfg)


def cmd_vel_drive(linear_x, angular_z, last_cmd_age_s,
                  deadman_s: float = 0.5, wheel_base_half: float = 0.15,
                  pwm_scale: float = 510.0):
    """CMD1 -> per-wheel PWM with dead-man stop.

    Mirrors esp32_firmware/src/main.cpp:158-174: left = linear - angular *
    0.15, right = linear + angular * 0.15, scaled by 510 and clipped to
    +/-255; any command older than 500 ms stops the motors (:153-155).
    Returns (pwm_left, pwm_right) int32.
    """
    left = (linear_x - angular_z * wheel_base_half) * pwm_scale
    right = (linear_x + angular_z * wheel_base_half) * pwm_scale
    left = jnp.clip(left, -255, 255)
    right = jnp.clip(right, -255, 255)
    alive = last_cmd_age_s <= deadman_s
    z = jnp.zeros_like(left)
    return (jnp.where(alive, left, z).astype(jnp.int32),
            jnp.where(alive, right, z).astype(jnp.int32))
