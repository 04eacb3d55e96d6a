"""4-way ultrasonic sensing: exact ray cast from the TRUE pose + noise.

Key reference semantic (generate_fake_dual_session.py:455-457 and SURVEY §3.3):
sensors are cast from the TRUE pose while telemetry reports the DRIFTED
estimated pose — this separation is what makes loop closure meaningful, and
it is preserved here.

Noise model (generate_fake_dual_session.py:100-108): Gaussian sigma = 35 mm,
6 % spurious uniform(0.02, 2.5) m, floor at 0.01 m. The firmware variant adds
the HC-SR04 stack's behaviors: 4.0 m timeout sentinel
(AgentFirmware_Bot1.ino:239) and a median-of-3 filter (:243-253).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from swarm_tpu.config import SensorConfig
from swarm_tpu.geom.world import cast_rays


def sense_true(pose_true, walls, cfg: SensorConfig = SensorConfig()):
    """Noise-free 4-ray distances from true poses.

    pose_true: [..., 3] (x, y, yaw). Returns [..., 4] ordered
    (front, left, back, right)."""
    angles = jnp.asarray(cfg.angles, pose_true.dtype)            # [4]
    world_angles = pose_true[..., 2:3] + angles                  # [..., 4]
    origins = jnp.broadcast_to(
        pose_true[..., None, :2], world_angles.shape + (2,))
    return cast_rays(origins, world_angles, walls)


def apply_ultrasonic_noise(key, true_dist, cfg: SensorConfig = SensorConfig()):
    """Reference noise model on top of true distances (any batch shape)."""
    k_gauss, k_spur_p, k_spur_v = jax.random.split(key, 3)
    noisy = true_dist + cfg.noise_sigma * jax.random.normal(
        k_gauss, true_dist.shape, true_dist.dtype)
    spurious = jax.random.uniform(
        k_spur_v, true_dist.shape, true_dist.dtype,
        cfg.spurious_lo, cfg.spurious_hi)
    is_spur = jax.random.uniform(k_spur_p, true_dist.shape) < cfg.spurious_prob
    noisy = jnp.where(is_spur, spurious, noisy)
    return jnp.maximum(cfg.floor, noisy)


def sense_4way(key, pose_true, walls, cfg: SensorConfig = SensorConfig()):
    """Full sensing step: exact cast + reference noise. [..., 4] metres."""
    return apply_ultrasonic_noise(key, sense_true(pose_true, walls, cfg), cfg)


def sense_4way_median3(key, pose_true, walls, cfg: SensorConfig = SensorConfig()):
    """Firmware-style sensing: three noisy pings per channel, median-of-3
    (AgentFirmware_Bot1.ino:243-253), with readings beyond the sonar's
    envelope reported as the 4.0 m timeout sentinel (:239)."""
    true_dist = sense_true(pose_true, walls, cfg)
    keys = jax.random.split(key, 3)
    pings = jnp.stack(
        [apply_ultrasonic_noise(k, true_dist, cfg) for k in keys], axis=0)
    med = jnp.median(pings, axis=0)
    return jnp.where(med > cfg.timeout_sentinel, cfg.timeout_sentinel, med)
