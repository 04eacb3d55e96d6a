"""Odometry models: drift integration, encoder counts, yaw quantisation.

Reproduces the reference's per-bot dead-reckoning error model
(generate_fake_dual_session.py:395-453): a per-agent translation scale bias
(Bot1 under-reports x0.998, Bot2 over-reports x1.002), a signed yaw bias
proportional to distance travelled (-/+0.008 rad/m), Gaussian noise on both,
and midpoint integration of the drifted pose. Encoder totals accumulate
floor(d_est / 0.0107 m) ticks (:460-462) and reported yaw is quantised to
15 degrees (:468), matching the firmware's commanded-yaw convention
(AgentFirmware_Bot1.ino:269-281, 704-707).

All functions are element-wise over an arbitrary agent batch: the per-agent
parameters (scale, yaw bias sign) are arrays, not forked source files.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from swarm_tpu.config import NoiseConfig
from swarm_tpu.utils.angles import wrap_pi


class OdomState(NamedTuple):
    """Drifted (estimated) pose integrator state, batched [...]."""
    x_est: jnp.ndarray
    y_est: jnp.ndarray
    yaw_est: jnp.ndarray
    encoder_total: jnp.ndarray   # int32
    prev_x_est: jnp.ndarray      # previous emit position (encoder baseline)
    prev_y_est: jnp.ndarray


def odom_init(x0, y0, yaw0) -> OdomState:
    x0 = jnp.asarray(x0)
    return OdomState(
        x_est=jnp.asarray(x0), y_est=jnp.asarray(y0), yaw_est=jnp.asarray(yaw0),
        encoder_total=jnp.zeros(jnp.shape(x0), jnp.int32),
        prev_x_est=jnp.asarray(x0), prev_y_est=jnp.asarray(y0))


def drift_integrate(key, state: OdomState, d_trans, d_rot, trans_scale,
                    yaw_bias_per_m, cfg: NoiseConfig = NoiseConfig()) -> OdomState:
    """One drift-integration step from a TRUE motion delta.

    d_trans: [...] true translation magnitude this step (metres).
    d_rot:   [...] true wrapped rotation delta (radians).
    trans_scale:    per-agent scale factor (e.g. 0.998 / 1.002, ref :407, :436).
    yaw_bias_per_m: per-agent signed yaw drift (e.g. -0.008 / +0.008, :414, :444).

    Matches generate_fake_dual_session.py:395-453 semantics:
      moving (d_trans > 1 mm): scaled + Gaussian translation noise, yaw bias
        proportional to distance + Gaussian noise;
      turning in place (|d_rot| > 0.01): yaw noise only;
      still: exact.
    Midpoint integration: translation applied along yaw_new - d_rot_noisy/2
    (ref :422-423).
    """
    k_t, k_r, k_s = jax.random.split(key, 3)
    moving = d_trans > 1e-3
    turning = jnp.abs(d_rot) > 0.01

    d_trans_noisy = d_trans * trans_scale + jnp.where(
        moving, cfg.trans_noise_sigma * jax.random.normal(k_t, jnp.shape(d_trans)), 0.0)
    d_trans_noisy = jnp.maximum(0.0, d_trans_noisy)

    rot_noise_moving = d_trans * yaw_bias_per_m + \
        cfg.yaw_noise_sigma * jax.random.normal(k_r, jnp.shape(d_rot))
    rot_noise_turning = cfg.yaw_noise_sigma_turning * \
        jax.random.normal(k_s, jnp.shape(d_rot))
    d_rot_noisy = d_rot + jnp.where(
        moving, rot_noise_moving, jnp.where(turning, rot_noise_turning, 0.0))

    yaw_new = wrap_pi(state.yaw_est + d_rot_noisy)
    heading = yaw_new - d_rot_noisy / 2.0
    x_new = state.x_est + d_trans_noisy * jnp.cos(heading)
    y_new = state.y_est + d_trans_noisy * jnp.sin(heading)
    return state._replace(x_est=x_new, y_est=y_new, yaw_est=yaw_new)


def encoder_emit(state: OdomState, cfg: NoiseConfig = NoiseConfig()):
    """Accumulate encoder ticks from estimated displacement since the last
    telemetry emit (ref :460-463). Returns (new_state, encoder_total)."""
    d = jnp.sqrt((state.x_est - state.prev_x_est) ** 2 +
                 (state.y_est - state.prev_y_est) ** 2)
    ticks = jnp.maximum(0, (d / cfg.encoder_m_per_tick).astype(jnp.int32))
    total = state.encoder_total + ticks
    new = state._replace(encoder_total=total,
                         prev_x_est=state.x_est, prev_y_est=state.y_est)
    return new, total


def quantize_yaw_deg(yaw_rad, step_deg: float = 15.0):
    """Reported yaw quantised to the commanded-turn grid (ref :468).
    jnp.round is round-half-to-even; the reference's Python round() is too."""
    deg = jnp.degrees(yaw_rad)
    return jnp.round(deg / step_deg) * step_deg


def firmware_odometry_step(x, y, yaw_cmd, encoder_counts,
                           cm_per_groove: float = 21.0 / 20.0):
    """Firmware dead-reckoning: encoder ticks -> metres along the COMMANDED
    yaw (not IMU yaw) to avoid gyro drift — an explicit reference design
    decision (AgentFirmware_Bot1.ino:269-281, 704-707)."""
    m = jnp.maximum(encoder_counts, 0).astype(jnp.float32) * cm_per_groove / 100.0
    return x + m * jnp.cos(yaw_cmd), y + m * jnp.sin(yaw_cmd), m
