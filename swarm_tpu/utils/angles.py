"""Angle helpers shared across the stack."""

import jax.numpy as jnp


def wrap_pi(theta):
    """Wrap angle(s) to (-pi, pi].

    The reference wraps with while-loops (e.g. AgentFirmware_Bot1.ino:351-352,
    ekf.cpp:43-44, generate_fake_dual_session.py:402-403); a closed-form
    modulo is branch-free and jit/vmap friendly and agrees for all finite
    inputs that are a bounded number of turns away.
    """
    return jnp.mod(theta + jnp.pi, 2.0 * jnp.pi) - jnp.pi
