"""Heartbeat / failover masks.

Reference: a bot is OFFLINE after 5 s of silence; its territory zone is
lifted so the survivor expands coverage; it auto-recovers on the next packet
(dual_bot_mapper.py:82, 804-812, 942-945). Here this is a pure function of
per-agent last-packet timestamps — the per-agent alive mask that gates
zones, assignment, and rendering."""

from __future__ import annotations

import jax.numpy as jnp


def heartbeat_update(last_packet_t, now, timeout_s: float = 5.0):
    """online[i] = has ever spoken AND spoke within timeout.

    last_packet_t: [N] seconds, 0.0 = never heard (ref init :760)."""
    heard = last_packet_t > 0.0
    fresh = (now - last_packet_t) <= timeout_s
    return heard & fresh
