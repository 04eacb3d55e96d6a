"""End-to-end parity: the jitted replay engine vs the sequential CPU oracle
implementing the reference server's semantics (map cells bit-equal, same
closures, same drift corrections)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_tpu.config import SwarmConfig
from swarm_tpu.engine.replay import PacketStream, replay_session
from tests.oracle_mapper import OracleServer


def make_stream(rng, n_packets=600, n_agents=2):
    """Two agents wandering a 6x4 room, periodically revisiting a corner so
    loop closures actually fire."""
    t = np.cumsum(rng.uniform(0.05, 0.15, n_packets)).astype(np.float32)
    agent = (np.arange(n_packets) % n_agents).astype(np.int32)
    # Smooth-ish wandering with revisits: sinusoidal paths + noise.
    ph = rng.uniform(0, 2 * np.pi, n_agents)
    steps = np.arange(n_packets) / 40.0
    x = 2.5 + 2.0 * np.sin(steps + ph[agent]) + rng.normal(0, 0.05, n_packets)
    y = 0.0 + 1.2 * np.sin(2.3 * steps + ph[agent]) + rng.normal(0, 0.05, n_packets)
    yaw = rng.uniform(-math.pi, math.pi, n_packets)
    dist = rng.uniform(0.0, 1.6, (n_packets, 4))     # mix of valid + invalid
    dist[rng.random((n_packets, 4)) < 0.1] = 4.0     # timeout sentinels
    lm = np.where(rng.random(n_packets) < 0.25,
                  rng.integers(1, 6, n_packets), 0).astype(np.int32)
    return (t, agent, x.astype(np.float32), y.astype(np.float32),
            yaw.astype(np.float32), dist.astype(np.float32), lm)


@pytest.fixture(scope="module")
def parity_run():
    rng = np.random.default_rng(7)
    t, agent, x, y, yaw, dist, lm = make_stream(rng)
    n = len(t)

    oracle = OracleServer(n_agents=2)
    for i in range(n):
        oracle.ingest(float(t[i]), int(agent[i]), float(x[i]), float(y[i]),
                      float(yaw[i]), [float(d) for d in dist[i]], int(lm[i]))

    cfg = SwarmConfig(n_agents=2)
    stream = PacketStream(
        t=jnp.asarray(t), agent=jnp.asarray(agent), x=jnp.asarray(x),
        y=jnp.asarray(y), yaw=jnp.asarray(yaw),
        encoder=jnp.zeros(n, jnp.int32), v2v=jnp.zeros(n, jnp.int32),
        dist=jnp.asarray(dist), landmark=jnp.asarray(lm),
        valid=jnp.ones(n, bool))
    state, outs = jax.jit(
        lambda s: replay_session(s, cfg))(stream)
    return oracle, state, outs


def test_grid_bit_equal(parity_run):
    oracle, state, _ = parity_run
    np.testing.assert_array_equal(np.asarray(state.grid), oracle.grid.grid)


def test_closures_match(parity_run):
    oracle, state, outs = parity_run
    got_n = int(state.closure.cl_count)
    assert got_n == len(oracle.slam.closures)
    assert got_n > 0, "test stream produced no closures — weak test"
    got = np.stack([np.asarray(state.closure.cl_lm_node)[:got_n],
                    np.asarray(state.closure.cl_node)[:got_n]], -1)
    want = np.array([(c[0], c[1]) for c in oracle.slam.closures])
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(
        np.asarray(state.closure.cl_dx)[:got_n],
        [c[2] for c in oracle.slam.closures], rtol=1e-4, atol=1e-5)


def test_corrected_poses_match(parity_run):
    oracle, _, outs = parity_run
    want = np.array(oracle.log, dtype=np.float32)
    got = np.stack([np.asarray(outs.rx), np.asarray(outs.ry)], -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_drift_accumulation_matches(parity_run):
    oracle, state, _ = parity_run
    np.testing.assert_allclose(
        np.asarray(state.closure.drift_dx),
        [oracle.drift[a][0] for a in range(2)], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.closure.drift_dy),
        [oracle.drift[a][1] for a in range(2)], rtol=1e-4, atol=1e-5)


def test_padding_rows_are_noops(parity_run):
    """Re-run with padding appended — identical final grid + closures."""
    oracle, state, _ = parity_run
    rng = np.random.default_rng(7)
    t, agent, x, y, yaw, dist, lm = make_stream(rng)
    n = len(t)
    pad = 57
    z32 = lambda a: jnp.asarray(np.concatenate([a, np.zeros(pad, a.dtype)]))
    stream = PacketStream(
        t=z32(t), agent=jnp.asarray(np.concatenate([agent, np.zeros(pad, np.int32)])),
        x=z32(x), y=z32(y), yaw=z32(yaw),
        encoder=jnp.zeros(n + pad, jnp.int32), v2v=jnp.zeros(n + pad, jnp.int32),
        dist=jnp.asarray(np.concatenate([dist, np.zeros((pad, 4), np.float32)])),
        landmark=jnp.asarray(np.concatenate([lm, np.zeros(pad, np.int32)])),
        valid=jnp.asarray(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])))
    cfg = SwarmConfig(n_agents=2)
    state2, _ = replay_session(stream, cfg)
    np.testing.assert_array_equal(np.asarray(state2.grid), np.asarray(state.grid))
    assert int(state2.closure.cl_count) == int(state.closure.cl_count)
