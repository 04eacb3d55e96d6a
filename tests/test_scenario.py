"""Scenario generator: reference session semantics (true-vs-estimate
separation, noise/channel models, CSV schema) and the full
generate -> CSV -> replay pipeline."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_tpu.config import SwarmConfig
from swarm_tpu.engine.replay import replay_session
from swarm_tpu.proto.csvio import (
    TELEMETRY_COLUMNS, load_session, packet_stream_from_telemetry,
    write_session)
from swarm_tpu.sim.scenario import (
    generate_dual_session, interpolate_waypoints, perimeter_sweep_waypoints)


@pytest.fixture(scope="module")
def session():
    return generate_dual_session(seed=42)


def test_deterministic(session):
    again = generate_dual_session(seed=42)
    np.testing.assert_array_equal(session.t, again.t)
    np.testing.assert_array_equal(session.x, again.x)


def test_true_vs_estimate_separation(session):
    """Telemetry reports the DRIFTED pose; drift grows with travel
    (generate_fake_dual_session.py:455-457 + SURVEY §3.3 'key semantic')."""
    for a in (1, 2):
        m = session.agent == a
        drift = np.hypot(session.x[m] - session.true_pose[m, 0],
                         session.y[m] - session.true_pose[m, 1])
        assert drift[0] < 0.02
        assert 0.05 < drift[-1] < 1.5        # accumulated, bounded
        # early drift smaller than late drift on average
        k = len(drift) // 4
        assert drift[:k].mean() < drift[-k:].mean()


def test_yaw_quantised_15_deg(session):
    deg = np.degrees(session.yaw_q)
    assert np.allclose(np.round(deg / 15) * 15, deg, atol=1e-4)


def test_duplicates_present(session):
    """~5 % duplicate packets (generate_fake_dual_session.py:471-473)."""
    # duplicates share encoder+agent+pose but differ slightly in t
    key = np.stack([session.agent, session.encoder,
                    np.round(session.x, 6)], axis=-1)
    _, counts = np.unique(key, axis=0, return_counts=True)
    dup_frac = (counts > 1).sum() / len(counts)
    assert 0.005 < dup_frac < 0.25


def test_encoder_monotonic(session):
    for a in (1, 2):
        e = session.encoder[session.agent == a]
        assert (np.diff(e) >= 0).all()
        assert e[-1] > 500          # ~ traveled metres / 0.0107


def test_agents_cover_their_halves(session):
    """Bot1 sweeps the left half, Bot2 the right (ref waypoints)."""
    x1 = session.true_pose[session.agent == 1, 0]
    x2 = session.true_pose[session.agent == 2, 0]
    assert x1.min() < 0.2 and x1.max() < 3.2
    assert x2.max() > 4.8 and x2.min() > 2.2


def test_stuck_fault_injected(session):
    """Bot2 wiggles ~40 extra steps near the top-right corner."""
    m2 = session.agent == 2
    near = (np.abs(session.true_pose[m2, 0] - 5.2) < 0.3) & \
           (np.abs(session.true_pose[m2, 1] - 1.7) < 0.3)
    assert near.sum() > 30


def test_wiggle_controller_bounded():
    rng = np.random.default_rng(0)
    poses = interpolate_waypoints(
        perimeter_sweep_waypoints(+1, start=(0.0, 0.0)), rng)
    # trajectory stays inside the room with margin for the wiggle
    assert poses[:, 0].min() > -0.55 and poses[:, 0].max() < 5.55
    assert np.abs(poses[:, 1]).max() < 2.05


def test_csv_schema_and_replay(tmp_path, session):
    out = write_session(str(tmp_path / "sess"), session.t, session.agent,
                        session.x, session.y, session.yaw_q, session.encoder,
                        session.v2v, session.dist4, session.landmark)
    with open(os.path.join(out, "telemetry.csv")) as f:
        header = f.readline().strip().split(",")
    assert header == TELEMETRY_COLUMNS

    sess = load_session(out)
    assert len(sess["t"]) == len(session.t)
    # time-sorted on load (playback_dual_session.py:58-105)
    assert (np.diff(sess["t"]) >= 0).all()

    stream = packet_stream_from_telemetry(sess)
    cfg = SwarmConfig(n_agents=2)
    st, _ = jax.jit(lambda s: replay_session(
        s, cfg, offsets=jnp.zeros(2)))(stream)
    g = np.asarray(st.grid)
    assert (g == cfg.grid.free).sum() > 2000
    assert (g == cfg.grid.occupied).sum() > 100


def test_yaw_roundtrip_degrees(tmp_path, session):
    """yaw is stored in degrees with 2 decimals; quantised values survive."""
    out = write_session(str(tmp_path / "s2"), session.t, session.agent,
                        session.x, session.y, session.yaw_q, session.encoder,
                        session.v2v, session.dist4, session.landmark)
    sess = load_session(out)
    orig_sorted = np.sort(np.degrees(session.yaw_q))
    load_sorted = np.sort(sess["yaw_deg"])
    np.testing.assert_allclose(orig_sorted, load_sorted, atol=0.01)
