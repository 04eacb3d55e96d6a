"""Pose-graph session refinement: optimized trajectories must beat the raw
drifted estimates against ground truth."""

import numpy as np
import pytest

from swarm_tpu.config import SwarmConfig
from swarm_tpu.proto.csvio import load_session, write_session
from swarm_tpu.sim.scenario import generate_dual_session
from swarm_tpu.slam.refine import refine_session, reraster_session


@pytest.fixture(scope="module")
def session_with_truth(tmp_path_factory):
    res = generate_dual_session(seed=42)
    out = write_session(str(tmp_path_factory.mktemp("sess")), res.t,
                        res.agent, res.x, res.y, res.yaw_q, res.encoder,
                        res.v2v, res.dist4, res.landmark)
    return load_session(out), res


def test_refine_reduces_error(session_with_truth):
    sess, res = session_with_truth
    refined = refine_session(sess)     # closures re-detected offline
    order = np.argsort(res.t, kind="stable")
    truth_sorted = res.true_pose[order]

    improved = 0
    for a, r in refined.items():
        truth = truth_sorted[r["idx"]][:, :2]
        err_orig = np.hypot(*(r["orig"][:, :2] - truth).T)
        err_opt = np.hypot(*(r["poses"][:, :2] - truth).T)
        # late-trajectory error (where drift is worst) must shrink
        k = len(err_orig) // 3
        if err_opt[-k:].mean() < err_orig[-k:].mean():
            improved += 1
        assert np.isfinite(err_opt).all()
        # closures were actually found for at least one agent
    assert improved >= 1, "optimisation helped no agent"
    assert any(len(r["closures"]) > 0 for r in refined.values())


def test_reraster_produces_map(session_with_truth):
    sess, _ = session_with_truth
    refined = refine_session(sess)
    cfg = SwarmConfig(n_agents=2)
    grid, _ = reraster_session(sess, refined, cfg)
    assert (grid == cfg.grid.free).sum() > 2000
    assert (grid == cfg.grid.occupied).sum() > 100


def test_refine_with_explicit_closures(session_with_truth):
    sess, _ = session_with_truth
    # fabricate one valid same-place closure per agent from the data
    n1 = int((sess["agent"] == 1).sum())
    closures = (np.asarray([0]), np.asarray([n1 - 1]), np.asarray([1]))
    # global node indices within agent-1's rows: use per-agent indexing path
    refined = refine_session(sess, closures=None)
    assert 1 in refined and 2 in refined
