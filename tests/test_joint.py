"""Joint multi-agent pose-graph refinement (slam/joint.py).

The collaborative-SLAM capability: cross-agent closure edges (which the
reference only ever turns into per-agent positional nudges, and which
per-agent refinement must DROP) couple agents into one joint solve, so a
well-localised agent corrects a drifted partner through their shared
landmarks.
"""

import numpy as np

from swarm_tpu.slam.joint import (agent_components, joint_refine_session,
                                  split_closures)
from swarm_tpu.slam.refine import refine_session


def _two_agent_session(t_steps=200, drift_b=0.004, drift_a=-0.0015):
    """Agents 1 and 2 walk the same corridor in a SHARED frame with
    INDEPENDENT opposite lateral drifts (the realistic swarm case — per
    the reference's per-bot calibration signs,
    generate_fake_dual_session.py:407-444).
    Truth crosses the same physical spots at matching step indices.

    Rows interleave (agent 1 = even rows). Returns (session, truth[x,y],
    closure log) where closures tie the agents' nodes at rendezvous
    steps via GLOBAL row indices — the slam_closures.csv convention."""
    n = 2
    t = np.arange(t_steps, dtype=np.float64)
    # truth: both traverse the corridor at the same speed; agent 2 weaves
    # but MEETS agent 1's lane (y=0) exactly at the rendezvous steps
    # (every 40 from 20) — closure edges assume coincident true positions
    true_x = np.stack([0.05 * t, 0.05 * t], axis=1)          # [T, 2]
    true_y = np.stack([np.zeros(t_steps),
                       0.25 * np.sin(2 * np.pi * (t - 20) / 40)], axis=1)
    # estimates: independent linear lateral drifts
    est_x = true_x.copy()
    est_y = true_y.copy()
    est_y[:, 0] += drift_a * t
    est_y[:, 1] += drift_b * t
    yaw = np.zeros((t_steps, n))

    session = {
        "t": np.repeat(t * 0.4, n),
        "agent": np.tile(np.arange(1, n + 1), t_steps),
        "x": est_x.reshape(-1),
        "y": est_y.reshape(-1),
        "yaw_deg": np.degrees(yaw.reshape(-1)),
        "landmark": np.zeros(t_steps * n, np.int64),
    }
    # closure log: every 40 steps the agents pass the same doorway —
    # agent 2's node matches the landmark agent 1 stored at that step.
    meet = np.arange(20, t_steps, 40)
    ni = (meet * n).astype(np.int64)          # agent 1's global rows
    nj = (meet * n + 1).astype(np.int64)      # agent 2's global rows
    ag = np.full(len(meet), 2, np.int64)
    truth = np.stack([true_x.reshape(-1), true_y.reshape(-1)], axis=-1)
    return session, truth, (ni, nj, ag)


def _ate(out, truth, agent_rows):
    err = []
    for a, r in out.items():
        e = np.hypot(r["poses"][:, 0] - truth[r["idx"], 0],
                     r["poses"][:, 1] - truth[r["idx"], 1])
        err.append((a, float(e.mean()), float(e[-20:].mean())))
    return dict((a, (m, l)) for a, m, l in err)


def test_split_closures_cross_agent():
    session, _, closures = _two_agent_session()
    intra, intra_meas, inter, rows_of = split_closures(session, closures)
    assert intra[1] == [] and intra[2] == []
    assert len(inter) == 5
    # stored->current direction + per-agent indices
    for ai, ii, aj, jj, meas in inter:
        assert {ai, aj} == {1, 2}
        assert ii == jj                      # same step index per agent
        assert meas is None                  # no scan measurements logged


def test_agent_components():
    comps = agent_components([1, 2, 3, 4],
                             [(1, 0, 2, 0, None), (2, 5, 1, 9, None)])
    comps = sorted(comps)
    assert (1, 2) in comps and (3,) in comps and (4,) in comps


def test_joint_refinement_corrects_drifted_partner():
    session, truth, closures = _two_agent_session()
    # raw drift of agent 2 at the end: 0.004 * 200 = 0.8 m
    per_agent = refine_session(session, closures=closures)
    joint = joint_refine_session(session, closures=closures)

    ate_pa = _ate(per_agent, truth, None)
    ate_j = _ate(joint, truth, None)

    # per-agent refinement DROPS the cross-agent edges: agent 2 keeps
    # its full drift
    assert ate_pa[2][1] > 0.55
    # the joint solve pulls agent 2 back through agent 1's frame
    assert ate_j[2][1] < 0.5 * ate_pa[2][1]
    assert ate_j[2][0] < 0.5 * ate_pa[2][0]
    # coincidence edges average the agents' INDEPENDENT drifts, so the
    # less-drifted agent must improve too (not be dragged down), and
    # the ensemble total must drop hard
    assert ate_j[1][0] <= ate_pa[1][0] + 0.02
    total_pa = ate_pa[1][0] + ate_pa[2][0]
    total_j = ate_j[1][0] + ate_j[2][0]
    assert total_j < 0.6 * total_pa
    assert joint[2]["inter_edges"] == 5
    assert joint[1]["component"] == (1, 2)


def test_joint_falls_back_per_agent_without_inter_edges():
    session, truth, closures = _two_agent_session()
    # strip the closure log -> no inter edges -> identical to per-agent
    empty = (np.zeros(0, np.int64),) * 3
    joint = joint_refine_session(session, closures=empty)
    per_agent = refine_session(session, closures=empty)
    for a in (1, 2):
        np.testing.assert_allclose(joint[a]["poses"],
                                   per_agent[a]["poses"], atol=1e-5)
        assert joint[a]["component"] == (a,)
        assert joint[a]["inter_edges"] == 0
