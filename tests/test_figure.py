"""Publication figure renderer."""

import math
import os

import numpy as np

from swarm_tpu.proto.csvio import write_session
from swarm_tpu.render.figure import render_session_figure
from swarm_tpu.sim.scenario import generate_dual_session


def test_session_figure(tmp_path):
    res = generate_dual_session(seed=42)
    angles = np.asarray([0.0, math.pi / 2, math.pi, -math.pi / 2])
    valid = (res.dist4 > 0.05) & (res.dist4 <= 1.2)
    ang = res.yaw_q[:, None] + angles[None, :]
    hx = res.x[:, None] + res.dist4 * np.cos(ang)
    hy = res.y[:, None] + res.dist4 * np.sin(ang)
    out = write_session(str(tmp_path / "s"), res.t, res.agent, res.x, res.y,
                        res.yaw_q, res.encoder, res.v2v, res.dist4,
                        res.landmark, hits_xy=np.stack([hx, hy], -1),
                        hit_valid=valid)
    p = render_session_figure(out)
    assert os.path.getsize(p) > 20000
