"""Renderer + CLI session runner."""

import json
import os

import numpy as np
import jax.numpy as jnp

from swarm_tpu.config import GridConfig
from swarm_tpu.render import render_map, render_points, save_png
from swarm_tpu.cli.run_session import main as cli_main


def test_render_map_colors():
    cfg = GridConfig()
    grid = np.full((cfg.size, cfg.size), -1, np.int8)
    grid[90:110, 90:110] = 0          # free block around origin
    grid[100, 120] = 100              # one occupied cell
    img = np.asarray(render_map(jnp.asarray(grid), cfg, scale=1))
    assert img.shape == (200, 200, 3)
    # row 0 = max y: grid row 100 -> image row 99
    assert tuple(img[99, 120]) == (120, 200, 255)     # occupied
    assert tuple(img[99, 100]) == (34, 40, 49)        # free
    assert tuple(img[0, 0]) == (15, 18, 24)           # unknown


def test_render_points_and_poses():
    cfg = GridConfig()
    grid = jnp.full((cfg.size, cfg.size), -1, jnp.int8)
    pts = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [99.0, 99.0]])  # last off-map
    img = np.asarray(render_map(
        grid, cfg, scale=2, points_xy=pts,
        points_agent=jnp.asarray([0, 1, 0]),
        poses=jnp.asarray([[0.5, 0.5, 0.0]])))
    assert img.shape == (400, 400, 3)
    assert img.sum() > 0
    pimg = np.asarray(render_points(pts, jnp.asarray([0, 1, 0]), cfg))
    assert pimg.shape == (400, 400, 3)


def test_save_png(tmp_path):
    img = jnp.zeros((16, 16, 3), jnp.uint8)
    p = save_png(img, str(tmp_path / "m.png"))
    assert os.path.getsize(p) > 0


def test_cli_dual_bot(tmp_path):
    out = str(tmp_path / "s")
    cli_main(["--preset", "dual_bot", "--out", out, "--steps", "40"])
    for fn in ("telemetry.csv", "pointcloud.csv", "slam_closures.csv",
               "map.png", "metrics.json"):
        assert os.path.exists(os.path.join(out, fn)), fn
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert m["packets"] == 80          # 40 steps x 2 agents, all alive
    assert m["total_cell_writes"] > 0


def test_cli_scripted(tmp_path):
    out = str(tmp_path / "s2")
    cli_main(["--preset", "dual_bot_scripted", "--out", out])
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert m["total_cell_writes"] > 10000
    assert m["closures"] > 0
    assert os.path.exists(os.path.join(out, "map.png"))
