"""Interactive operator view (server/view.py) — the reference's PyGame
dashboard (dual_bot_mapper.py:380-668) and replay controls
(playback_dual_session.py:163-219) as an HTTP view."""

import json
import os
import urllib.request

import numpy as np

from swarm_tpu.server.view import MapView, PlaybackSource, render_view


def _snap(n=2, s=64):
    grid = np.full((s, s), -1, np.int8)
    grid[10:50, 10:50] = 0
    grid[10, 10:50] = 100
    return {
        "grid": grid,
        "resolution": 0.05,
        "origin": (0.0, 0.0),
        "poses": np.array([[1.0, 1.0, 0.3], [2.0, 1.5, -1.0]][:n]),
        "online": np.array([True, False][:n]),
        "pkt_counts": np.array([17, 5][:n]),
        "zones": np.array([[0.5, 0.5, 1.5, 1.2], [0, 0, 0, 0]][:n]),
        "zone_active": np.array([True, False][:n]),
        "frontiers": np.array([[1.2, 1.2]]),
        "n_frontiers": 1,
        "closures": 3,
        "pkt_total": 22,
        "t": 12.5,
    }


def test_render_view_draws_window():
    img = render_view(_snap(), cx=1.5, cy=1.5, zoom=100, w=320, h=240)
    assert img.shape == (240, 320, 3)
    # free/occupied/background all present, robots stamped
    colors = {tuple(c) for c in img.reshape(-1, 3)}
    assert (34, 40, 49) in colors          # free
    assert (120, 200, 255) in colors       # occupied wall row
    assert (255, 120, 90) in colors        # bot 1 marker
    assert (128, 128, 128) in colors       # offline bot 2
    assert (255, 80, 80) in colors         # zone outline


def test_render_view_zoom_clamped_and_offcenter():
    # extreme zoom + center far outside the grid must not crash
    img = render_view(_snap(), cx=900.0, cy=-900.0, zoom=1e9, w=64, h=64)
    assert img.shape == (64, 64, 3)
    img = render_view(_snap(), cx=0, cy=0, zoom=1.0, w=64, h=64)
    assert img.shape == (64, 64, 3)


def test_http_view_endpoints():
    view = MapView(_snap, port=0)          # ephemeral port
    view.start()
    try:
        base = f"http://127.0.0.1:{view.port}"
        html = urllib.request.urlopen(base + "/").read()
        assert b"swarm_tpu live view" in html
        hud = json.load(urllib.request.urlopen(base + "/hud.json"))
        assert hud["pkt_total"] == 22 and hud["closures"] == 3
        assert hud["bots"][0]["online"] and not hud["bots"][1]["online"]
        png = urllib.request.urlopen(
            base + "/map.png?cx=1.5&cy=1.5&zoom=150&w=400&h=300").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        view.stop()


def _write_session(tmp_path):
    os.makedirs(tmp_path, exist_ok=True)
    with open(os.path.join(tmp_path, "telemetry.csv"), "w") as f:
        f.write("time,agent,x,y,yaw_deg,encoder,v2v,front_cm,"
                "left_cm,back_cm,right_cm,landmark\n")
        for k in range(20):
            for a in (1, 2):
                f.write(f"{k * 0.5},{a},{0.1 * k},{0.2 * a},0.0,{k},0,"
                        f"50,80,100,60,0\n")
    with open(os.path.join(tmp_path, "pointcloud.csv"), "w") as f:
        f.write("time,agent,sensor,x,y\n")
        for k in range(20):
            f.write(f"{k * 0.5},1,front,{0.1 * k + 0.5},0.4\n")


def test_playback_source_controls(tmp_path):
    d = str(tmp_path / "sess")
    _write_session(d)
    src = PlaybackSource(d, speed=2.0)
    s1 = src.snapshot()
    assert s1["playback"]["speed"] == 2.0
    assert s1["poses"].shape == (2, 3)
    src.ctl("pause")
    t1 = src.snapshot()["t"]
    t2 = src.snapshot()["t"]
    assert t1 == t2                         # frozen
    src.ctl("speed", 50.0)
    assert src.speed == 20.0                # ref clamp 0.1-20x
    src.ctl("pause")                        # resume
    src._last_wall -= 1.0                   # simulate 1 s of wall time
    t3 = src.snapshot()["t"]
    assert t3 > t2 + 5                      # 20x speed advanced the clock
    src.ctl("reset")
    assert src.snapshot()["t"] < 1.0
    img = render_view(src.snapshot(), cx=1.0, cy=0.4, zoom=100,
                      w=200, h=150)
    assert img.shape == (150, 200, 3)
