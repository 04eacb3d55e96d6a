"""Live UDP server integration: real sockets on localhost — generator
session fired as wire packets -> jitted ingest -> map + ZONE replies."""

import socket
import threading
import time

import numpy as np
import pytest

from swarm_tpu.config import SwarmConfig
from swarm_tpu.proto.packets import (QuasarPacketV2, ZonePacket,
                                     parse_packet)
from swarm_tpu.server.live import LiveServer


@pytest.fixture
def free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def make_packets(n=120):
    """Two bots tracing simple wall-hugging paths with valid ranges."""
    pkts = []
    for i in range(n):
        a = i % 2 + 1
        x = (i // 2) * 0.05
        y = 0.0 if a == 1 else 0.3
        pkts.append(QuasarPacketV2(a, x, y, 0.0, i, 0,
                                   1.0, 0.5, 4.0, 0.5, 0))
    return pkts


def test_live_server_ingest_and_zone_reply(free_port, tmp_path):
    cfg = SwarmConfig(n_agents=2)
    srv = LiveServer(cfg, port=free_port, separation=5.0,
                     log_dir=str(tmp_path / "live"))

    # a fake bot socket that will receive ZONE packets
    bot_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    bot_sock.bind(("127.0.0.1", 0))
    bot_sock.settimeout(2.0)
    bot_port = bot_sock.getsockname()[1]

    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.bind(("127.0.0.1", 0))          # ephemeral sender port
    try:
        # ingest frames directly (no background thread needed)
        pkts = make_packets(120)
        for i in range(0, len(pkts), 10):
            for p in pkts[i:i + 10]:
                tx.sendto(p.pack(), ("127.0.0.1", free_port))
            time.sleep(0.01)
            got = srv.drain_socket()
            if got:
                srv.ingest(got)

        assert srv.pkt_total > 100
        g = np.asarray(srv.state.grid)
        assert (g == cfg.grid.free).sum() > 50
        assert (g == cfg.grid.occupied).sum() > 3

        # heartbeat sees both bots
        online = srv.heartbeat_transitions()
        assert online.sum() == 2

        # point the learned bot addresses at our fake bot and ask for zones
        srv.bot_addrs = {0: ("127.0.0.1", bot_port),
                         1: ("127.0.0.1", bot_port)}
        sent = srv.send_zones()
        assert sent == 2
        z = parse_packet(bot_sock.recv(64))
        assert isinstance(z, ZonePacket)
    finally:
        tx.close()
        bot_sock.close()
        srv.close()

    # session logs landed
    tele = (tmp_path / "live" / "telemetry.csv").read_text().splitlines()
    assert len(tele) > 100


def test_run_loop_broadcasts_zones_on_cadence(free_port):
    """run() itself must TX ZONE packets every zone_interval_s (the
    reference main loop broadcasts every 2 s, dual_bot_mapper.py:921-945)
    — round-1 advisor finding: send_zones() was dead code outside tests."""
    cfg = SwarmConfig(n_agents=2)
    srv = LiveServer(cfg, port=free_port)

    bot_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    bot_sock.bind(("127.0.0.1", 0))
    bot_sock.settimeout(2.0)
    bot_port = bot_sock.getsockname()[1]
    srv.bot_addrs = {0: ("127.0.0.1", bot_port)}
    try:
        # duration is measured from server creation (includes the warm-up
        # compile), so extend from now(); first zone cadence fires at once
        srv.run(duration_s=srv.now() + 0.3, fps=60.0)
        z = parse_packet(bot_sock.recv(64))
        assert isinstance(z, ZonePacket)
    finally:
        bot_sock.close()


def test_live_server_rejects_garbage(free_port):
    cfg = SwarmConfig(n_agents=2)
    srv = LiveServer(cfg, port=free_port)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        tx.sendto(b"not a packet", ("127.0.0.1", free_port))
        tx.sendto(b"\x00" * 42, ("127.0.0.1", free_port))
        tx.sendto(QuasarPacketV2(9, 0, 0, 0, 0, 0, 1, 1, 1, 1, 0).pack(),
                  ("127.0.0.1", free_port))     # agent out of range
        time.sleep(0.05)
        got = srv.drain_socket()
        assert got == []
    finally:
        tx.close()
        srv.close()


def test_replay_udp_tool(free_port, tmp_path):
    """generator -> CSV -> replay-udp tool -> live server."""
    from swarm_tpu.cli.tools import main as tools_main
    from swarm_tpu.proto.csvio import write_session
    from swarm_tpu.sim.scenario import generate_dual_session

    res = generate_dual_session(seed=42)
    out = write_session(str(tmp_path / "s"), res.t, res.agent, res.x, res.y,
                        res.yaw_q, res.encoder, res.v2v, res.dist4,
                        res.landmark)

    cfg = SwarmConfig(n_agents=2)
    srv = LiveServer(cfg, port=free_port, separation=0.0)
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            got = srv.drain_socket()
            if got:
                srv.ingest(got)
            else:
                time.sleep(0.002)

    th = threading.Thread(target=pump, daemon=True)
    th.start()
    try:
        sent = tools_main(["replay-udp", "--session", out,
                           "--host", "127.0.0.1", "--port", str(free_port),
                           "--speed", "0"])
        deadline = time.time() + 10
        while srv.pkt_total < sent * 0.8 and time.time() < deadline:
            time.sleep(0.05)
        assert srv.pkt_total > sent * 0.8      # UDP loss tolerated
        g = np.asarray(srv.state.grid)
        assert (g == cfg.grid.free).sum() > 1000
    finally:
        stop.set()
        th.join(timeout=2)
        srv.close()


def test_native_codec_drain_ingest(free_port, tmp_path):
    """The native batch codec path (server runtime hot path): raw UDP
    datagrams -> column arrays -> jitted ingest, same map as the Python
    struct codec path, garbage datagrams dropped, bot addrs learned."""
    import pytest

    cfg = SwarmConfig(n_agents=2)
    srv = LiveServer(cfg, port=free_port, separation=5.0,
                     log_dir=str(tmp_path / "nat"))
    if srv._native is None:
        pytest.skip("native codec not built in this environment")

    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.bind(("127.0.0.1", 0))
    try:
        pkts = make_packets(80)
        applied = 0
        for i in range(0, len(pkts), 10):
            for p in pkts[i:i + 10]:
                tx.sendto(p.pack(), ("127.0.0.1", free_port))
            tx.sendto(b"garbage-not-a-packet", ("127.0.0.1", free_port))
            time.sleep(0.01)
            applied += srv.drain_ingest()
        assert applied > 60                      # garbage dropped
        assert srv.pkt_total == applied
        assert set(srv.bot_addrs) == {0, 1}
        g = np.asarray(srv.state.grid)
        assert (g == cfg.grid.free).sum() > 50
        assert (g == cfg.grid.occupied).sum() > 3
    finally:
        tx.close()
        srv.close()


def test_throughput_ingest_matches_parity_grid(free_port, tmp_path):
    """ingest_mode='throughput' (one fused frame application) produces
    the SAME parity grid as the per-packet scan on closure-free streams
    (parity_raster is order-exact across the frame), and the same
    heartbeat/zone results."""
    cfg = SwarmConfig(n_agents=2)
    frames = [make_packets(120)[i:i + 10] for i in range(0, 120, 10)]

    srvs = {}
    for mode in ("parity", "throughput"):
        srv = LiveServer(cfg, port=0, separation=5.0, ingest_mode=mode)
        for f in frames:
            srv.ingest([(p.agent - 1, p) for p in f])
        srvs[mode] = srv
    try:
        gp = np.asarray(srvs["parity"].state.grid)
        gt = np.asarray(srvs["throughput"].state.grid)
        np.testing.assert_array_equal(gt, gp)
        assert srvs["throughput"].pkt_total == srvs["parity"].pkt_total
        np.testing.assert_allclose(
            np.asarray(srvs["throughput"].state.agent_xy),
            np.asarray(srvs["parity"].state.agent_xy), atol=1e-6)
        onl = srvs["throughput"].heartbeat_transitions()
        assert onl.sum() == 2
    finally:
        for s_ in srvs.values():
            s_.close()


def test_live_measured_closures(free_port):
    """SERVING-mode measured closures (--closure-scanmatch): scan
    payloads feed the latest-sweep table through the real socket drain,
    telemetry with landmarks stores sweeps in the landmark ring, and a
    revisit logs a fitness-gated SE(2) edge measurement."""
    import dataclasses

    import jax.numpy as jnp

    from swarm_tpu.models.scan import sense_scan_true
    from swarm_tpu.proto.packets import ScanPacket

    walls = jnp.asarray([
        [0.0, 0.0, 3.0, 0.0], [3.0, 0.0, 3.0, 3.0],
        [3.0, 3.0, 0.0, 3.0], [0.0, 3.0, 0.0, 0.0],
        [1.8, 0.0, 1.8, 1.0],
    ], jnp.float32)
    pa = (1.3, 0.7, -0.2)
    pb = (1.5, 0.6, -0.5)
    scan_a = np.asarray(sense_scan_true(jnp.asarray(pa), walls))
    scan_b = np.asarray(sense_scan_true(jnp.asarray(pb), walls))

    cfg = SwarmConfig(n_agents=1)
    cfg = cfg.replace(
        engine=dataclasses.replace(cfg.engine, scan_rays=181),
        slam=dataclasses.replace(cfg.slam, closure_scanmatch=True,
                                 min_poses_between=2,
                                 closure_same_agent_only=True))
    srv = LiveServer(cfg, port=free_port, separation=0.0,
                     ingest_mode="throughput", native_codec=False)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        def put_scan(pose, ranges):
            tx.sendto(ScanPacket(1, pose[0], pose[1], pose[2], 0, 0,
                                 ranges).pack(),
                      ("127.0.0.1", srv.port))
            deadline = time.time() + 2.0
            while time.time() < deadline:
                srv.drain_socket()
                if srv.latest_scans[0].sum() != 0 and \
                        abs(srv.latest_scans[0][0] - ranges[0]) < 1e-5:
                    return
                time.sleep(0.01)
            raise AssertionError("scan payload never reached the table")

        def telemetry(pose, landmark):
            srv.ingest([(0, QuasarPacketV2(1, pose[0], pose[1], pose[2],
                                           0, 0, 1.0, 0.5, 4.0, 0.5,
                                           landmark))])

        put_scan(pa, scan_a)
        telemetry(pa, 5)                 # store landmark + sweep
        cl = srv.state.closure
        np.testing.assert_allclose(np.asarray(cl.lm_scan[0]), scan_a,
                                   atol=1e-6)
        telemetry(pa, 0)                 # clear the node-index gap
        telemetry(pa, 0)
        put_scan(pb, scan_b)
        telemetry((pb[0] + 0.1, pb[1] - 0.06, pb[2] + 0.05), 5)  # revisit
        cl = srv.state.closure
        assert int(cl.cl_count) == 1
        assert float(cl.cl_fit[0]) >= cfg.slam.merge_fitness_min
        # the measured edge must be closer to the true relative pose
        # than the (drifted) estimate implies
        d = np.array([pb[0] - pa[0], pb[1] - pa[1]])
        ct, s_ = np.cos(pa[2]), np.sin(pa[2])
        true_t = np.array([ct * d[0] + s_ * d[1], -s_ * d[0] + ct * d[1]])
        meas_t = np.array([float(cl.cl_mx[0]), float(cl.cl_my[0])])
        assert np.linalg.norm(meas_t - true_t) < 0.08
    finally:
        tx.close()
        srv.close()
