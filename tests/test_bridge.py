"""Scan bridge: real-socket scan ingest, callbacks, CSV schema, cmd_vel
relay, beam-model mapping, and scan-log projection."""

import math
import socket
import time

import numpy as np
import pytest

from swarm_tpu.config import GridConfig
from swarm_tpu.proto.packets import CommandPacket, ScanPacket, parse_packet
from swarm_tpu.server.bridge import (SCAN_CSV_HEADER, ScanBridge,
                                     load_scan_log, scan_log_points)


@pytest.fixture
def free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def make_scan(agent=1, x=0.0, y=0.0, yaw=0.0, wall=1.0):
    ranges = np.full(181, 4.0, np.float32)
    ranges[80:101] = wall           # wall ahead
    return ScanPacket(agent, x, y, yaw, 10, 3, ranges)


def test_bridge_roundtrip(free_port, tmp_path):
    odoms, scans = [], []
    br = ScanBridge(port=free_port, log_dir=str(tmp_path),
                    on_odom=lambda a, x, y, yaw, q: odoms.append((a, x, yaw)),
                    on_scan=lambda a, r: scans.append((a, len(r))),
                    map_cfg=GridConfig(size=384))
    bot = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    bot.bind(("127.0.0.1", 0))
    bot.settimeout(2.0)
    try:
        for k in range(5):
            bot.sendto(make_scan(x=k * 0.1).pack(), ("127.0.0.1", free_port))
        time.sleep(0.05)
        n = br.poll()
        assert n == 5 and br.pkt_total == 5
        assert len(odoms) == 5 and len(scans) == 5
        assert scans[0][1] == 181
        # odom quaternion matches the bridge's publication (z, w)
        a, x, yaw = odoms[-1]
        assert a == 1 and abs(x - 0.4) < 1e-5

        # cmd_vel relay back to the learned address
        br.clients[1] = bot.getsockname()
        assert br.send_cmd_vel(1, 0.25, -0.125)
        cmd = parse_packet(bot.recv(64))
        assert cmd == CommandPacket(0.25, -0.125)

        # live beam-model map built from the scans
        lo = np.asarray(br.logodds)
        assert (lo < 0).sum() > 100      # free space carved
        assert (lo > 0).sum() > 3        # wall evidence

        # CSV schema parity
        log = load_scan_log(str(tmp_path / "agent_1_log.csv"))
        assert log["ranges"].shape == (5, 181)
        with open(tmp_path / "agent_1_log.csv") as f:
            assert f.readline().strip().split(",") == SCAN_CSV_HEADER

        pts = scan_log_points(log)
        assert len(pts) > 50
        # wall points cluster ~1.0 m ahead
        ahead = pts[np.abs(pts[:, 1]) < 0.3]
        assert np.abs(np.median(ahead[:, 0]) - 1.0) < 0.35
    finally:
        bot.close()
        br.close()


def test_bridge_accepts_743_byte_firmware_layout(free_port, tmp_path):
    """The bridge must ingest the 743 B scan layout real firmware sends
    (esp32_firmware/src/main.cpp QuasarPacket, udp_bridge.py:34) —
    round-1 advisor: these datagrams were silently dropped."""
    from swarm_tpu.proto.packets import ScanPacketBridge

    seen = []
    br = ScanBridge(port=free_port, log_dir=str(tmp_path),
                    on_scan=lambda a, r: seen.append((a, r)))
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        ranges = np.full(181, 4.0, np.float32)
        ranges[85:96] = 0.8
        pkt = ScanPacketBridge(3, 0.1, 0.2, 0.3, ranges)
        tx.sendto(pkt.pack(), ("127.0.0.1", free_port))
        time.sleep(0.05)
        assert br.poll() == 1
        assert seen and seen[0][0] == 3
        np.testing.assert_array_equal(seen[0][1], ranges)
        # CSV row landed with encoder/v2v defaulted to 0
        rows = (tmp_path / "agent_3_log.csv").read_text().splitlines()
        assert len(rows) == 2
        cols = rows[1].split(",")
        assert cols[5] == "0" and cols[6] == "0"
    finally:
        tx.close()
        br.close()


def test_bridge_ignores_non_scan(free_port):
    br = ScanBridge(port=free_port)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        tx.sendto(b"garbage", ("127.0.0.1", free_port))
        tx.sendto(CommandPacket(1.0, 1.0).pack(), ("127.0.0.1", free_port))
        time.sleep(0.02)
        assert br.poll() == 0
    finally:
        tx.close()
        br.close()


def test_ros2_layer_fields_and_guard():
    """DDS topic layer (server/ros2.py): message-field logic is pure and
    matches the reference bridge's publications (udp_bridge.py:110-138);
    without rclpy the node constructor fails with a clear error."""
    import math

    import pytest

    from swarm_tpu.server import ros2

    f = ros2.odom_msg_fields(2, 1.5, -0.5, math.pi / 2)
    assert f["topic"] == "/agent_2/odom"
    assert f["child_frame_id"] == "agent_2/base_link"
    assert f["position"] == (1.5, -0.5, 0.0)
    qx, qy, qz, qw = f["orientation"]
    assert qx == qy == 0.0
    assert abs(qz - math.sin(math.pi / 4)) < 1e-12
    assert abs(qw - math.cos(math.pi / 4)) < 1e-12

    s = ros2.scan_msg_fields(1, [0.5] * 181)
    assert s["topic"] == "/agent_1/scan"
    assert s["frame_id"] == "agent_1/laser"
    assert abs(s["angle_min"] + math.pi / 2) < 1e-12
    assert abs(s["angle_max"] - math.pi / 2) < 1e-9
    assert abs(s["angle_increment"] - math.pi / 180) < 1e-12
    assert len(s["ranges"]) == 181

    if not ros2.have_rclpy():
        from swarm_tpu.server.bridge import ScanBridge
        b = ScanBridge(port=0)
        try:
            with pytest.raises(RuntimeError, match="rclpy"):
                ros2.Ros2Bridge(b, agents=[1])
        finally:
            b.close()


def test_native_drain_and_buffer_parse():
    """recvmmsg batch drain + zero-copy buffer parse (the serve hot
    path's native pieces) against a real loopback socket."""
    import socket
    import time

    import numpy as np
    import pytest

    try:
        from swarm_tpu.native import (drain_udp_socket,
                                      parse_telemetry_buffer)
        from swarm_tpu.native import get_lib
        get_lib()
    except Exception as e:                       # pragma: no cover
        pytest.skip(f"native codec unavailable: {e}")
    from swarm_tpu.proto.packets import QuasarPacketV2, ScanPacket

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4 * 1024 * 1024)
    rx.bind(("127.0.0.1", 0))
    rx.setblocking(False)
    port = rx.getsockname()[1]
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        sent = []
        for i in range(400):
            p = QuasarPacketV2(i % 8 + 1, 0.1 * i, -0.2, 0.3, i, 7,
                               1.0, 0.5, 4.0, 0.5, i % 5)
            sent.append(p)
            tx.sendto(p.pack(), ("127.0.0.1", port))
        tx.sendto(b"junk", ("127.0.0.1", port))
        tx.sendto(ScanPacket(2, 1.0, 2.0, 0.5, 9, 3,
                             np.full(181, 0.4, np.float32)).pack(),
                  ("127.0.0.1", port))
        time.sleep(0.05)
        buf, lens, ip4, ports, n = drain_udp_socket(rx.fileno(),
                                                    max_msgs=1024)
        assert n == 402
        assert int(ip4[0]) == 0x7F000001
        cols = parse_telemetry_buffer(buf, lens, n)
        assert cols["n_good"] == 401                  # junk dropped
        assert (cols["kind"][:400] == 2).all()
        assert cols["kind"][400] == 0
        assert cols["kind"][401] == 3                 # the scan packet
        k = 137
        assert cols["agent"][k] == sent[k].agent
        assert abs(cols["x"][k] - sent[k].x) < 1e-6
        assert cols["encoder"][k] == sent[k].encoder
        assert cols["landmark"][k] == sent[k].landmark
        assert abs(cols["scans"][401][90] - 0.4) < 1e-6
    finally:
        tx.close()
        rx.close()


def test_native_blast_udp_ring():
    """sendmmsg blaster (the serving benchmark's native load generator):
    packets arrive intact, the stop flag ends the loop, and the sent
    count is an upper bound on received."""
    import ctypes
    import socket
    import threading
    import time

    import pytest

    try:
        from swarm_tpu.native import blast_udp_ring, drain_udp_socket
        from swarm_tpu.native import get_lib
        get_lib()
    except Exception as e:                       # pragma: no cover
        pytest.skip(f"native codec unavailable: {e}")
    from swarm_tpu.proto.packets import QuasarPacketV2

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4 * 1024 * 1024)
    rx.bind(("127.0.0.1", 0))
    rx.setblocking(False)
    port = rx.getsockname()[1]
    ring = [QuasarPacketV2(a + 1, 0.5 * a, -0.25, 0.1, a, 3,
                           1.0, 0.5, 4.0, 0.5, 0).pack()
            for a in range(8)]
    stop = ctypes.c_int32(0)
    box: list = []
    th = threading.Thread(
        target=lambda: box.append(
            blast_udp_ring(port, ring, stop, burst=16, sleep_us=1000)),
        daemon=True)
    try:
        th.start()
        time.sleep(0.15)
    finally:
        stop.value = 1
        th.join(timeout=2.0)
    assert box and box[0] > 0, "blaster sent nothing"
    total = 0
    first = None
    while True:
        buf, lens, _, _, n = drain_udp_socket(rx.fileno(), max_msgs=1024)
        if n == 0:
            break
        if first is None:
            first = bytes(buf[0, :lens[0]])
        total += n
    rx.close()
    assert 0 < total <= box[0]
    assert first == ring[0]                      # payload intact, in order
