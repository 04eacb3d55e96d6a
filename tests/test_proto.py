"""Wire-protocol codecs: layout sizes, roundtrips, dispatch, batch codec."""

import numpy as np
import pytest

from swarm_tpu.proto.packets import (
    CommandPacket, QuasarPacketV1, QuasarPacketV2, ScanPacket, TargetPacket,
    ZonePacket, PACKET_SIZE_V1, PACKET_SIZE_V2, SCAN_SIZE, SCAN_SIZE_BRIDGE,
    TARGET_SIZE, ZONE_SIZE, CMD_SIZE, pack_quasar_v2_batch, parse_packet,
    unpack_quasar_batch)


def test_wire_sizes_match_reference():
    """Sizes cited in dual_bot_mapper.py:41-54, udp_receiver_standalone.py:15,
    udp_bridge.py:34-38, MULTI_AGENT_SETUP_GUIDE.md:144."""
    assert PACKET_SIZE_V2 == 42
    assert PACKET_SIZE_V1 == 41
    assert SCAN_SIZE == 751
    assert SCAN_SIZE_BRIDGE == 743
    assert ZONE_SIZE == 20
    assert TARGET_SIZE == 12
    assert CMD_SIZE == 12


def test_roundtrips():
    pkts = [
        QuasarPacketV2(1, 1.0, 2.0, 0.5, 100, 7, 0.25, 0.5, 0.75, 1.5, 3),
        QuasarPacketV1(2, -1.0, 0.5, -0.25, 50, 0, 0.25, 0.5, 0.75, 1.5),
        ZonePacket(1.0, 2.0, 3.0, 4.0),
        TargetPacket(1.5, 2.5),
        CommandPacket(0.25, -0.125),
    ]
    for p in pkts:
        assert type(p).unpack(p.pack()) == p
        assert parse_packet(p.pack()) == p


def test_scan_roundtrip():
    s = ScanPacket(1, 0.5, 1.0, 0.25, 5, 2,
                   np.linspace(0.1, 4.0, 181).astype(np.float32))
    out = parse_packet(s.pack())
    assert isinstance(out, ScanPacket)
    np.testing.assert_array_equal(out.ranges, s.ranges)


def test_scan_bridge_roundtrip():
    """743-byte bridge layout (udp_bridge.py:34) — the QuasarPacket the
    PlatformIO firmware transmits; round-1 advisor: parse_packet dropped it."""
    from swarm_tpu.proto.packets import SCAN_SIZE_BRIDGE, ScanPacketBridge

    s = ScanPacketBridge(2, 0.5, 1.0, 0.25,
                         np.linspace(0.1, 4.0, 181).astype(np.float32))
    wire = s.pack()
    assert len(wire) == SCAN_SIZE_BRIDGE == 743
    out = parse_packet(wire)
    assert isinstance(out, ScanPacketBridge)
    assert (out.agent, out.x, out.y, out.yaw) == (2, 0.5, 1.0, 0.25)
    np.testing.assert_array_equal(out.ranges, s.ranges)
    assert out.encoder == 0 and out.v2v == 0   # CSV-compat defaults


def test_zone_lift_sentinel():
    """999/-999 lifts the zone (dual_bot_mapper.py:681; ino:117)."""
    assert ZonePacket(*ZonePacket.LIFT).lifted
    assert not ZonePacket(1, 2, 3, 4).lifted


def test_parse_rejects_garbage():
    assert parse_packet(b"\x00" * 42) is None       # bad magic
    assert parse_packet(b"QSRL") is None            # truncated
    assert parse_packet(b"XXXX" + b"\x00" * 8) is None


def test_cmd_target_disambiguated_by_magic():
    t = TargetPacket(1.0, 2.0)
    c = CommandPacket(1.0, 2.0)
    assert isinstance(parse_packet(t.pack()), TargetPacket)
    assert isinstance(parse_packet(c.pack()), CommandPacket)


def test_batch_codec_zero_copy_roundtrip():
    pkts = [QuasarPacketV2(i % 2 + 1, i * 0.5, -i * 0.25, 0.0, i, i * 2,
                           0.25, 0.5, 0.75, 1.5, i % 6) for i in range(32)]
    buf = b"".join(p.pack() for p in pkts)
    arr = unpack_quasar_batch(buf)
    assert arr.shape == (32,)
    assert arr["agent"][5] == 2
    np.testing.assert_allclose(arr["x"], [i * 0.5 for i in range(32)])
    repacked = pack_quasar_v2_batch(
        arr["agent"], arr["x"], arr["y"], arr["yaw"], arr["encoder"],
        arr["v2v"],
        np.stack([arr["front"], arr["left"], arr["back"], arr["right"]], -1),
        arr["landmark"])
    assert repacked == buf


def test_batch_codec_rejects_bad_input():
    with pytest.raises(ValueError):
        unpack_quasar_batch(b"\x00" * 43)
    with pytest.raises(ValueError):
        unpack_quasar_batch(b"\x00" * 84)   # right size, wrong magic
