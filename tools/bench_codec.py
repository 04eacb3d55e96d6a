"""Codec throughput: Python struct parse vs the native batch codec
(swarm_tpu/native/src/codec.cpp) on a mixed frame of v1/v2/scan
payloads — the server runtime's datagram hot path.

Usage: python tools/bench_codec.py [--frames 200] [--batch 512]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from swarm_tpu.native import parse_telemetry_columns  # noqa: E402
from swarm_tpu.proto.packets import (  # noqa: E402
    QuasarPacketV1, QuasarPacketV2, ScanPacket, parse_packet)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    frame = []
    for i in range(args.batch):
        k = i % 10
        if k < 6:
            frame.append(QuasarPacketV2(
                i % 8 + 1, *rng.normal(size=3), i, 42,
                *rng.uniform(0.1, 3.0, 4), i % 5).pack())
        elif k < 9:
            frame.append(QuasarPacketV1(
                i % 8 + 1, *rng.normal(size=3), i, 7,
                *rng.uniform(0.1, 3.0, 4)).pack())
        else:
            frame.append(ScanPacket(
                i % 8 + 1, *rng.normal(size=3), i, 3,
                rng.uniform(0.1, 2.0, 181).astype(np.float32)).pack())

    parse_telemetry_columns(frame)     # build + warm
    n = args.frames * args.batch

    t0 = time.perf_counter()
    for _ in range(args.frames):
        for d in frame:
            parse_packet(d)
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.frames):
        parse_telemetry_columns(frame)
    t_nat = time.perf_counter() - t0

    print(f"python struct codec: {n / t_py:,.0f} pkt/s")
    print(f"native batch codec:  {n / t_nat:,.0f} pkt/s "
          f"({t_py / t_nat:.1f}x)")


if __name__ == "__main__":
    main()
