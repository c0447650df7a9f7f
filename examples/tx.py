#!/usr/bin/env python3
"""Transmit test frames to a sample sink (file or loopback).

Mirrors the reference `transmitter` example (examples/test_tx.cpp:48-78):
sends N 1500-byte packets with a known marker string at offsets
0/1000/1400 and random filler, so a receiving side can verify content
beyond CRC. With no radio hardware, the burst stream is written to an
interleaved-complex64 capture file replayable by examples/rx.py.
"""

from __future__ import annotations

import argparse
import sys

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KNOWN = (b"This known payload string marks offsets 0, 1000 and 1400 of "
         b"every test frame for content verification.")


def make_payload(rng: np.random.Generator, length: int) -> bytes:
    buf = rng.integers(0, 256, length, dtype=np.uint8)
    for off in (0, 1000, 1400):
        if off + len(KNOWN) <= length:
            buf[off:off + len(KNOWN)] = np.frombuffer(KNOWN, np.uint8)
    return buf.tobytes()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output capture file (complex64)")
    ap.add_argument("--count", type=int, default=1000)
    ap.add_argument("--length", type=int, default=1500)
    ap.add_argument("--rate", default="RATE_1_2_QPSK")
    ap.add_argument("--gap", type=int, default=4096,
                    help="zero samples between frames")
    ap.add_argument("--amp", type=float, default=1.0, help="TX amplitude")
    ap.add_argument("--batch", type=int, default=32,
                    help="frames per batched device call")
    args = ap.parse_args()

    from fun_ofdm_tpu.api import Transmitter
    from fun_ofdm_tpu.rates import Rate
    from fun_ofdm_tpu.runtime.io import FileSink, RadioParams

    rate = Rate[args.rate]
    sink = FileSink(args.out, RadioParams(tx_amp=args.amp))
    txer = Transmitter(sink)
    rng = np.random.default_rng(0)
    gap = np.zeros(args.gap, np.complex64)

    sent = 0
    while sent < args.count:
        n = min(args.batch, args.count - sent)
        payloads = [make_payload(rng, args.length) for _ in range(n)]
        txer.send_burst(payloads, rate)
        sink.send_burst(gap)
        sent += n
        print(f"sent {sent}/{args.count}")
    sink.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
