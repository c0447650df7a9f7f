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
    ap.add_argument("out", help="output: capture file (complex64) or "
                    "udp://host:port (stream to a running examples/rx.py)")
    ap.add_argument("--count", type=int, default=1000)
    ap.add_argument("--length", type=int, default=1500)
    ap.add_argument("--rate", default="RATE_1_2_QPSK")
    ap.add_argument("--gap", type=int, default=4096,
                    help="zero samples between frames")
    ap.add_argument("--amp", type=float, default=1.0, help="TX amplitude")
    ap.add_argument("--batch", type=int, default=32,
                    help="frames per batched device call")
    ap.add_argument("--wire", default="int16",
                    help="UDP wire format: int16 (sc16), int12, int8")
    ap.add_argument("--pace", action="store_true",
                    help="pace UDP sends at the radio sample rate (use "
                    "when the receiver is a live process)")
    args = ap.parse_args()

    from fun_ofdm_tpu.api import Transmitter
    from fun_ofdm_tpu.rates import Rate
    from fun_ofdm_tpu.runtime.io import FileSink, RadioParams, UdpSink

    rate = Rate[args.rate]
    params = RadioParams(tx_amp=args.amp)
    if args.out.startswith("udp://"):
        host, port = args.out[len("udp://"):].rsplit(":", 1)
        sink = UdpSink((host or "127.0.0.1", int(port)), params,
                       wire=args.wire)
    else:
        sink = FileSink(args.out, params)
    txer = Transmitter(sink)
    rng = np.random.default_rng(0)
    gap = np.zeros(args.gap, np.complex64)

    import time as _time
    sent = 0
    t0 = _time.perf_counter()
    samples_out = 0
    while sent < args.count:
        n = min(args.batch, args.count - sent)
        payloads = [make_payload(rng, args.length) for _ in range(n)]
        samples_out += txer.send_burst(payloads, rate) + gap.size
        sink.send_burst(gap)
        sent += n
        if args.pace:
            # don't outrun the receiver's radio clock (a real radio
            # paces the link; UDP has no backpressure)
            ahead = samples_out / params.sample_rate \
                - (_time.perf_counter() - t0)
            if ahead > 0.2:
                _time.sleep(ahead - 0.1)
        print(f"sent {sent}/{args.count}")
    if hasattr(sink, "flush"):
        sink.flush()
    sink.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
