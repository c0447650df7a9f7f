#!/usr/bin/env python3
"""Continuously receive frames from a sample source (file or loopback).

Mirrors the reference `receiver` example (examples/test_rx.cpp:55-122):
runs a Receiver with a callback that counts packets and prints each one
with a timestamp, and demonstrates pause()/resume(). The source is a
recorded capture file (from examples/tx.py) in place of a radio.
"""

from __future__ import annotations

import argparse
import sys
import time


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("capture", help="input: capture file (complex64) or "
                    "udp://host:port to listen on (pair with examples/"
                    "tx.py udp://...)")
    ap.add_argument("--rate", default=None,
                    help="restrict decoding to one Rate (default: all)")
    ap.add_argument("--max-length", type=int, default=1500)
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--seconds", type=float, default=None,
                    help="UDP mode: stop after this long idle (default: "
                    "run until 2 s with no packets after the first)")
    args = ap.parse_args()

    from fun_ofdm_tpu.api import Receiver
    from fun_ofdm_tpu.rates import ALL_RATES, Rate
    from fun_ofdm_tpu.runtime.io import FileSource, UdpSource

    t0 = time.perf_counter()
    count = 0

    def callback(packets):
        nonlocal count
        for p in packets:
            count += 1
            if not args.quiet:
                print(f"[{time.perf_counter() - t0:9.3f}s] packet {count}: "
                      f"{p.length} bytes @ {p.rate.name} (start {p.start})")

    udp = args.capture.startswith("udp://")
    if udp:
        host, port = args.capture[len("udp://"):].rsplit(":", 1)
        source = UdpSource((host or "0.0.0.0", int(port)))
        print(f"listening on udp://{source.addr[0]}:{source.addr[1]}")
    else:
        source = FileSource(args.capture)
    rates = ALL_RATES if args.rate is None else (Rate[args.rate],)
    rx = Receiver(callback, source=source, rates=rates,
                  max_length=args.max_length)

    # demonstrate pause/resume (reference: examples/test_rx.cpp:82-102)
    time.sleep(0.5)
    rx.pause()
    if not args.quiet:
        print("-- paused --")
    time.sleep(0.2)
    rx.resume()
    if not args.quiet:
        print("-- resumed --")

    if udp:
        t_start = time.perf_counter()
        last, last_change = 0, time.perf_counter()
        while True:
            time.sleep(0.25)
            now = time.perf_counter()
            if count != last:
                last, last_change = count, now
            if args.seconds is not None:
                if now - t_start >= args.seconds:
                    break
            elif count and now - last_change > 2.0 \
                    and source.pending == 0:
                break  # stream went idle after traffic
    else:
        while not source.exhausted:
            time.sleep(0.1)
    rx.stop()
    source.close()
    if udp and source.stats.lost_samples:
        print(f"lost {source.stats.lost_samples} samples to datagram gaps")
    print(f"Received {count} packets")
    return 0


if __name__ == "__main__":
    sys.exit(main())
