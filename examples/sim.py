#!/usr/bin/env python3
"""Hardware-free TX→RX loopback simulation.

Mirrors the reference `sim` example (examples/test_sim.cpp:30-104): build
one 1500-byte frame at RATE_3_4_QAM16, tile it 100x into a zero-padded
sample stream, push the stream through the streaming receiver chain in
4096-sample chunks, and report the decoded-packet count and elapsed time.
Expected output ends with "Received 100 packets".

Extras over the reference: --rate/--count/--length/--snr flags (the
reference hardcodes its configuration and has no channel model).
"""

from __future__ import annotations

import argparse
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--count", type=int, default=100, help="frames to send")
    ap.add_argument("--length", type=int, default=1500, help="payload bytes")
    ap.add_argument("--rate", default="RATE_3_4_QAM16",
                    help="PHY rate (Rate enum name)")
    ap.add_argument("--snr", type=float, default=None,
                    help="optional AWGN SNR in dB (reference sim is noise-free)")
    ap.add_argument("--pad", type=int, default=None,
                    help="zero samples between frames (default: 10 frame lengths,"
                         " matching the reference's 1000-frame-length total pad)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fun_ofdm_tpu.models import tx
    from fun_ofdm_tpu.rates import Rate, params_for
    from fun_ofdm_tpu.runtime.chain import ReceiverChain
    from fun_ofdm_tpu.sim import channel

    rate = Rate[args.rate]
    length = args.length
    frame_len = params_for(rate).frame_samples(length)
    pad = args.pad if args.pad is not None else 10 * frame_len

    # payload: the reference fills with "Hello world" + count (test_sim.cpp:52);
    # use a deterministic known payload the receiver can verify byte-exactly
    payload = (b"Hello world #000 " * (length // 17 + 1))[:length]
    fre, fim = tx.build_frame_p_jit(rate)(
        jnp.asarray(np.frombuffer(payload, np.uint8)))
    fre, fim = np.asarray(fre), np.asarray(fim)
    if args.snr is not None:
        key = jax.random.PRNGKey(0)
        fre_b = np.broadcast_to(fre, (args.count,) + fre.shape)
        fim_b = np.broadcast_to(fim, (args.count,) + fim.shape)
        nre, nim = jax.jit(channel.awgn, static_argnames=())(
            (jnp.asarray(fre_b), jnp.asarray(fim_b)), key, args.snr)
        frames_re, frames_im = np.asarray(nre), np.asarray(nim)
    else:
        frames_re = np.broadcast_to(fre, (args.count,) + fre.shape)
        frames_im = np.broadcast_to(fim, (args.count,) + fim.shape)

    zre = np.zeros(pad, np.float32)
    stream_re = np.concatenate(
        [np.concatenate([frames_re[i], zre]) for i in range(args.count)])
    stream_im = np.concatenate(
        [np.concatenate([frames_im[i], zre]) for i in range(args.count)])

    chain = ReceiverChain(rates=(rate,), max_length=length)
    received = 0
    chunk = 4096
    t0 = time.perf_counter()
    for i in range(0, stream_re.size, chunk):
        pkts = chain.process_samples(
            (stream_re[i:i + chunk], stream_im[i:i + chunk]))
        for p in pkts:
            if p.payload == payload:
                received += 1
            else:
                print(f"Payload mismatch (length {p.length})", file=sys.stderr)
    for p in chain.flush():
        if p.payload == payload:
            received += 1
    dt_ms = (time.perf_counter() - t0) * 1e3

    print(f"Received {received} packets")
    print(f"Time elapsed: {dt_ms:.3f} ms "
          f"({stream_re.size / dt_ms * 1e3 / 1e6:.2f} Msample/s)")
    return 0 if received == args.count else 1


if __name__ == "__main__":
    sys.exit(main())
