#!/usr/bin/env python3
"""A/B: sequential vs block-overlap Viterbi at streaming batch sizes.

The streaming chain decodes 1-8 frames per superstep; the sequential
kernel then wastes 127/128 lanes and its time axis is serial (~12k steps
for a 1500-byte frame). The blocked variant maps trellis time blocks onto
the idle lanes (SURVEY.md section 7 hard part #1). This measures both on
real hardware and counts bit mismatches on noisy frames (the blocked
decode is merge-based, not guaranteed bit-exact).

Usage: python tools/viterbi_blocked_ab.py [--batches 1,4,8] [--noisy N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="1,4,8,64")
    ap.add_argument("--nbits", type=int, default=12096)
    ap.add_argument("--blocks", type=str, default="8,16,32")
    ap.add_argument("--warmup", type=int, default=128)
    ap.add_argument("--noisy-frames", type=int, default=256,
                    help="noisy frames for the mismatch count")
    args = ap.parse_args()

    from fun_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    import jax
    import jax.numpy as jnp

    from fun_ofdm_tpu.ops import convcode, viterbi_pallas

    nbits = args.nbits
    rng = np.random.default_rng(0)

    def make_soft(batch, noise):
        bits = rng.integers(0, 2, size=(batch, nbits + 6))
        coded = np.asarray(convcode.conv_encode(jnp.asarray(bits)))
        soft = coded * 255
        if noise:
            soft = soft + rng.integers(-noise, noise + 1, coded.shape)
        return bits, np.clip(soft, 0, 255).astype(np.int32)

    def timed(fn, soft_dev, reps=10):
        out = fn(soft_dev)
        jax.block_until_ready(out)
        # chain reps so the tunnel can't overlap them
        mix = jax.jit(lambda s, o: s + 0 * o[..., :1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(mix(soft_dev, out))
        np.asarray(out)  # force a real sync on this transport
        return (time.perf_counter() - t0) / reps, out

    for batch in [int(b) for b in args.batches.split(",")]:
        _, soft = make_soft(batch, noise=60)
        soft_dev = jnp.asarray(soft)
        seq_fn = jax.jit(lambda s: viterbi_pallas.viterbi_decode_pallas(
            s, nbits))
        t_seq, out_seq = timed(seq_fn, soft_dev)
        row = {"batch": batch, "nbits": nbits,
               "seq_ms": t_seq * 1e3,
               "seq_mbps": batch * nbits / t_seq / 1e6}
        for nb in [int(b) for b in args.blocks.split(",")]:
            blk_fn = jax.jit(
                lambda s, nb=nb: viterbi_pallas.viterbi_decode_pallas_blocked(
                    s, nbits, n_blocks=nb, warmup=args.warmup))
            t_blk, out_blk = timed(blk_fn, soft_dev)
            mism = int((np.asarray(out_seq) != np.asarray(out_blk)).sum())
            row[f"blk{nb}_ms"] = t_blk * 1e3
            row[f"blk{nb}_speedup"] = t_seq / t_blk
            row[f"blk{nb}_mismatch_bits"] = mism
        print(json.dumps(row), flush=True)

    # mismatch statistics on many independent noisy frames (batch 8 reps)
    nb = int(args.blocks.split(",")[1]) if "," in args.blocks else 16
    seq_fn = jax.jit(lambda s: viterbi_pallas.viterbi_decode_pallas(
        s, nbits))
    blk_fn = jax.jit(
        lambda s: viterbi_pallas.viterbi_decode_pallas_blocked(
            s, nbits, n_blocks=nb, warmup=args.warmup))
    total_bits = 0
    total_mismatch = 0
    frames_differing = 0
    for _ in range(max(1, args.noisy_frames // 8)):
        _, soft = make_soft(8, noise=100)  # heavy noise
        soft_dev = jnp.asarray(soft)
        a = np.asarray(seq_fn(soft_dev))
        b = np.asarray(blk_fn(soft_dev))
        total_bits += a.size
        total_mismatch += int((a != b).sum())
        frames_differing += int((a != b).any(axis=-1).sum())
    print(json.dumps({
        "mismatch_check": {"n_blocks": nb, "warmup": args.warmup,
                           "noise": 100, "total_bits": total_bits,
                           "mismatch_bits": total_mismatch,
                           "frames_differing": frames_differing}}),
        flush=True)


if __name__ == "__main__":
    main()
