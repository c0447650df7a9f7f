#!/usr/bin/env python3
"""A/B harness for Viterbi ACS kernel precision variants (round 4).

VERDICT r3 item 1: the ACS carries u8 semantics in int32 tiles - 4x VPU
lane density potentially on the table. This tool times, on the real TPU:

  * the full production decode (ACS + chainback) at batch 128 x 1500-byte
    frames (the capture megagraph's Viterbi workload);
  * the ACS pallas_call alone and the chainback alone, to locate time;
  * each precision variant (int32 / int16 / uint8 metrics), verifying
    bit-exactness against the lax.scan oracle before timing.

Usage: python tools/viterbi_acs_ab.py [--batch 128] [--nbits 12054]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, x0, reps=10):
    """Per-rep wall time of a CHAINED loop: fn(x) -> (out, x_next) where
    x_next depends on out, so reps serialize on device and the tunnel's
    ~22 ms blocking round-trip floor (docs/NOTES_r3.md) is paid ONCE per
    measurement instead of once per rep. Returns (dt_per_rep, last out).
    """
    import jax

    out, x = fn(x0)
    jax.block_until_ready((out, x))
    t0 = time.perf_counter()
    for _ in range(reps):
        out, x = fn(x)
    jax.block_until_ready((out, x))
    dt = (time.perf_counter() - t0) / reps
    return dt, out


def chained(decode):
    """Wrap out = decode(x) as fn(x) -> (out, x_next) with a data dep."""
    import jax
    import jax.numpy as jnp

    def fn(x):
        out = decode(x)
        dep = jnp.ravel(out)[0].astype(x.dtype)
        return out, x + dep * 0
    return jax.jit(fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nbits", type=int, default=12054)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batch-tile", type=int, default=None,
                    help="override viterbi_pallas.BATCH_TILE")
    ap.add_argument("--time-chunk", type=int, default=None,
                    help="override viterbi_pallas.TIME_CHUNK")
    ap.add_argument("--dtypes", default=None,
                    help="comma list; default all METRIC_DTYPES")
    ap.add_argument("--radixes", default=None,
                    help="comma list of ACS radixes to time (default: 2,4)")
    ap.add_argument("--blocked", type=int, default=0,
                    help="also time the blocked kernel with this n_blocks")
    ap.add_argument("--split", action="store_true",
                    help="also time the ACS pallas_call alone")
    ap.add_argument("--ablate", action="store_true",
                    help="time timing-only ACS variants with pieces removed")
    args = ap.parse_args()

    from fun_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from fun_ofdm_tpu.ops import convcode, viterbi, viterbi_pallas as vp

    if args.batch_tile:
        vp.BATCH_TILE = args.batch_tile
    if args.time_chunk:
        vp.TIME_CHUNK = args.time_chunk

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(args.batch, args.nbits + 6))
    coded = np.asarray(convcode.conv_encode(jnp.asarray(bits)))
    soft = np.clip(coded * 255 + rng.integers(-100, 101, coded.shape),
                   0, 255).astype(np.int32)
    s = jnp.asarray(soft)

    # oracle on a subset (scan is slow)
    n_check = min(args.batch, 8)
    ref = np.asarray(viterbi.viterbi_decode_scan(s[:n_check], args.nbits))

    results = {}
    dtypes = (args.dtypes.split(",") if args.dtypes
              else list(vp.METRIC_DTYPES))
    radixes = ([int(r) for r in args.radixes.split(",")]
               if args.radixes else [2, 4])
    for impl in dtypes:
      for radix in radixes:
        fn = chained(lambda x, impl=impl, radix=radix:
                     vp.viterbi_decode_pallas(
                         x, args.nbits, metric_dtype=impl, radix=radix))
        try:
            dt, out = timed(fn, s, reps=args.reps)
        except Exception as e:  # variant may not compile on this backend
            msg = str(e).split("\n")[0][:160]
            print(f"{impl}/r{radix}: FAILED ({type(e).__name__}: {msg})",
                  flush=True)
            continue
        got = np.asarray(out)[:n_check]
        exact = bool((got == ref).all())
        results[f"{impl}/r{radix}"] = dt
        print(f"{impl}/r{radix}: {dt*1e3:8.2f} ms  bit-exact={exact}",
              flush=True)
        if not exact:
            print(f"  !! {int((got != ref).sum())} differing bits")

    if args.split or args.ablate:
        # time the forward ACS pallas_call alone (chainback replaced by a
        # cheap reduction that forces execution)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        import jax as _jax

        total_steps = args.nbits + vp.K - 1
        bsz = ((args.batch + vp.BATCH_TILE - 1)
               // vp.BATCH_TILE) * vp.BATCH_TILE
        t_pad = ((total_steps + vp.TIME_CHUNK - 1)
                 // vp.TIME_CHUNK) * vp.TIME_CHUNK

        def acs_only(soft_in):
            flat = soft_in.reshape(-1, soft_in.shape[-1])
            pairs = jnp.zeros((bsz, 2 * t_pad), jnp.int32)
            pairs = pairs.at[:flat.shape[0], :soft_in.shape[-1]].set(flat)
            s0 = pairs[:, 0::2].T
            s1 = pairs[:, 1::2].T
            sv = jnp.full((1, bsz), (total_steps // 2) * 2, jnp.int32)
            iv = jnp.ones((1, bsz), jnp.int32)
            dec = pl.pallas_call(
                vp._acs_kernel,
                grid=(bsz // vp.BATCH_TILE, t_pad // vp.TIME_CHUNK),
                in_specs=[
                    pl.BlockSpec((1, vp.BATCH_TILE), lambda b, t: (0, b),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, vp.BATCH_TILE), lambda b, t: (0, b),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, 1), lambda b, t: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((vp.TIME_CHUNK, vp.BATCH_TILE),
                                 lambda b, t: (t, b),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((vp.TIME_CHUNK, vp.BATCH_TILE),
                                 lambda b, t: (t, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (vp.TIME_CHUNK, 64, vp.BATCH_TILE),
                    lambda b, t: (t, 0, b), memory_space=pltpu.VMEM),
                out_shape=_jax.ShapeDtypeStruct((t_pad, 64, bsz), jnp.int8),
                scratch_shapes=[pltpu.VMEM((64, vp.BATCH_TILE), jnp.int32)],
            )(sv, iv, jnp.asarray(vp._branch_cols("int32")), s0, s1)
            return dec[::97].astype(jnp.int32).sum()  # force, cheap

        if args.split:
            dt, _ = timed(chained(acs_only), s, reps=args.reps)
            print(f"acs-only: {dt*1e3:8.2f} ms", flush=True)

    if args.ablate:
        # NOT bit-exact - timing-only kernels with pieces removed, to
        # locate the ACS cost (results discarded)
        import jax as _jax
        import jax.numpy as _jnp
        from jax.experimental import pallas as _pl

        def make_kernel(mode):
            def k(steps_ref, init_ref, bt_ref, s0_ref, s1_ref, dec_ref,
                  metrics_ref):
                e = bt_ref[:]
                e0, e1 = e[:32], e[32:]

                def step(m, s0, s1, i):
                    if mode == "minimal":
                        # 2 arith ops + store: the floor of the skeleton
                        m = _jnp.minimum(m + s0, 255)
                        dec_ref[i] = (m <= 128).astype(_jnp.int8)
                        return m
                    a = _jnp.where(e0 == 1, 255 - s0, s0)
                    b = _jnp.where(e1 == 1, 255 - s1, s1)
                    t = (a + b + 1) >> 3
                    tc = 63 - t
                    lo, hi = m[:32, :], m[32:, :]
                    mel = _jnp.minimum(lo + t, 255)
                    meh = _jnp.minimum(hi + tc, 255)
                    mol = _jnp.minimum(lo + tc, 255)
                    moh = _jnp.minimum(hi + t, 255)
                    ne = _jnp.minimum(mel, meh)
                    de = (meh <= mel).astype(_jnp.int8)
                    no = _jnp.minimum(mol, moh)
                    do = (moh <= mol).astype(_jnp.int8)
                    if mode == "noshuffle":
                        new = _jnp.concatenate([ne, no], axis=0)
                        dec = _jnp.concatenate([de, do], axis=0)
                    else:
                        new = _jnp.stack([ne, no], axis=1).reshape(
                            64, m.shape[1])
                        dec = _jnp.stack([de, do], axis=1).reshape(
                            64, m.shape[1])
                    if mode not in ("norenorm", "noshuffle"):
                        minv = new
                        while minv.shape[0] > 1:
                            h = minv.shape[0] // 2
                            minv = _jnp.minimum(minv[:h], minv[h:])
                        need = new[0:1, :] > 210
                        new = _jnp.where(need, new - minv, new)
                    if mode != "nostore":
                        dec_ref[i] = dec
                    return new

                def body(blk, m):
                    s0b = s0_ref[_pl.ds(blk * 8, 8), :]
                    s1b = s1_ref[_pl.ds(blk * 8, 8), :]
                    for kk in range(8):
                        m = step(m, s0b[kk:kk + 1, :], s1b[kk:kk + 1, :],
                                 blk * 8 + kk)
                    return m

                if mode == "full-static":
                    m = metrics_ref[:]
                    for blk in range(vp.TIME_CHUNK // 8):
                        m = body(blk, m)
                    metrics_ref[:] = m
                else:
                    metrics_ref[:] = _jax.lax.fori_loop(
                        0, vp.TIME_CHUNK // 8, body, metrics_ref[:])
            return k

        orig_kernel = vp._acs_kernel
        for mode in ("full-ablate", "norenorm", "noshuffle", "nostore",
                     "minimal", "full-static"):
            vp._acs_kernel = make_kernel(mode)
            try:
                dt, _ = timed(chained(acs_only), s, reps=args.reps)
                print(f"ablate[{mode}]: {dt*1e3:8.2f} ms", flush=True)
            except Exception as e:
                print(f"ablate[{mode}]: FAILED "
                      f"({str(e).splitlines()[0][:120]})", flush=True)
        vp._acs_kernel = orig_kernel

    if args.blocked:
        fn = chained(lambda x: vp.viterbi_decode_pallas_blocked(
            x, args.nbits, n_blocks=args.blocked, warmup=128,
            return_merge_ok=True)[0])
        dt, out = timed(fn, s, reps=args.reps)
        _, ok = vp.viterbi_decode_pallas_blocked(
            jnp.asarray(s), args.nbits, n_blocks=args.blocked, warmup=128,
            return_merge_ok=True)
        got = np.asarray(out)[:n_check]
        exact = bool((got == ref).all())
        print(f"blocked-{args.blocked}: {dt*1e3:8.2f} ms  "
              f"bit-exact={exact}  merge_ok={int(np.asarray(ok).sum())}"
              f"/{args.batch}", flush=True)
        results[f"blocked-{args.blocked}"] = dt

    if "int32/r2" in results:
        base = results["int32/r2"]
        for k, v in results.items():
            print(f"{k}: {base/v:5.2f}x vs int32/r2")


if __name__ == "__main__":
    main()
