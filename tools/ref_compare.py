#!/usr/bin/env python3
"""Head-to-head PER: the compiled REFERENCE RX chain vs ours, same noise.

BASELINE's correctness north star is "within reference BER/SNR bound under
AWGN", but until round 4 nobody had fed identical noisy streams to both
chains. This tool:

  1. builds the reference sources (/root/reference/src) into the
     golden_gen binary (same shim setup as tools/make_golden.py) and uses
     its --chain mode to run the full 6-block reference RX chain
     (frame_detector ... frame_decoder, src/receiver_chain.cpp:106-126
     semantics) on arbitrary complex128 streams;
  2. synthesizes AWGN-impaired streams of known frames (our TX, which is
     bit-exact vs the reference TX per tests/test_golden_reference.py) at
     a grid of SNR points;
  3. feeds the IDENTICAL samples to (a) the reference chain, (b) our
     production ReceiverChain at lts_search=96 (the reference's LTS
     search geometry) and (c) at our default lts_search=128;
  4. writes docs/REF_COMPARE.md with the delivered-packet-rate table.

Usage: python tools/ref_compare.py [--frames N] [--fast]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

REF = pathlib.Path("/root/reference/src")
SHIMS = _REPO / "tools" / "ref_shims"

REF_SOURCES = [
    "parity.cpp", "viterbi.cpp", "interleaver.cpp", "puncturer.cpp",
    "modulator.cpp", "ppdu.cpp", "symbol_mapper.cpp", "fft.cpp",
    "frame_builder.cpp", "frame_detector.cpp", "timing_sync.cpp",
    "fft_symbols.cpp", "channel_est.cpp", "phase_tracker.cpp",
    "frame_decoder.cpp",
]

#: AWGN reference signal power (sim/channel.py DEFAULT_SIGNAL_POWER)
SIGNAL_POWER = 52.0 / 4096.0


def build_binary(tmpdir: pathlib.Path) -> pathlib.Path:
    binary = tmpdir / "golden_gen"
    cmd = [
        "g++", "-O2", "-std=c++11", "-mssse3", "-msse4.1",
        f"-I{SHIMS}", f"-I{REF}",
        str(_REPO / "tools" / "golden_gen.cpp"),
        *[str(REF / s) for s in REF_SOURCES],
        "-o", str(binary),
    ]
    subprocess.run(cmd, check=True)
    return binary


def make_stream(rate, length, n_frames, snr_db, seed, cfo_norm=0.0):
    """(stream complex128, payloads list[bytes]). Deterministic per seed.
    cfo_norm applies a carrier frequency offset (cycles/sample) to the
    whole stream before noise - the impairment whose correction is dead
    code in the reference (timing_sync.cpp:109-112)."""
    import jax.numpy as jnp
    from fun_ofdm_tpu.models import tx

    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, length, dtype=np.uint8)
                for _ in range(n_frames)]
    # planar f32 frames combined on host (the axon TPU backend has no
    # complex dtypes at all): identical samples feed both decoders, and
    # f32 TX quantization (~1e-7) is far below any tested noise floor;
    # TX itself is bit-exact vs the reference in the complex128 golden
    # tests (tests/test_golden_reference.py)
    frames = []
    for p in payloads:
        fre, fim = tx.build_frame_p(jnp.asarray(p), rate)
        frames.append(np.asarray(fre).astype(np.float64)
                      + 1j * np.asarray(fim).astype(np.float64))
    pieces = []
    for f in frames:
        gap = int(400 + rng.integers(0, 256))
        pieces.append(np.zeros(gap, np.complex128))
        pieces.append(f)
    pieces.append(np.zeros(8192, np.complex128))
    stream = np.concatenate(pieces)
    if cfo_norm:
        stream = stream * np.exp(
            2j * np.pi * cfo_norm * np.arange(stream.size))
    sigma = np.sqrt(SIGNAL_POWER / (10.0 ** (snr_db / 10.0)) / 2.0)
    noise = sigma * (rng.standard_normal(stream.size)
                     + 1j * rng.standard_normal(stream.size))
    return stream + noise, [p.tobytes() for p in payloads]


def count_matches(decoded: list[bytes], planted: list[bytes]) -> int:
    """Delivered-correct count: multiset intersection (payloads are
    random per frame, so equality identifies the frame)."""
    from collections import Counter
    c = Counter(decoded)
    n = 0
    for p in planted:
        if c[p] > 0:
            c[p] -= 1
            n += 1
    return n


def run_reference(binary, stream, tmpdir) -> list[bytes] | None:
    """Run the compiled reference chain; None if it crashed (observed:
    SIGABRT on CFO-impaired streams - corrupted headers drive its
    decoder into an aborting state our chain simply reports as CRC
    failures)."""
    inp = tmpdir / "in.c128"
    outp = tmpdir / "out.bin"
    stream.astype(np.complex128).tofile(inp)
    proc = subprocess.run([str(binary), "--chain", str(inp), str(outp)],
                          capture_output=True)
    if proc.returncode != 0:
        return None
    raw = outp.read_bytes()
    decoded, off = [], 0
    while off + 4 <= len(raw):
        n = int.from_bytes(raw[off:off + 4], "little")
        off += 4
        decoded.append(raw[off:off + n])
        off += n
    return decoded


def run_ours(stream, rate, length, lts_search,
             cfo_correct=False, lts_segments=1) -> list[bytes]:
    from fun_ofdm_tpu.config import ChainParams
    from fun_ofdm_tpu.runtime.chain import ReceiverChain

    chain = ReceiverChain(rates=(rate,), max_length=length,
                          params=ChainParams(lts_search=lts_search,
                                             lts_segments=lts_segments),
                          cfo_correct=cfo_correct)
    pkts = []
    s64 = stream.astype(np.complex64)
    for i in range(0, s64.size, 4096):
        pkts += chain.process_samples(s64[i:i + 4096])
    pkts += chain.flush()
    return [p.payload for p in pkts]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--length", type=int, default=200)
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    from fun_ofdm_tpu.rates import Rate
    from fun_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    n_frames = 32 if args.fast else args.frames
    snrs = [8, 16, 24] if args.fast else [4, 8, 12, 16, 20, 24]
    rates = [Rate.RATE_1_2_BPSK, Rate.RATE_3_4_QAM16, Rate.RATE_3_4_QAM64]

    rows = []
    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        tmpdir = pathlib.Path(td)
        binary = build_binary(tmpdir)
        for ri, rate in enumerate(rates):
            for snr in snrs:
                stream, planted = make_stream(
                    rate, args.length, n_frames, snr,
                    seed=10_000 + 100 * ri + snr)
                got_ref = count_matches(
                    run_reference(binary, stream, tmpdir) or [], planted)
                got96 = count_matches(
                    run_ours(stream, rate, args.length, 96), planted)
                got128 = count_matches(
                    run_ours(stream, rate, args.length, 128), planted)
                rows.append((rate.name, snr, got_ref, got96, got128,
                             n_frames))
                print(f"{rate.name:18s} {snr:3d} dB  ref {got_ref:4d}  "
                      f"ours96 {got96:4d}  ours128 {got128:4d}  "
                      f"/{n_frames}", flush=True)

    # CFO head-to-head: the impairment class where the reference cannot
    # follow (its estimation loop is dead code) - one rate, high SNR,
    # sweeping the oscillator error
    cfo_rows = []
    with tempfile.TemporaryDirectory() as td:
        tmpdir = pathlib.Path(td)
        binary = build_binary(tmpdir)
        rate = Rate.RATE_3_4_QAM16
        for cfo in (5e-4, 1e-3, 2e-3, 4e-3, 8e-3):
            stream, planted = make_stream(
                rate, args.length, n_frames, 24, seed=77_000 + int(cfo * 1e6),
                cfo_norm=cfo)
            ref_pkts = run_reference(binary, stream, tmpdir)
            got_ref = ("CRASH" if ref_pkts is None
                       else count_matches(ref_pkts, planted))
            got_off = count_matches(
                run_ours(stream, rate, args.length, 128), planted)
            # cfo_correct pairs with the CFO-tolerant segmented sync:
            # past ~3e-3 cycles/sample the coherent LTS correlation
            # itself collapses below threshold (ops/correlate.py)
            got_on = count_matches(
                run_ours(stream, rate, args.length, 128, cfo_correct=True,
                         lts_segments=4), planted)
            cfo_rows.append((rate.name, cfo, got_ref, got_off, got_on,
                             n_frames))
            print(f"CFO {cfo:g}: ref {got_ref}  ours {got_off}  "
                  f"ours+cfo_correct {got_on}  /{n_frames}", flush=True)

    write_markdown(rows, args.length, time.time() - t0, cfo_rows)
    print(f"done in {time.time()-t0:.0f}s -> docs/REF_COMPARE.md")
    return 0


def write_markdown(rows, length, elapsed, cfo_rows=()) -> None:
    lines = [
        "# Reference vs ours: head-to-head PER under AWGN",
        "",
        "The compiled reference RX chain (every stage from",
        "/root/reference/src, run chunk-sequentially - identical outputs",
        "to its barrier pipeline) and our production `ReceiverChain`",
        "(single TPU chip, float32) fed IDENTICAL noisy sample streams:",
        f"{rows[0][5]} frames per point, {length}-byte random payloads,",
        "random inter-frame gaps, complex AWGN (tools/ref_compare.py;",
        "streams are complex128 for the reference, cast to complex64 for",
        "our chain's f32 device path).",
        "",
        "`ours(96)` uses the reference's 96-sample LTS search geometry",
        "(timing_sync.cpp:74-86); `ours(128)` our default, which closes",
        "the reference's own window-boundary miss (docs/NOTES_r3.md).",
        "Numbers are delivered-correct packets out of N.",
        "",
        "| rate | SNR (dB) | reference | ours (lts_search=96) |"
        " ours (lts_search=128) |",
        "|---|---|---|---|---|",
    ]
    for name, snr, ref, o96, o128, n in rows:
        lines.append(f"| {name} | {snr} | {ref}/{n} | {o96}/{n} |"
                     f" {o128}/{n} |")
    eq96 = sum(1 for r in rows if r[3] == r[2])
    gt96 = sum(1 for r in rows if r[3] > r[2])
    lt96 = sum(1 for r in rows if r[3] < r[2])
    lt128 = sum(1 for r in rows if r[4] < r[2])
    lines += [
        "",
        "Findings:",
        "",
        f"1. At the reference's own geometry, ours(96) equals the",
        f"   reference's delivered count at {eq96} of {len(rows)} points,",
        f"   is greater at {gt96} (ulp-level f32/double boundary flips in",
        f"   marginal LTS-window cases), and lower at {lt96}.",
        f"2. ours(128) delivers fewer than the reference at {lt128} of",
        f"   {len(rows)} points - the widened window recovers frames the",
        "   reference's own search geometry drops after a noise-",
        "   fragmented STS plateau; no decode-chain difference involved.",
        "",
    ]
    if cfo_rows:
        lines += [
            "",
            "## Carrier frequency offset (24 dB SNR)",
            "",
            "The reference's CFO estimation loop is dead code",
            "(`for(k = LTS1; k < LTS1; k++)` never runs,",
            "timing_sync.cpp:109-112), so it has no defense against",
            "oscillator error beyond its per-symbol pilot phase tracking;",
            "`cfo_correct=True` is our working coarse(STS)+fine(LTS)",
            "cascade paired with the segmented CFO-tolerant LTS sync",
            "(ChainParams.lts_segments=4) - unambiguous to ~+-1/32",
            "cycles/sample, a realistic oscillator range (+-20 ppm at",
            "5.72 GHz / 5 MS/s is +-0.023). At 5 MS/s, 1e-3",
            "cycles/sample = a 5 kHz oscillator error.",
            "",
            "| rate | CFO (cycles/sample) | reference | ours (cfo off) |"
            " ours (cfo_correct=True) |",
            "|---|---|---|---|---|",
        ]
        for name, cfo, ref, off, on, n in cfo_rows:
            ref_s = ref if isinstance(ref, str) else f"{ref}/{n}"
            lines.append(f"| {name} | {cfo:g} | {ref_s} | {off}/{n} |"
                         f" {on}/{n} |")
        if any(isinstance(r[2], str) for r in cfo_rows):
            lines += [
                "",
                "CRASH = the compiled reference chain aborts (SIGABRT) on",
                "that stream: CFO-corrupted SIGNAL headers drive its",
                "decoder into an aborting state, where our chain reports",
                "CRC failures and keeps streaming.",
            ]
    lines += [
        "",
        f"Generated in {elapsed:.0f}s by `tools/ref_compare.py`.",
        "",
    ]
    with open(_REPO / "docs" / "REF_COMPARE.md", "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    sys.exit(main())
