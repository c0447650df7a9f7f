#!/usr/bin/env python3
"""Benchmark: dense-stream RX throughput on real TPU hardware.

Pushes a dense capture (back-to-back 1500-byte RATE_3_4_QAM16 frames, the
reference test_sim configuration) through the full detect+decode pipeline
(STS autocorrelation, LTS sync, FFT, channel est, phase tracking, Viterbi,
CRC) and reports samples/s.

Baseline: the reference sim processes 1100 frame-lengths (100 frames +
1000x zero pad) of 7120 samples in ~1500.5 ms on its dev machine
(reference README.md:181-183) = 5.22 Msample/s - and its stream is ~91%
idle zeros, while ours is 100% frames. vs_baseline is our dense samples/s
over that number.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
with extra keys: streaming_samples_per_sec (the user-facing pipelined
ReceiverChain on the same dense stream, chunked like the reference's
4096-sample receiver loop) and decoded_payload_mbps.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

REFERENCE_SAMPLES_PER_SEC = 1100 * 7120 / 1.5005  # ~5.22e6

#: repo-local persistent compile cache: the first run pays XLA compile,
#: every later run (including the driver's) starts in seconds
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")


def main() -> None:
    from fun_ofdm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(CACHE_DIR)

    import jax
    import jax.numpy as jnp

    from fun_ofdm_tpu.models import frontend, tx
    from fun_ofdm_tpu.rates import Rate, params_for

    rate = Rate.RATE_3_4_QAM16
    length = 1500
    frame_len = params_for(rate).frame_samples(length)  # 7120

    # 128 frames fills the Viterbi kernel's 128-lane batch tile exactly
    channels = 16
    frames_per_channel = 8

    rng = np.random.default_rng(0)
    payloads = rng.integers(
        0, 256, size=(channels, length), dtype=np.uint8)
    fre, fim = tx.build_frame_p(jnp.asarray(payloads), rate)
    fre, fim = np.asarray(fre), np.asarray(fim)

    def dense(f):
        return np.concatenate(
            [np.tile(f[:, None, :], (1, frames_per_channel, 1)).reshape(
                channels, -1),
             np.zeros((channels, 2048), np.float32)], axis=1).astype(np.float32)

    s_re, s_im = dense(fre), dense(fim)
    n_samples = s_re.size

    fn = jax.jit(jax.vmap(functools.partial(
        lambda r, i: frontend.receive_capture_p(
            (r, i), rate=rate, length=length,
            max_frames=frames_per_channel))))

    streams_dev = (jax.device_put(jnp.asarray(s_re)),
                   jax.device_put(jnp.asarray(s_im)))
    # warmup/compile
    out = fn(*streams_dev)
    jax.block_until_ready(out)
    ok = int(np.asarray(out["crc_ok"]).sum())
    expected = channels * frames_per_channel
    assert ok == expected, f"decoded {ok}/{expected}"

    # Chain each rep's input on the previous rep's output (numerically a
    # no-op) so reps serialize; the axon tunnel pipelines aggressively and
    # same-input timing loops under-measure.
    chain = jax.jit(
        lambda re_s, ok: re_s + 0.0 * ok.sum().astype(re_s.dtype))
    reps = 10
    ok_dev = out["crc_ok"]
    jax.block_until_ready(chain(streams_dev[0], ok_dev))  # compile chain
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(chain(streams_dev[0], ok_dev), streams_dev[1])
        ok_dev = out["crc_ok"]
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    samples_per_sec = n_samples / dt
    payload_mbps = (channels * frames_per_channel * length * 8) / dt / 1e6

    # --- streaming chain: the user-facing ReceiverChain on one channel's
    # dense stream, fed in 4096-sample chunks like the reference receiver
    # loop (src/receiver.cpp:42-58) ----------------------------------------
    from fun_ofdm_tpu.config import ChainParams
    from fun_ofdm_tpu.runtime.chain import ReceiverChain

    sc_re, sc_im = s_re[0], s_im[0]

    def run_stream(chunk_size: int, warm: bool) -> float:
        params = ChainParams(chunk_size=chunk_size)
        chain = ReceiverChain(rates=(rate,), max_length=length,
                              params=params)
        t0 = time.perf_counter()
        got = 0
        for i in range(0, sc_re.size, chunk_size):
            got += len(chain.process_samples(
                (sc_re[i:i + chunk_size], sc_im[i:i + chunk_size])))
        got += len(chain.flush())
        dt = time.perf_counter() - t0
        if not warm:
            assert got == frames_per_channel, f"streaming decoded {got}"
        return sc_re.size / dt

    # reference-parity chunking (NUM_RX_SAMPLES=4096, receiver.h:16) and a
    # TPU-tuned operating point (larger strides amortize the per-window
    # host<->device round trip; the 4096 choice is a CPU-era constant)
    run_stream(4096, warm=True)     # compile
    streaming_sps = run_stream(4096, warm=False)
    run_stream(65536, warm=True)    # compile
    streaming_tuned_sps = run_stream(65536, warm=False)

    print(json.dumps({
        "metric": "dense_rx_throughput",
        "value": samples_per_sec,
        "unit": "samples/s",
        "vs_baseline": samples_per_sec / REFERENCE_SAMPLES_PER_SEC,
        "streaming_samples_per_sec": streaming_sps,
        "streaming_vs_baseline": streaming_sps / REFERENCE_SAMPLES_PER_SEC,
        "streaming_tuned_samples_per_sec": streaming_tuned_sps,
        "streaming_tuned_vs_baseline":
            streaming_tuned_sps / REFERENCE_SAMPLES_PER_SEC,
        "decoded_payload_mbps": payload_mbps,
    }))


if __name__ == "__main__":
    main()
