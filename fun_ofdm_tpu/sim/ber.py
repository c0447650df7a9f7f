"""BER / PER vs SNR statistical harness.

The reference publishes no error-rate curves and has no channel simulator
(its only hardware-free test is the noise-free loopback,
reference: examples/test_sim.cpp:43-104), so this harness *establishes* the
statistical baseline: packet-error-rate and bit-error-rate vs SNR under
AWGN / CFO / multipath, for any rate.

Everything runs as one jitted function vectorized over (snr_point, frame):
random payloads are encoded, impaired, and decoded on-device; only the
error counters come back to the host. SNR is a traced input, so a single
compile serves a whole curve, and repetitions stream through the same
executable.

Two measurement modes:
  * frame-synchronous (`detect=False`): decode at the known frame offset -
    isolates the codec/equalizer chain (channel-decoder performance).
  * full-chain (`detect=True`): the frame is embedded at an offset the
    receiver does not know and must find via STS/LTS detection
    (models/frontend.py) - PER then includes missed/false detection,
    matching the reference RX chain's delivery contract.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import frontend, rx as rx_model, tx
from ..rates import Rate, params_for
from ..utils.bits import bytes_to_bits
from . import channel


@dataclass(frozen=True)
class ErrorRates:
    """Per-SNR-point error statistics."""

    snr_db: np.ndarray       # (S,)
    per: np.ndarray          # (S,) packet error rate (CRC fail or miss)
    ber: np.ndarray          # (S,) payload bit error rate (sync mode only)
    n_frames: int            # frames per SNR point


def _impair(frame, key, snr_db, cfo_norm, taps):
    if taps is not None:
        frame = channel.multipath(frame, taps)
    if cfo_norm:
        frame = channel.cfo(frame, cfo_norm)
    return channel.awgn(frame, key, snr_db)


@functools.lru_cache(maxsize=None)
def _sync_trial_fn(rate: Rate, length: int, batch: int, cfo_norm: float,
                   taps: tuple | None, cfo_correct: bool):
    """Jitted (key, snr_db (S,)) -> (crc_fail (S,), bit_err (S,)) counters."""
    taps_arr = None if taps is None else np.asarray(taps, np.complex128)

    def one_point(key, snr_db):
        kp, kn = jax.random.split(key)
        payload = jax.random.randint(kp, (batch, length), 0, 256, jnp.int32)
        frame = tx.build_frame_p(payload, rate)
        frame = _impair(frame, kn, snr_db, cfo_norm, taps_arr)
        out = rx_model.decode_frame_p(frame, rate, length,
                                      cfo_correct=cfo_correct)
        tx_bits = bytes_to_bits(payload)
        rx_bits = bytes_to_bits(out["payload"])
        bit_err = jnp.sum(tx_bits != rx_bits)
        return jnp.sum(~out["crc_ok"]), bit_err

    def trial(key, snr_db):
        keys = jax.random.split(key, snr_db.shape[0])
        return jax.vmap(one_point)(keys, snr_db)

    return jax.jit(trial)


@functools.lru_cache(maxsize=None)
def _detect_trial_fn(rate: Rate, length: int, batch: int, cfo_norm: float,
                     taps: tuple | None, pad: int, max_frames: int):
    """Jitted full-chain trial: detection + decode of one embedded frame."""
    taps_arr = None if taps is None else np.asarray(taps, np.complex128)
    frame_len = params_for(rate).frame_samples(length)
    n = frame_len + 2 * pad

    def one_frame(key, snr_db):
        kp, ko, kn = jax.random.split(key, 3)
        payload = jax.random.randint(kp, (length,), 0, 256, jnp.int32)
        frame = tx.build_frame_p(payload, rate)
        offset = jax.random.randint(ko, (), 0, pad, jnp.int32)
        re = jnp.zeros(n, frame[0].dtype)
        im = jnp.zeros(n, frame[1].dtype)
        stream = (jax.lax.dynamic_update_slice(re, frame[0], (offset,)),
                  jax.lax.dynamic_update_slice(im, frame[1], (offset,)))
        stream = _impair(stream, kn, snr_db, cfo_norm, taps_arr)
        out = frontend.receive_capture_p(stream, rate, length, max_frames)
        match = jnp.all(out["payload"] == payload[None, :], axis=-1)
        ok = jnp.any(out["crc_ok"] & match)
        return ~ok

    def one_point(key, snr_db):
        keys = jax.random.split(key, batch)
        fails = jax.vmap(one_frame, in_axes=(0, None))(keys, snr_db)
        return jnp.sum(fails)

    def trial(key, snr_db):
        keys = jax.random.split(key, snr_db.shape[0])
        return jax.vmap(one_point)(keys, snr_db)

    return jax.jit(trial)


def error_rates(rate: Rate, length: int, snr_dbs: Sequence[float],
                n_frames: int = 256, batch: int = 32, seed: int = 0,
                cfo_norm: float = 0.0, taps: Sequence[complex] | None = None,
                cfo_correct: bool = False, detect: bool = False,
                pad: int = 256, max_frames: int = 4) -> ErrorRates:
    """Measure PER (and BER in sync mode) across SNR points.

    n_frames per SNR point are streamed in reps of `batch`; keys are split
    deterministically from `seed`. `taps` must be hashable (tuple) for the
    jit cache; BER is reported as NaN in detect mode (payload slots are
    meaningless for missed detections).
    """
    snr = jnp.asarray(list(snr_dbs), jnp.float32)
    s = snr.shape[0]
    taps_t = None if taps is None else tuple(complex(t) for t in taps)
    reps = -(-n_frames // batch)
    total = reps * batch
    key = jax.random.PRNGKey(seed)

    if detect:
        fn = _detect_trial_fn(rate, length, batch, float(cfo_norm), taps_t,
                              pad, max_frames)
        fails = np.zeros(s, np.int64)
        for r in range(reps):
            f = fn(jax.random.fold_in(key, r), snr)
            fails += np.asarray(f, np.int64)
        return ErrorRates(np.asarray(snr), fails / total,
                          np.full(s, np.nan), total)

    fn = _sync_trial_fn(rate, length, batch, float(cfo_norm), taps_t,
                        bool(cfo_correct))
    fails = np.zeros(s, np.int64)
    bit_err = np.zeros(s, np.int64)
    for r in range(reps):
        f, b = fn(jax.random.fold_in(key, r), snr)
        fails += np.asarray(f, np.int64)
        bit_err += np.asarray(b, np.int64)
    total_bits = total * length * 8
    return ErrorRates(np.asarray(snr), fails / total, bit_err / total_bits,
                      total)
