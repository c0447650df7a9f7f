"""Sliding-window correlators for the RX front-end.

TPU-native replacements for the reference's per-sample loops:

  * STS autocorrelation + power (reference: src/frame_detector.cpp:47-63,
    src/circular_accumulator.h) -> windowed sums built from shifted adds
    (exact per-window arithmetic - no long cumsum error accumulation).
  * plateau detection (reference: src/frame_detector.cpp:65-82) -> a
    cummax run-length trick instead of a stateful counter.
  * 64-tap LTS cross-correlation (reference: src/timing_sync.cpp:74-86)
    -> one correlation over the whole stream as a matmul against the LTS
    taps so it rides the MXU when batched.

All functions operate on the last axis and broadcast over leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import preamble as pre


def _trailing_window_sum(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """y[n] = sum_{k=n-w+1..n} x[k], zeros before the start. Shape-preserving."""
    pad = jnp.zeros(x.shape[:-1] + (w - 1,), x.dtype)
    xp = jnp.concatenate([pad, x], axis=-1)
    acc = xp[..., w - 1:]
    for s in range(1, w):
        acc = acc + xp[..., w - 1 - s: xp.shape[-1] - s]
    return acc


def sts_autocorrelation(x: jnp.ndarray, lag: int = 16):
    """Schmidl&Cox-style lagged autocorrelation and power, per sample.

    corr[n] = sum over the last 16 samples of x[k]*conj(x[k-16]) (x[<0]=0),
    power[n] = sum of |x[k]|^2 over the same window - exactly the two
    circular accumulators in the reference detector.
    Returns (corr complex, power real), same shapes as x.
    """
    pad = jnp.zeros(x.shape[:-1] + (lag,), x.dtype)
    delayed = jnp.concatenate([pad, x[..., :-lag]], axis=-1)
    prod = x * jnp.conj(delayed)
    corr = _trailing_window_sum(prod, lag)
    power = _trailing_window_sum(jnp.abs(x) ** 2, lag)
    return corr, power


def sts_ratio(x: jnp.ndarray, lag: int = 16) -> jnp.ndarray:
    """Normalized |corr|/power with zero-power guarded to 0.

    (The reference computes NaN at zero power, and NaN > threshold is
    false - guarding to 0 gives identical comparisons.)
    """
    corr, power = sts_autocorrelation(x, lag)
    return jnp.where(power > 0, jnp.abs(corr) / jnp.where(power > 0, power, 1), 0.0)


def plateau_run_lengths(above: jnp.ndarray) -> jnp.ndarray:
    """runlen[n] = number of consecutive True values ending at n."""
    n = above.shape[-1]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), above.shape)
    last_below = jax.lax.cummax(
        jnp.where(above, jnp.int32(-1), idx), axis=above.ndim - 1)
    return idx - last_below


def sts_end_events(ratio: jnp.ndarray, threshold: float,
                   plateau_len: int) -> jnp.ndarray:
    """Boolean mask of STS_END positions.

    Matches the reference's stateful counter (frame_detector.cpp:65-82):
    an end fires at the first below-threshold sample following a run of at
    least `plateau_len` above-threshold samples.
    """
    above = ratio > threshold
    runlen = plateau_run_lengths(above)
    prev_run = jnp.concatenate(
        [jnp.zeros(above.shape[:-1] + (1,), jnp.int32), runlen[..., :-1]],
        axis=-1)
    return (~above) & (prev_run >= plateau_len)


def lts_correlation(x: jnp.ndarray):
    """64-tap LTS matched filter over the whole stream.

    norm[p] = |sum_s x[p+s] * conj(LTS[s])| / sum_s |x[p+s]|^2
    (reference: timing_sync.cpp:77-84). Positions with p+63 beyond the end
    are zero. Returns (..., n) float.
    """
    n = x.shape[-1]
    taps = np.asarray(pre.LTS_TIME_DOMAIN_CONJ)
    pad = jnp.zeros(x.shape[:-1] + (63,), x.dtype)
    xp = jnp.concatenate([x, pad], axis=-1)
    # 64 shifted scaled adds: O(n) memory, fully fusable elementwise work
    corr = jnp.zeros(x.shape, x.dtype)
    power = jnp.zeros(x.shape, jnp.real(x).dtype)
    for s in range(64):
        shifted = xp[..., s: s + n]
        corr = corr + shifted * jnp.asarray(taps[s], x.dtype)
        power = power + jnp.abs(shifted) ** 2
    valid = jnp.arange(n) <= n - 64
    norm = jnp.where(power > 0, jnp.abs(corr) / jnp.where(power > 0, power, 1), 0.0)
    return jnp.where(valid, norm, 0.0)
