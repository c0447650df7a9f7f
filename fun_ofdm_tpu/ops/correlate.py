"""Sliding-window correlators for the RX front-end (planar complex).

TPU-native replacements for the reference's per-sample loops:

  * STS autocorrelation + power (reference: src/frame_detector.cpp:47-63,
    src/circular_accumulator.h) -> windowed sums built from shifted adds
    (exact per-window arithmetic - no long cumsum error accumulation).
  * plateau detection (reference: src/frame_detector.cpp:65-82) -> a
    cummax run-length trick instead of a stateful counter.
  * 64-tap LTS cross-correlation (reference: src/timing_sync.cpp:74-86)
    -> 64 shifted scaled adds over the whole stream (fusable elementwise).

All functions take planar (re, im) streams, operate on the last axis, and
broadcast over leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import preamble as pre
from .cplx import CArr


def _trailing_window_sum(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """y[n] = sum_{k=n-w+1..n} x[k], zeros before the start. Shape-preserving.

    Unrolled shifted adds (exact per-window sums - no cumsum-difference
    drift). Measured on TPU v5e this fuses into the surrounding
    elementwise graph and beats a reduce_window formulation ~1.5x at
    runtime (reduce_window materializes its operand; the A/B is in the
    round-2 notes) - with the XLA remote/persistent compile cache the
    extra HLO ops no longer matter for compile time.
    """
    pad = jnp.zeros(x.shape[:-1] + (w - 1,), x.dtype)
    xp = jnp.concatenate([pad, x], axis=-1)
    acc = xp[..., w - 1:]
    for s in range(1, w):
        acc = acc + xp[..., w - 1 - s: xp.shape[-1] - s]
    return acc


def sts_autocorrelation(x: CArr, lag: int = 16):
    """Schmidl&Cox-style lagged autocorrelation and power, per sample.

    corr[n] = sum over the last 16 samples of x[k]*conj(x[k-16]) (x[<0]=0),
    power[n] = sum of |x[k]|^2 over the same window - exactly the two
    circular accumulators in the reference detector.
    Returns (corr planar, power real), shapes of x.
    """
    re, im = x
    pad = jnp.zeros(re.shape[:-1] + (lag,), re.dtype)
    dre = jnp.concatenate([pad, re[..., :-lag]], axis=-1)
    dim = jnp.concatenate([pad, im[..., :-lag]], axis=-1)
    # x * conj(delayed)
    p_re = re * dre + im * dim
    p_im = im * dre - re * dim
    corr = (_trailing_window_sum(p_re, lag), _trailing_window_sum(p_im, lag))
    power = _trailing_window_sum(re * re + im * im, lag)
    return corr, power


def sts_ratio(x: CArr, lag: int = 16) -> jnp.ndarray:
    """Normalized |corr|/power with zero-power guarded to 0.

    (The reference computes NaN at zero power, and NaN > threshold is
    false - guarding to 0 gives identical comparisons.)
    """
    corr, power = sts_autocorrelation(x, lag)
    mag = jnp.sqrt(corr[0] * corr[0] + corr[1] * corr[1])
    return jnp.where(power > 0, mag / jnp.where(power > 0, power, 1), 0.0)


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


def leading_window_any(mask: jnp.ndarray, w: int) -> jnp.ndarray:
    """out[n] = any(mask[n : n+w]) (False past the end). Shape-preserving.

    Unrolled shifted ORs: like the other correlator windows these fuse
    into the surrounding elementwise graph, measured ~12% faster
    end-to-end than a reduce_window max on TPU v5e (96.6 vs 84.5
    Msample/s capture throughput; docs/NOTES_r2.md).
    """
    reach = mask
    for s in range(1, w):
        shifted = jnp.concatenate(
            [mask[..., s:], jnp.zeros(mask.shape[:-1] + (s,), bool)],
            axis=-1)
        reach = reach | shifted
    return reach


def lts_correlation(x: CArr) -> jnp.ndarray:
    """64-tap LTS matched filter over the whole stream.

    norm[p] = |sum_s x[p+s] * conj(LTS[s])| / sum_s |x[p+s]|^2
    (reference: timing_sync.cpp:77-84). Positions with p+63 beyond the end
    are zero. Returns (..., n) float.

    64 unrolled shifted multiply-adds: XLA fuses them into one elementwise
    pass, which measured ~2x faster end-to-end on TPU v5e than a
    conv_general_dilated formulation (the conv materializes im2col
    patches; A/B in the round-2 notes). Compile cost of the unroll is
    absorbed by the persistent/remote compile cache.
    """
    re, im = x
    n = re.shape[-1]
    taps = np.asarray(pre.LTS_TIME_DOMAIN_CONJ)
    pad = jnp.zeros(re.shape[:-1] + (63,), re.dtype)
    rep = jnp.concatenate([re, pad], axis=-1)
    imp = jnp.concatenate([im, pad], axis=-1)
    # 64 shifted scaled adds: O(n) memory, fully fusable elementwise work
    c_re = jnp.zeros(re.shape, re.dtype)
    c_im = jnp.zeros(re.shape, re.dtype)
    power = jnp.zeros(re.shape, re.dtype)
    for s in range(64):
        sre = rep[..., s: s + n]
        sim = imp[..., s: s + n]
        tr, ti = float(taps[s].real), float(taps[s].imag)
        c_re = c_re + sre * tr - sim * ti
        c_im = c_im + sre * ti + sim * tr
        power = power + sre * sre + sim * sim
    valid = jnp.arange(n) <= n - 64
    mag = jnp.sqrt(c_re * c_re + c_im * c_im)
    norm = jnp.where(power > 0, mag / jnp.where(power > 0, power, 1), 0.0)
    return jnp.where(valid, norm, 0.0)
