"""Baseband channel impairment models (planar, jittable, batched).

The reference has no channel simulator at all - its only hardware-free test
is a noise-free digital loopback (reference: examples/test_sim.cpp:43-104),
so the statistical baseline (BER/PER vs SNR) must be generated here. Every
impairment is a pure function (re, im), key -> (re, im) over the last axis,
broadcasting over leading batch dims, so channels compose with `vmap`,
`jit`, and mesh sharding like any other array op.

Impairments:
  * AWGN at a given SNR (dB) relative to a reference signal power;
  * carrier frequency offset (CFO) - progressive per-sample rotation
    e^{j 2 pi f n}, f in cycles/sample;
  * static phase offset and amplitude scale;
  * multipath - complex FIR taps (frequency-selective fading), handled by
    the RX zero-forcing LTS equalizer as long as the delay spread fits in
    the 16-sample cyclic prefix;
  * integer sample delay (frame position uncertainty for the detector).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import CArr

#: average per-sample power of a TX frame: 52 active unit-power subcarrier
#: bins spread by the 1/64-scaled IFFT give E|x[n]|^2 = 52/64^2 (preamble
#: matches; verified numerically to <1% across rates). Used as the default
#: SNR reference so "SNR" means per-sample signal power / noise power over
#: the occupied samples.
DEFAULT_SIGNAL_POWER = 52.0 / 4096.0


def awgn(x: CArr, key: jax.Array, snr_db, signal_power: float = DEFAULT_SIGNAL_POWER) -> CArr:
    """Add complex white Gaussian noise for a target SNR in dB.

    Noise variance per complex sample is signal_power / 10^(snr/10), split
    evenly between the planar components. snr_db may be a scalar or any
    shape broadcastable against the batch dims of x.
    """
    re, im = x
    snr_lin = 10.0 ** (jnp.asarray(snr_db, re.dtype) / 10.0)
    sigma = jnp.sqrt(signal_power / snr_lin / 2.0)
    while sigma.ndim < re.ndim:
        sigma = sigma[..., None]
    k1, k2 = jax.random.split(key)
    return (re + sigma * jax.random.normal(k1, re.shape, re.dtype),
            im + sigma * jax.random.normal(k2, im.shape, im.dtype))


def cfo(x: CArr, freq_norm) -> CArr:
    """Apply carrier frequency offset: x[n] * e^{j 2 pi freq_norm n}.

    freq_norm is the offset in cycles per sample (= f_offset_Hz / f_sample).
    At the reference's default 5 MS/s (reference: src/usrp.h:43), a 1 kHz
    oscillator error is freq_norm = 2e-4.
    """
    re, im = x
    n = jnp.arange(re.shape[-1], dtype=re.dtype)
    ang = 2.0 * jnp.pi * jnp.asarray(freq_norm, re.dtype) * n
    c, s = jnp.cos(ang), jnp.sin(ang)
    return re * c - im * s, re * s + im * c


def phase(x: CArr, phi) -> CArr:
    """Static phase rotation by phi radians."""
    re, im = x
    c = jnp.cos(jnp.asarray(phi, re.dtype))
    s = jnp.sin(jnp.asarray(phi, re.dtype))
    return re * c - im * s, re * s + im * c


def scale(x: CArr, amp) -> CArr:
    """Amplitude scale (the reference's tx_amp, src/usrp.cpp:94)."""
    re, im = x
    a = jnp.asarray(amp, re.dtype)
    return re * a, im * a


def multipath(x: CArr, taps: Sequence[complex] | np.ndarray) -> CArr:
    """Convolve with a static complex FIR channel (same-length output).

    taps[0] is the line-of-sight tap; later taps are echoes at 1-sample
    spacing. Delay spread must stay under the 16-sample cyclic prefix for
    the zero-forcing equalizer to invert it exactly.
    """
    re, im = x
    taps = np.asarray(taps, np.complex128)
    out_re = jnp.zeros_like(re)
    out_im = jnp.zeros_like(im)
    for d, t in enumerate(taps):
        if t == 0:
            continue
        sre = re if d == 0 else jnp.concatenate(
            [jnp.zeros(re.shape[:-1] + (d,), re.dtype), re[..., :-d]], axis=-1)
        sim = im if d == 0 else jnp.concatenate(
            [jnp.zeros(im.shape[:-1] + (d,), im.dtype), im[..., :-d]], axis=-1)
        tr, ti = float(t.real), float(t.imag)
        out_re = out_re + sre * tr - sim * ti
        out_im = out_im + sre * ti + sim * tr
    return out_re, out_im


def delay(x: CArr, n: int) -> CArr:
    """Prepend n zero samples (shifts frame starts right by n)."""
    re, im = x
    z = jnp.zeros(re.shape[:-1] + (n,), re.dtype)
    return (jnp.concatenate([z, re], axis=-1),
            jnp.concatenate([z, im], axis=-1))


def rayleigh_taps(key: jax.Array, n_taps: int, decay_db_per_tap: float = 3.0) -> np.ndarray:
    """Draw a random normalized Rayleigh-fading power-delay profile.

    Returns complex taps with exponentially decaying mean power and unit
    total power - a standard indoor multipath model for generating PER
    statistics. Host-side helper (returns numpy; channels are static per
    trial in the BER harness).
    """
    k1, k2 = jax.random.split(key)
    p = 10.0 ** (-decay_db_per_tap * np.arange(n_taps) / 10.0)
    p = p / p.sum()
    re = np.asarray(jax.random.normal(k1, (n_taps,))) * np.sqrt(p / 2)
    im = np.asarray(jax.random.normal(k2, (n_taps,))) * np.sqrt(p / 2)
    taps = re + 1j * im
    return taps / np.abs(np.sqrt((np.abs(taps) ** 2).sum()))
