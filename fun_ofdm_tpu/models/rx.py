"""Frame-synchronous RX: decode a frame given its (detected) start offset.

This is the reference RX chain stages 3-6 (fft_symbols, channel_est,
phase_tracker, frame_decoder -> ppdu decode) recast as one pure batched
function. The streaming front-end (frame detection / timing sync) lives in
models/frontend.py and produces the start offsets consumed here.

Geometry (see preamble.py): relative to the preamble start P the reference
extracts every 64-sample symbol body 8 samples early (inside its cyclic
prefix) - the constant 8-sample rotation appears as a linear phase that the
LTS channel estimate absorbs exactly (reference: src/timing_sync.cpp:36-44).

The reference timing_sync also derotates all post-LTS samples by a constant
phase e^{i*arg(x[P+319]*conj(LTS[63]))} (its CFO loop is dead code,
src/timing_sync.cpp:109-115). That constant multiplies LTS and data symbols
alike, so the zero-forcing equalizer cancels it exactly; we omit it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import preamble as pre
from ..ops import fft64, mapper
from ..rates import Rate, params_for
from . import ppdu


def extract_symbols(samples: jnp.ndarray, start, num_symbols: int):
    """Slice LTS bodies and OFDM symbol bodies from a raw sample stream.

    samples: (..., n) complex; start: (...,) int32 preamble-start offsets
    (traced OK); num_symbols: static count of data symbols (excl. SIGNAL).
    Returns (lts (..., 2, 64), syms (..., 1+num_symbols, 64)) time domain.
    """
    start = jnp.asarray(start, jnp.int32)
    nsym_total = 1 + num_symbols

    # the last symbol body ends 16 samples before a full 80-stride, so
    # slice exactly through it (slicing nsym_total*80 would run 8 samples
    # past the frame end and dynamic_slice would clamp, shifting everything)
    body_len = (nsym_total - 1) * 80 + 64
    gather_idx = (80 * jnp.arange(nsym_total)[:, None]
                  + jnp.arange(64)[None, :])  # (S, 64)

    def slice_one(x, p):
        lts1 = jax.lax.dynamic_slice(x, (p + pre.LTS1_OFFSET,), (64,))
        lts2 = jax.lax.dynamic_slice(x, (p + pre.LTS2_OFFSET,), (64,))
        body = jax.lax.dynamic_slice(x, (p + pre.SYMBOL0_OFFSET,), (body_len,))
        syms = body[gather_idx]
        return jnp.stack([lts1, lts2]), syms

    flat_batch = samples.shape[:-1]
    if flat_batch:
        fn = slice_one
        for _ in flat_batch:
            fn = jax.vmap(fn)
        return fn(samples, start)
    return slice_one(samples, start)


def channel_estimate(lts_time: jnp.ndarray) -> jnp.ndarray:
    """Zero-forcing inverse channel estimate from the two LTS symbols.

    lts_time: (..., 2, 64) time-domain LTS bodies.
    H_inv[j] = mean over both LTS of LTS_ref[j] / LTS_rx[j], zeroed on
    inactive bins (reference: src/channel_est.cpp:44-58; the reference
    produces NaN at null bins in noise-free loopback and never reads them -
    we zero them instead).
    """
    lts_f = fft64.forward(lts_time)  # (..., 2, 64)
    ref = jnp.asarray(pre.LTS_FREQ_DOMAIN, lts_f.dtype)
    active = jnp.asarray((pre.LTS_FREQ_DOMAIN != 0).astype(jnp.float32))
    safe = jnp.where(lts_f == 0, 1, lts_f)
    inv = jnp.mean(ref / safe, axis=-2)  # (..., 64)
    return inv * active


def equalize_and_track(sym_time: jnp.ndarray, h_inv: jnp.ndarray) -> jnp.ndarray:
    """FFT, equalize, pilot phase-track, extract 48 data subcarriers.

    sym_time: (..., S, 64) time-domain symbol bodies (S = 1+num_symbols,
    index 0 = SIGNAL). Returns (..., S, 48) equalized data samples.
    (reference: src/channel_est.cpp:77-81, src/phase_tracker.cpp:70-105)
    """
    freq = fft64.forward(sym_time)
    eq = freq * h_inv[..., None, :]
    nsym = sym_time.shape[-2]
    pol = jnp.asarray(mapper.polarity_for_symbols(nsym, 0))  # (S,)
    pilot_ref = (pol[:, None] * jnp.asarray(mapper.PILOT_VALUES)).astype(eq.dtype)
    rx_pilots = eq[..., jnp.asarray(mapper.PILOT_IDX)]  # (..., S, 4)
    phase_err = jnp.mean(rx_pilots * jnp.conj(pilot_ref), axis=-1)  # (..., S)
    angle = jnp.angle(phase_err)
    rot = jnp.exp(-1j * angle).astype(eq.dtype)
    data = mapper.demap_symbols(eq)  # (..., S, 48)
    return data * rot[..., None]


def decode_frame(samples: jnp.ndarray, rate: Rate, length: int, start=0):
    """Full frame decode from raw samples.

    samples: (..., n) complex stream containing a frame whose preamble
    starts at `start` (static or traced int offsets, broadcast over batch).
    rate, length: static frame configuration.

    Returns dict with payload (..., length), crc_ok, header_ok,
    rate_field, hdr_length, service.
    """
    rp = params_for(rate)
    nsym = rp.num_symbols(length)
    start = jnp.broadcast_to(jnp.asarray(start, jnp.int32), samples.shape[:-1])
    lts, syms = extract_symbols(samples, start, nsym)
    h_inv = channel_estimate(lts)
    data = equalize_and_track(syms, h_inv)  # (..., 1+nsym, 48)

    rate_field, hdr_length, header_ok = ppdu.decode_header(data[..., 0, :])
    payload, crc_ok, service = ppdu.decode_data(
        data[..., 1:, :].reshape(*data.shape[:-2], -1), rate, length)
    return {
        "payload": payload,
        "crc_ok": crc_ok,
        "header_ok": header_ok,
        "rate_field": rate_field,
        "hdr_length": hdr_length,
        "service": service,
    }


@functools.lru_cache(maxsize=None)
def decode_frame_jit(rate: Rate, length: int):
    """Jitted decode_frame specialized for one (rate, length)."""
    return jax.jit(functools.partial(decode_frame, rate=rate, length=length))
