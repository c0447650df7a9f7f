"""Batched 64-pt FFT/IFFT in the centered subcarrier convention.

The reference wraps FFTW3 with an fftshift index map so callers always see
symbols in centered order (index 0 = subcarrier -32)
(reference: src/fft.cpp:20-96). Here both directions are batched jnp.fft
calls with the shift folded in; XLA lowers these to its native FFT.

  time  = ifft(ifftshift(sym))          (inverse scales by 1/64, fft.cpp:92-95)
  sym   = fftshift(fft(time))
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse(symbols: jnp.ndarray) -> jnp.ndarray:
    """(..., 64) centered-order freq symbols -> (..., 64) time samples."""
    return jnp.fft.ifft(jnp.fft.ifftshift(symbols, axes=-1), axis=-1)


def forward(samples: jnp.ndarray) -> jnp.ndarray:
    """(..., 64) time samples -> (..., 64) centered-order freq symbols."""
    return jnp.fft.fftshift(jnp.fft.fft(samples, axis=-1), axes=-1)
