"""Bit/byte packing helpers (MSB-first, matching the reference codec).

The reference reads data MSB-first per byte into the convolutional encoder
(reference: src/viterbi.cpp:48-53) and the Viterbi chainback packs decoded
bits MSB-first into bytes (reference: src/viterbi.cpp:138-141). All bit
vectors in this package are arrays with one bit per element, in that order.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_WEIGHTS = np.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=np.int32)


def bytes_to_bits(data: jnp.ndarray) -> jnp.ndarray:
    """(..., n) uint8/int32 bytes -> (..., 8n) int32 bits, MSB first."""
    data = jnp.asarray(data, jnp.int32)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)
    bits = (data[..., :, None] >> shifts) & 1
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 8n) int32 bits -> (..., n) int32 bytes, MSB first."""
    bits = jnp.asarray(bits, jnp.int32)
    n = bits.shape[-1] // 8
    grouped = bits[..., : n * 8].reshape(*bits.shape[:-1], n, 8)
    return jnp.sum(grouped * jnp.asarray(_WEIGHTS), axis=-1)


def np_bytes_to_bits(data: np.ndarray) -> np.ndarray:
    """NumPy twin of bytes_to_bits (host-side/table precompute)."""
    data = np.asarray(data, np.int32)
    bits = (data[..., :, None] >> np.arange(7, -1, -1)) & 1
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def np_bits_to_bytes(bits: np.ndarray) -> np.ndarray:
    """NumPy twin of bits_to_bytes."""
    bits = np.asarray(bits, np.int32)
    n = bits.shape[-1] // 8
    grouped = bits[..., : n * 8].reshape(*bits.shape[:-1], n, 8)
    return np.sum(grouped * _WEIGHTS, axis=-1)
