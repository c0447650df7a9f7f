"""TX frame builder: payload bytes -> baseband time-domain frame.

TPU-native equivalent of the reference frame_builder
(src/frame_builder.cpp:53-82): ppdu encode -> subcarrier map -> batched
64-pt IFFT -> cyclic-prefix insert -> preamble prepend, as one pure jitted
function over batched frames. All shapes are static per (rate, payload
length); batch via the leading dimensions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import preamble as pre
from ..ops import fft64, mapper
from ..rates import Rate, params_for
from . import ppdu


def build_frame(payload: jnp.ndarray, rate: Rate,
                dtype=jnp.complex64) -> jnp.ndarray:
    """payload (..., length) bytes -> frame (..., 320+80*(1+nsym)) samples."""
    samples = ppdu.encode(payload, rate, dtype=dtype)  # (..., (1+nsym)*48)
    batch = samples.shape[:-1]
    syms = samples.reshape(*batch, -1, 48)
    mapped = mapper.map_symbols(syms, start_symbol=0)  # (..., S, 64)
    time = fft64.inverse(mapped).astype(dtype)
    # cyclic prefix: prepend last 16 samples of each 64-sample symbol
    prefixed = jnp.concatenate([time[..., 48:], time], axis=-1)  # (..., S, 80)
    flat = prefixed.reshape(*batch, -1)
    pream = jnp.asarray(pre.PREAMBLE_SAMPLES, dtype)
    pream = jnp.broadcast_to(pream, batch + (320,))
    return jnp.concatenate([pream, flat], axis=-1)


@functools.lru_cache(maxsize=None)
def build_frame_jit(rate: Rate, dtype=jnp.complex64):
    """A jitted build_frame specialized for one rate."""
    return jax.jit(functools.partial(build_frame, rate=rate, dtype=dtype))
