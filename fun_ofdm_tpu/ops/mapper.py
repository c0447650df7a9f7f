"""Subcarrier mapping: 48 data samples <-> 64-bin OFDM symbols.

Centered subcarrier order (index 0 = subcarrier -32, 32 = DC). The active
map, pilot positions/values and the 127-periodic pilot polarity sequence
match the reference (src/symbol_mapper.cpp:24-61, src/phase_tracker.cpp:23-50).
Pilot polarity is indexed from the SIGNAL symbol: symbol k in the frame uses
POLARITY[k % 127].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

#: 0=null, 1=data, 2=pilot per subcarrier (reference: symbol_mapper.cpp:24-29)
ACTIVE_MAP: np.ndarray = np.array(
    [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
     1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 2, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], dtype=np.int32)

DATA_IDX: np.ndarray = np.nonzero(ACTIVE_MAP == 1)[0].astype(np.int32)  # 48
PILOT_IDX: np.ndarray = np.nonzero(ACTIVE_MAP == 2)[0].astype(np.int32)  # [11,25,39,53]
PILOT_VALUES: np.ndarray = np.array([1.0, 1.0, 1.0, -1.0])

#: 127-periodic pilot polarity (802.11a 17.3.5.9; reference symbol_mapper.cpp:38-48)
POLARITY: np.ndarray = np.array(
    [1, 1, 1, 1, -1, -1, -1, 1, -1, -1, -1, -1, 1, 1, -1, 1,
     -1, -1, 1, 1, -1, 1, 1, -1, 1, 1, 1, 1, 1, 1, -1, 1,
     1, 1, -1, 1, 1, -1, -1, 1, 1, 1, -1, 1, -1, -1, -1, 1,
     -1, 1, -1, -1, 1, -1, -1, 1, 1, 1, 1, 1, -1, -1, 1, 1,
     -1, -1, 1, -1, 1, -1, 1, 1, -1, -1, -1, 1, 1, -1, -1, -1,
     -1, 1, -1, -1, 1, -1, 1, 1, 1, 1, -1, 1, -1, 1, -1, 1,
     -1, -1, -1, -1, -1, 1, -1, 1, 1, -1, 1, -1, 1, 1, 1, -1,
     -1, 1, -1, -1, -1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1],
    dtype=np.float64)


def polarity_for_symbols(num_symbols: int, start: int = 0) -> np.ndarray:
    """POLARITY[(start+k) % 127] for k in range(num_symbols)."""
    idx = (np.arange(num_symbols) + start) % 127
    return POLARITY[idx]


def map_symbols_p(data, start_symbol: int = 0):
    """Planar (re, im) of (..., nsym, 48) data -> (..., nsym, 64) symbols.

    Inserts pilots (PILOT_VALUES * POLARITY[symbol index], purely real)
    and zero nulls. `start_symbol` is the polarity index of the first
    symbol (0 = SIGNAL).
    """
    re, im = data
    nsym = re.shape[-2]
    out_re = jnp.zeros(re.shape[:-1] + (64,), dtype=re.dtype)
    out_im = jnp.zeros(im.shape[:-1] + (64,), dtype=im.dtype)
    out_re = out_re.at[..., jnp.asarray(DATA_IDX)].set(re)
    out_im = out_im.at[..., jnp.asarray(DATA_IDX)].set(im)
    pol = polarity_for_symbols(nsym, start_symbol)  # (nsym,)
    pilots = (pol[:, None] * PILOT_VALUES[None, :])  # (nsym, 4)
    out_re = out_re.at[..., jnp.asarray(PILOT_IDX)].set(
        jnp.asarray(pilots, re.dtype))
    return out_re, out_im


def map_symbols(data: jnp.ndarray, start_symbol: int = 0) -> jnp.ndarray:
    """Complex wrapper of map_symbols_p (host/tests)."""
    re, im = map_symbols_p((jnp.real(data), jnp.imag(data)), start_symbol)
    return (re + 1j * im).astype(data.dtype)


def demap_symbols(symbols: jnp.ndarray) -> jnp.ndarray:
    """(..., 64) OFDM symbols -> (..., 48) data samples (ascending index)."""
    return symbols[..., jnp.asarray(DATA_IDX)]
