"""Soft-decision Viterbi decoder, K=7 rate-1/2, polys {121, 91}.

Bit-exact reimplementation of the reference's SPIRAL SSE kernel semantics
(reference: src/viterbi.cpp:166-459) as batched, state-vectorized JAX:

  * 64 states, path metrics are unsigned-8 semantics carried in int32:
    init all 63 with state 0 biased to 0 (viterbi.cpp:71-78);
    adds saturate at 255; when the *state-0* metric exceeds 210 after a
    step, the lane-minimum is subtracted from all metrics
    (viterbi.cpp:314-332).
  * branch metric for expected coded pair (e0, e1) against soft pair
    (s0, s1): t = ((s0 XOR E0) + (s1 XOR E1) + 1) >> 3 in 0..63, where
    Ek = 255 if ek else 0 and XOR-with-255 is complement
    (viterbi.cpp:242-251: _mm_avg_epu8 then >>2 & 63).
  * butterfly j in 0..31 pairs old states (j, j+32) -> new (2j, 2j+1):
      new[2j]   = min(old[j] + t_j,       old[j+32] + (63 - t_j))
      new[2j+1] = min(old[j] + (63-t_j),  old[j+32] + t_j)
    decision bit = 1 iff the j+32 path wins, ties -> 1
    (viterbi.cpp:252-267: _mm_min_epu8 + _mm_cmpeq_epi8 against the
    high-half candidate).
  * chainback from end state 0, skipping the first 6 decisions; decoded
    bit n = the decision bit read at trellis step n+6
    (viterbi.cpp:108-146).

The reference processes trellis steps in pairs and silently drops a final
odd step (viterbi.cpp:209: `i9 <= nbits/2-1`); we replicate by truncating
to an even step count. All 802.11a frame sizes are even so this never
triggers in practice.

Two execution strategies:
  * `viterbi_decode` - lax.scan over time, vectorized over (batch, 32)
    butterflies. Exact, simple; the baseline.
  * a Pallas TPU kernel (ops/viterbi_pallas.py) that runs the whole
    trellis in VMEM - the production path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

K = 7
NUMSTATES = 64
POLYS = (121, 91)


def _parity(x: int) -> int:
    return bin(x).count("1") & 1


@functools.lru_cache(maxsize=None)
def _branch_bits() -> tuple[np.ndarray, np.ndarray]:
    """(bt0, bt1): expected coded bits for butterfly j's j->2j transition.

    Branchtab[i][j] = parity((2j) & poly_i) (reference: viterbi.cpp:87-91).
    """
    bt0 = np.array([_parity((2 * j) & POLYS[0]) for j in range(32)], np.int32)
    bt1 = np.array([_parity((2 * j) & POLYS[1]) for j in range(32)], np.int32)
    return bt0, bt1


def _interleave_pairs(even: jnp.ndarray, odd: jnp.ndarray) -> jnp.ndarray:
    """(..., 32), (..., 32) -> (..., 64) with out[2j]=even[j], out[2j+1]=odd[j]."""
    stacked = jnp.stack([even, odd], axis=-1)  # (..., 32, 2)
    return stacked.reshape(*even.shape[:-1], 64)


def _acs_step(metrics: jnp.ndarray, s0: jnp.ndarray, s1: jnp.ndarray):
    """One trellis step.

    metrics: (..., 64) int32 path metrics (u8 semantics).
    s0, s1:  (...,) int32 soft symbol pair.
    Returns (new_metrics, decisions (..., 64) int32 0/1).
    """
    bt0, bt1 = _branch_bits()
    e0 = jnp.asarray(bt0, jnp.int32)  # (32,)
    e1 = jnp.asarray(bt1, jnp.int32)
    s0 = s0[..., None]
    s1 = s1[..., None]
    a = jnp.where(e0 == 1, 255 - s0, s0)  # (..., 32)
    b = jnp.where(e1 == 1, 255 - s1, s1)
    t = (a + b + 1) >> 3  # 0..63
    tc = 63 - t

    lo = metrics[..., :32]
    hi = metrics[..., 32:]
    m_even_lo = jnp.minimum(lo + t, 255)
    m_even_hi = jnp.minimum(hi + tc, 255)
    m_odd_lo = jnp.minimum(lo + tc, 255)
    m_odd_hi = jnp.minimum(hi + t, 255)

    new_even = jnp.minimum(m_even_lo, m_even_hi)
    dec_even = (m_even_hi <= m_even_lo).astype(jnp.int32)
    new_odd = jnp.minimum(m_odd_lo, m_odd_hi)
    dec_odd = (m_odd_hi <= m_odd_lo).astype(jnp.int32)

    new = _interleave_pairs(new_even, new_odd)
    dec = _interleave_pairs(dec_even, dec_odd)

    # renormalize when state 0's metric exceeds 210 (viterbi.cpp:314)
    need = new[..., 0:1] > 210
    new = jnp.where(need, new - jnp.min(new, axis=-1, keepdims=True), new)
    return new, dec


def default_impl() -> str:
    """'pallas' on TPU, 'scan' elsewhere; FUN_OFDM_VITERBI overrides."""
    env = os.environ.get("FUN_OFDM_VITERBI")
    if env:
        return env
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return "pallas" if platform == "tpu" else "scan"


#: below this many data bits the scan path wins (kernel launch overhead)
PALLAS_MIN_NBITS = 64


def viterbi_decode(soft: jnp.ndarray, nbits: int,
                   impl: str | None = None,
                   nbits_dynamic: jnp.ndarray | None = None,
                   return_exact: bool = False):
    """Decode soft symbols to bits (dispatches to the best backend impl).

    soft:  (..., 2*(nbits+6)) int32 soft coded bits (0..255; >=128 leans 1).
    nbits: number of data bits to output (static upper bound).
    impl:  'scan' | 'pallas' | 'pallas-blocked' | None (auto: Pallas
           kernel on TPU for non-trivial trellises, lax.scan otherwise).
           'scan' and 'pallas' are bit-exact; 'pallas-blocked' is the
           block-overlap time-parallel kernel (~10x lower latency at
           streaming batch sizes). Its block splices rely on survivor
           merges; pass return_exact=True to get the per-element
           merge-agreement flag and re-decode flagged elements exactly
           (see viterbi_pallas.viterbi_decode_pallas_blocked).
    nbits_dynamic: optional traced (...,) per-element data-bit counts
           <= nbits. Trellis steps past an element's count produce zero
           decisions, so the chainback stays in state 0 until the element's
           real trellis end - exactly the reference semantics for a frame
           of that length (viterbi.cpp:193-194). Output bits past an
           element's count are unspecified.
    return_exact: also return a (...,) bool flag - True where the result
           carries the bit-exactness guarantee (always True for
           scan/pallas; the blocked kernel's merge guard otherwise).
    Returns (..., nbits) int32 decoded bits (plus the flag if requested).
    """
    impl = impl or default_impl()
    if impl == "pallas-blocked" and nbits >= PALLAS_MIN_NBITS:
        from . import viterbi_pallas

        if default_impl() != "pallas":
            # CPU/test rigs: the compiled-kernel fast path doesn't apply;
            # fall back to the exact scan (blocked is a TPU latency
            # optimization, its interpret mode is far slower than scan)
            bits = viterbi_decode_scan(soft, nbits,
                                       nbits_dynamic=nbits_dynamic)
            if return_exact:
                return bits, jnp.ones(bits.shape[:-1], bool)
            return bits
        return viterbi_pallas.viterbi_decode_pallas_blocked(
            soft, nbits, nbits_dynamic=nbits_dynamic,
            return_merge_ok=return_exact)
    if impl in ("pallas", "pallas-blocked") and nbits >= PALLAS_MIN_NBITS:
        from . import viterbi_pallas

        bits = viterbi_pallas.viterbi_decode_pallas(
            soft, nbits, nbits_dynamic=nbits_dynamic)
    else:
        bits = viterbi_decode_scan(soft, nbits, nbits_dynamic=nbits_dynamic)
    if return_exact:
        return bits, jnp.ones(bits.shape[:-1], bool)
    return bits


def viterbi_decode_scan(soft: jnp.ndarray, nbits: int,
                        nbits_dynamic: jnp.ndarray | None = None
                        ) -> jnp.ndarray:
    """lax.scan trellis (exact, portable baseline impl)."""
    soft = jnp.asarray(soft, jnp.int32)
    total_steps = nbits + (K - 1)
    steps = (total_steps // 2) * 2  # reference drops a trailing odd step
    batch_shape = soft.shape[:-1]

    metrics0 = jnp.full(batch_shape + (NUMSTATES,), 63, jnp.int32)
    metrics0 = metrics0.at[..., 0].set(0)

    if nbits_dynamic is None:
        pairs = soft[..., : 2 * steps].reshape(*batch_shape, steps, 2)
        pairs = jnp.moveaxis(pairs, -2, 0)  # (steps, ..., 2)

        def fwd(metrics, pair):
            new, dec = _acs_step(metrics, pair[..., 0], pair[..., 1])
            return new, dec

        _, decisions = jax.lax.scan(fwd, metrics0, pairs)  # (steps, ..., 64)
    else:
        # per-element even-truncated step counts; masked steps leave the
        # metrics untouched and record zero decisions
        nb = jnp.broadcast_to(jnp.asarray(nbits_dynamic, jnp.int32),
                              batch_shape)
        steps_vec = ((nb + (K - 1)) // 2) * 2
        pairs = soft[..., : 2 * steps].reshape(*batch_shape, steps, 2)
        pairs = jnp.moveaxis(pairs, -2, 0)
        t_idx = jnp.arange(steps, dtype=jnp.int32)

        def fwd(metrics, xs):
            t, pair = xs
            new, dec = _acs_step(metrics, pair[..., 0], pair[..., 1])
            live = (t < steps_vec)[..., None]
            return (jnp.where(live, new, metrics),
                    jnp.where(live, dec, 0))

        _, decisions = jax.lax.scan(fwd, metrics0, (t_idx, pairs))

    # decisions for steps in [steps, total_steps) were never computed;
    # the reference leaves them zeroed (viterbi.cpp:193-194)
    if steps < total_steps:
        pad = jnp.zeros((total_steps - steps,) + batch_shape + (64,), jnp.int32)
        decisions = jnp.concatenate([decisions, pad], axis=0)

    # chainback from end state 0 over t = total_steps-1 .. 0; decoded
    # bit n (= t-6) is the decision bit read at step t
    rev = decisions[::-1]  # t = total-1 first

    def back(state, dec_t):
        k = jnp.take_along_axis(dec_t, state[..., None], axis=-1)[..., 0]
        new_state = (state >> 1) | (k << 5)
        return new_state, k

    state0 = jnp.zeros(batch_shape, jnp.int32)
    _, ks = jax.lax.scan(back, state0, rev)  # ks[i] = k at t = total-1-i
    ks = ks[::-1]  # ks[t] = decision bit at step t
    return jnp.moveaxis(ks[K - 1 : K - 1 + nbits], 0, -1)


def conv_decode_bytes(soft: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """Decode and pack to bytes like the reference conv_decode.

    Returns (..., ceil(nbits/8)... ) - actually floor((nbits+7)/8) bytes with
    trailing partial-byte bits from the chainback register, matching
    viterbi_chainback's byte packing (MSB-first; the final partial byte is
    the low bits of the sliding register - callers only consume whole bytes
    of payload so exactness is preserved for them).
    """
    from ..utils.bits import bits_to_bytes

    bits = viterbi_decode(soft, nbits)
    pad = (-nbits) % 8
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), jnp.int32)], axis=-1)
    return bits_to_bytes(bits)
