"""Pallas TPU kernel for the Viterbi trellis (K=7, rate-1/2, 64 states).

This is the TPU-native equivalent of the reference's SPIRAL-generated SSE
add-compare-select kernel (reference: src/viterbi.cpp:208-459) and is
bit-exact with ops/viterbi.viterbi_decode (the lax.scan formulation), which
itself is bit-exact with the reference semantics.

Why a kernel: the trellis is sequential in time, so as a lax.scan it issues
one tiny XLA op per step (~12k steps for a 1500-byte frame) and the chip
idles on dispatch overhead. Here the whole trellis runs inside two
pallas_calls with the path metrics resident in VMEM:

  * layout: 64 trellis states on sublanes, frames on lanes (BATCH_TILE=128),
    so one ACS step is a handful of (64, 128) VPU ops;
  * forward pass: grid (batch_tiles, time_chunks); metrics live in VMEM
    scratch across grid steps; per-step decision bits stream out to HBM as
    int8 blocks (Pallas double-buffers the DMA behind the compute);
  * chainback pass: a second pallas_call walks the decision blocks with a
    time-reversed index map, carrying the survivor state in scratch; the
    per-lane "read decision bit at my state" gather is a one-hot multiply +
    sublane reduction (TPU has no per-lane dynamic gather).

Integer semantics follow the reference exactly: metrics are u8 values
carried in int32 (saturating add at 255, init 63 with state 0 at 0,
renormalize by the lane minimum when the state-0 metric exceeds 210,
ties in the compare go to the high-half path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .viterbi import K, NUMSTATES, _branch_bits

BATCH_TILE = 128   # frames per lane tile
TIME_CHUNK = 256   # trellis steps per grid step
_SUB = 8           # trellis steps per inner unrolled block (sublane tile)
#: merge-guard margin: bits excluded from each end of the doubly-decoded
#: cut region (each window's outermost bits are unreliable by design -
#: see _blocked_decode_impl). 40 > the typical survivor-merge distance of
#: ~5 constraint lengths = 35 steps (ADVICE r4: 32 sat below it, so a
#: healthy frame could occasionally trip the guard and pay a synchronous
#: exact re-decode); the guarded overlap at the production warmup=128
#: still leaves a 176-bit compared region.
_GUARD_TRIM = 40


#: supported ACS metric carrier dtypes (python strings; see _acs_kernel)
METRIC_DTYPES = ("int32", "int16", "uint8")

#: production default ACS metric dtype; chosen by on-chip A/B
#: (tools/viterbi_acs_ab.py, docs/NOTES_r4.md)
DEFAULT_METRIC_DTYPE = "int32"

#: trellis steps fused per ACS kernel iteration. radix 4 fuses two steps,
#: paying the 64-state sublane interleave once per TWO steps (it was ~40%
#: of radix-2 ACS cost, docs/NOTES_r4.md) and halving the chainback's
#: sequential one-hot gathers (2 decision bits per fused entry). Both are
#: bit-exact (the intermediate renorm is replicated); chosen by on-chip
#: A/B (tools/viterbi_acs_ab.py, docs/NOTES_r5.md): radix 4 wins the
#: large-batch sequential kernel (3.18 -> 2.60 ms at batch 128 x 12054
#: bits); the block-overlap kernel's short per-lane windows favor radix 2
#: (1.42 vs 1.61 ms at its batch-4 streaming shape), so it keeps its own
#: default.
DEFAULT_RADIX = 4
DEFAULT_RADIX_BLOCKED = 2


@functools.lru_cache(maxsize=None)
def _branch_cols(dtype: str = "int32") -> np.ndarray:
    """(64, 1): [e0 for 32 butterflies; e1 for 32 butterflies]."""
    bt0, bt1 = _branch_bits()
    return np.concatenate([bt0, bt1]).reshape(64, 1).astype(dtype)


@functools.lru_cache(maxsize=None)
def _branch_cols_r4(dtype: str = "int32") -> np.ndarray:
    """(128, 1) branch-table columns for the radix-4 fused kernel.

    Rows [e0(32); e1(32)] feed the first sub-step's full butterfly pass;
    rows [e0_even(16); e0_odd(16); e1_even(16); e1_odd(16)] are the
    second sub-step's tables pre-gathered at butterflies 2q / 2q+1 on the
    HOST (the fused step's mid states 2q+b1 hit exactly the even/odd
    butterflies, so the stride-2 gather becomes a static constant instead
    of a runtime sublane shuffle).
    """
    bt0, bt1 = _branch_bits()
    return np.concatenate([
        bt0, bt1, bt0[0::2], bt0[1::2], bt1[0::2], bt1[1::2],
    ]).reshape(128, 1).astype(dtype)


def _metric_ops(dt):
    """(branch_metric, sat_add) for one metric carrier dtype (u8-semantics
    arithmetic, shared by the radix-2 and radix-4 kernels - ONE
    definition so the bit-exactness contract cannot silently diverge)."""
    if dt == jnp.uint8:
        def branch_metric(a, b):
            # (a + b + 1) >> 3 without leaving u8: rounded average
            # (_mm_avg_epu8) then >> 2 (reference viterbi.cpp:242-251)
            avg = (a >> 1) + (b >> 1) + ((a | b) & 1)
            return avg >> 2

        def sat_add(m, t):
            s = m + t                        # wraps mod 256
            return jnp.where(s < m, jnp.full((), 255, dt), s)
    else:
        def branch_metric(a, b):
            return (a + b + 1) >> 3

        def sat_add(m, t):
            return jnp.minimum(m + t, 255).astype(dt)
    return branch_metric, sat_add


def _acs_kernel(steps_ref, init_ref, bt_ref, s0_ref, s1_ref, dec_ref,
                metrics_ref):
    """Forward ACS over one (batch_tile, time_chunk) block.

    steps_ref: VMEM (1, B) int32 - per-lane trellis step counts (even).
    init_ref: VMEM (1, B) int32 - 1 = exact init (state 0 biased, the
        reference's frame start, viterbi.cpp:71-78); 0 = uniform init
        (all 63: a block-overlap warm-up lane starting mid-trellis).
    bt_ref: VMEM (64, 1) branch table [e0 x32; e1 x32], metric dtype.
    s0_ref/s1_ref: VMEM (TIME_CHUNK, B) soft symbol pairs, metric dtype.
    dec_ref: VMEM out (TIME_CHUNK, 64, B) int8 decision bits.
    metrics_ref: VMEM scratch (64, B), persists across time chunks.

    The metric dtype (int32 / int16 / uint8) is the precision the u8-
    semantics arithmetic is carried in; narrower dtypes pack more lanes
    per VPU register (the reference's own SSE kernel packs 16 u8 lanes
    per 128-bit register, viterbi.cpp:208-459). All variants are
    bit-exact: values never exceed u8 range by construction (saturation
    at 255, renorm at 210), and the uint8 variant emulates the
    saturating add / rounded average with wrap-detection, exactly like
    _mm_adds_epu8 / _mm_avg_epu8.
    """
    dt = metrics_ref.dtype
    t_chunk = pl.program_id(1)

    @pl.when(t_chunk == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, metrics_ref.shape, 0)
        exact = init_ref[0, :][None, :]
        metrics_ref[:] = jnp.where((row == 0) & (exact == 1),
                                   jnp.zeros((), dt), jnp.full((), 63, dt))

    e = bt_ref[:]                            # (64, 1): e0 rows then e1 rows
    e0 = e[:32]                              # (32, 1)
    e1 = e[32:]
    steps = steps_ref[0, :][None, :]         # (1, B)
    base = t_chunk * TIME_CHUNK

    branch_metric, sat_add = _metric_ops(dt)

    def step(m, s0, s1, i):
        """One ACS trellis step on register-resident metrics m (64, B)."""
        a = jnp.where(e0 == 1, (255 - s0).astype(dt), s0)  # (32, B)
        b = jnp.where(e1 == 1, (255 - s1).astype(dt), s1)
        t = branch_metric(a, b)              # 0..63
        tc = (63 - t).astype(dt)

        lo = m[:32, :]
        hi = m[32:, :]
        m_even_lo = sat_add(lo, t)
        m_even_hi = sat_add(hi, tc)
        m_odd_lo = sat_add(lo, tc)
        m_odd_hi = sat_add(hi, t)

        new_even = jnp.minimum(m_even_lo, m_even_hi)
        dec_even = (m_even_hi <= m_even_lo).astype(jnp.int8)
        new_odd = jnp.minimum(m_odd_lo, m_odd_hi)
        dec_odd = (m_odd_hi <= m_odd_lo).astype(jnp.int8)

        bsz = m.shape[1]
        new = jnp.stack([new_even, new_odd], axis=1).reshape(64, bsz)
        # decisions are stored in BUTTERFLY order [even states; odd
        # states] - a vreg-aligned concat instead of a sublane
        # interleave (the metric interleave above is the step's real
        # shuffle cost; sparing dec's shaves ~10% off the ACS). The
        # chainback compensates by reading row (s>>1) | ((s&1)<<5).
        dec = jnp.concatenate([dec_even, dec_odd], axis=0)

        # renorm-at-210 (viterbi.cpp:314-332); the state-min comes from a
        # pairwise minimum tree (Mosaic has no sub-32-bit reductions, and
        # the tree is cheaper than a native reduce regardless)
        minv = new
        while minv.shape[0] > 1:
            half = minv.shape[0] // 2
            minv = jnp.minimum(minv[:half], minv[half:])
        need = new[0:1, :] > 210
        new = jnp.where(need, new - minv, new)

        live = (base + i) < steps            # (1, B); steps beyond a lane's
        dec_ref[i] = jnp.where(live, dec, 0)  # trellis are zero-filled
        # metrics past a lane's trellis end are never read again (its
        # decisions are masked to zero above), so no freeze is needed
        return new

    # The metrics are CARRIED THROUGH THE LOOP as a value (registers),
    # not round-tripped through VMEM every step - the store->load
    # dependency through scratch memory serializes the whole trellis on
    # memory latency. 8 steps per iteration so the symbol block load is
    # an aligned (8, B) sublane-tile slice and the per-step row extract
    # a STATIC sublane pick (a dynamic sublane index per step forces a
    # relayout).
    def body(blk, m):
        s0_blk = s0_ref[pl.ds(blk * _SUB, _SUB), :]   # (8, B)
        s1_blk = s1_ref[pl.ds(blk * _SUB, _SUB), :]
        for k in range(_SUB):
            m = step(m, s0_blk[k:k + 1, :], s1_blk[k:k + 1, :],
                     blk * _SUB + k)
        return m

    metrics_ref[:] = jax.lax.fori_loop(0, TIME_CHUNK // _SUB, body,
                                       metrics_ref[:])


def _chainback_kernel(dec_ref, out_ref, state_ref):
    """Survivor chainback over one time chunk, walked newest-to-oldest.

    dec_ref: VMEM (TIME_CHUNK, 64, B) int8 decisions (time-reversed grid)
        in BUTTERFLY row order: natural state s lives at row
        (s >> 1) | ((s & 1) << 5) (see _acs_kernel).
    out_ref: VMEM (TIME_CHUNK, B) int32 - decision bit read at each step.
    state_ref: VMEM scratch (1, B) int32 survivor state, persists.
    """
    @pl.when(pl.program_id(1) == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    # 8 steps per iteration so the out store is one aligned (8, B)
    # sublane-tile write instead of a dynamic per-step sublane store; the
    # survivor state is carried through the loop in registers
    def body(j, state):
        blk = TIME_CHUNK // _SUB - 1 - j
        bits = []
        for k in range(_SUB - 1, -1, -1):
            dec = dec_ref[blk * _SUB + k].astype(jnp.int32)   # (64, B)
            row = jax.lax.broadcasted_iota(jnp.int32, dec.shape, 0)
            # butterfly row order: natural state s -> row (s>>1)|((s&1)<<5)
            srow = (state >> 1) | ((state & 1) << 5)
            bit = jnp.sum(jnp.where(row == srow, dec, 0), axis=0,
                          keepdims=True).astype(jnp.int32)
            bits.append(bit)
            state = (state >> 1) | (bit << 5)
        out_ref[pl.ds(blk * _SUB, _SUB), :] = jnp.concatenate(
            bits[::-1], axis=0)
        return state

    state_ref[:] = jax.lax.fori_loop(0, TIME_CHUNK // _SUB, body,
                                     state_ref[:])


def _acs_kernel_r4(steps_ref, init_ref, bt_ref, s0_ref, s1_ref, dec_ref,
                   metrics_ref):
    """Radix-4 forward ACS: two trellis steps fused per iteration.

    Same contract as _acs_kernel except bt_ref is the (128, 1) radix-4
    branch table (_branch_cols_r4) and dec_ref is (TIME_CHUNK // 2, 64, B)
    int8 carrying TWO decision bits per fused entry: v = (d2 << 1) | d1,
    where d2 = the second sub-step's hi-predecessor-won bit at the output
    state and d1 = the winning mid state's own first sub-step decision
    (equal to the sequential kernel's per-step decision at that mid by
    construction: the 4-way path min factors through the 2-way mid min).
    Decision rows are in BLOCK order: output state 4q+i lives at row
    i*16 + q, i.e. natural state n at row ((n & 3) << 4) | (n >> 2).

    Why radix 4: the fused step reads the old metrics as four ALIGNED
    16-sublane quarters (free), computes all mid metrics as four (16, B)
    blocks with the intermediate renorm replicated exactly, and pays the
    natural-order sublane interleave once per TWO steps — the interleave
    was ~40% of radix-2 ACS cost (docs/NOTES_r4.md). Bit-exact with the
    sequential kernel at every step (same sat-add order, same hi-wins tie
    rule, same renorm-at-210 on the intermediate and final metrics).
    """
    dt = metrics_ref.dtype
    t_chunk = pl.program_id(1)

    @pl.when(t_chunk == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, metrics_ref.shape, 0)
        exact = init_ref[0, :][None, :]
        metrics_ref[:] = jnp.where((row == 0) & (exact == 1),
                                   jnp.zeros((), dt), jnp.full((), 63, dt))

    e = bt_ref[:]                            # (128, 1), see _branch_cols_r4
    e0, e1 = e[:32], e[32:64]
    e0e, e0o = e[64:80], e[80:96]
    e1e, e1o = e[96:112], e[112:128]
    steps = steps_ref[0, :][None, :]         # (1, B)
    base = t_chunk * TIME_CHUNK
    branch_metric, sat_add = _metric_ops(dt)

    def renorm(blocks, zero_blk):
        """Subtract the all-state min from every block when the state-0
        metric (blocks[zero_blk][0]) exceeds 210 (viterbi.cpp:314-332)."""
        minv = blocks[0]
        for blk in blocks[1:]:
            minv = jnp.minimum(minv, blk)
        while minv.shape[0] > 1:
            half = minv.shape[0] // 2
            minv = jnp.minimum(minv[:half], minv[half:])
        need = blocks[zero_blk][0:1, :] > 210
        return [jnp.where(need, blk - minv, blk) for blk in blocks]

    def step2(m, s0a, s1a, s0b, s1b, i):
        """Two fused ACS steps on natural-order metrics m (64, B).

        Returns (new_metrics (64, B) natural order, dec (64, B) int8 in
        block row order with v = (d2 << 1) | d1)."""
        # --- sub-step A: all 64 mid metrics as four (16, B) blocks ------
        aA = jnp.where(e0 == 1, (255 - s0a).astype(dt), s0a)   # (32, B)
        bA = jnp.where(e1 == 1, (255 - s1a).astype(dt), s1a)
        tA = branch_metric(aA, bA)
        tAc = (63 - tA).astype(dt)
        tAl, tAh = tA[:16], tA[16:]          # butterflies q / q+16
        tAcl, tAch = tAc[:16], tAc[16:]
        q0, q1, q2, q3 = m[0:16], m[16:32], m[32:48], m[48:64]
        # mid state 2q + b1 + 32*k1: preds q+16*k1 (lo, bm = tA at
        # butterfly q+16*k1 XOR b1) and q+16*k1+32 (hi, complementary)
        a00, b00 = sat_add(q0, tAl), sat_add(q2, tAcl)
        a01, b01 = sat_add(q0, tAcl), sat_add(q2, tAl)
        a10, b10 = sat_add(q1, tAh), sat_add(q3, tAch)
        a11, b11 = sat_add(q1, tAch), sat_add(q3, tAh)
        m00, d00 = jnp.minimum(a00, b00), (b00 <= a00)
        m01, d01 = jnp.minimum(a01, b01), (b01 <= a01)
        m10, d10 = jnp.minimum(a10, b10), (b10 <= a10)
        m11, d11 = jnp.minimum(a11, b11), (b11 <= a11)
        # intermediate renorm: state 0 at time t+1 is m00[q=0]
        m00, m01, m10, m11 = renorm([m00, m01, m10, m11], 0)

        # --- sub-step B: new state 4q + 2*b1 + b0 from mids 2q+b1 (lo,
        # block m0{b1}) and 2q+b1+32 (hi, block m1{b1}); branch tables at
        # butterflies 2q (even) / 2q+1 (odd), pre-gathered on the host --
        aBe = jnp.where(e0e == 1, (255 - s0b).astype(dt), s0b)  # (16, B)
        bBe = jnp.where(e1e == 1, (255 - s1b).astype(dt), s1b)
        aBo = jnp.where(e0o == 1, (255 - s0b).astype(dt), s0b)
        bBo = jnp.where(e1o == 1, (255 - s1b).astype(dt), s1b)
        tE = branch_metric(aBe, bBe)
        tO = branch_metric(aBo, bBo)
        tEc = (63 - tE).astype(dt)
        tOc = (63 - tO).astype(dt)
        a0, b0 = sat_add(m00, tE), sat_add(m10, tEc)
        a1, b1_ = sat_add(m00, tEc), sat_add(m10, tE)
        a2, b2 = sat_add(m01, tO), sat_add(m11, tOc)
        a3, b3 = sat_add(m01, tOc), sat_add(m11, tO)
        n0, s0_ = jnp.minimum(a0, b0), (b0 <= a0)
        n1, s1_d = jnp.minimum(a1, b1_), (b1_ <= a1)
        n2, s2_ = jnp.minimum(a2, b2), (b2 <= a2)
        n3, s3_ = jnp.minimum(a3, b3), (b3 <= a3)
        n0, n1, n2, n3 = renorm([n0, n1, n2, n3], 0)

        # fused decision v = (d2 << 1) | d1: d2 = which mid won, d1 = the
        # winning mid's own sub-step-A decision. Packed in int32 (Mosaic
        # has no i8 vector arithmetic) and truncated to int8 at the store.
        def pack(dsel, dh, dl):
            d2 = dsel.astype(jnp.int32)
            d1 = jnp.where(dsel, dh.astype(jnp.int32),
                           dl.astype(jnp.int32))
            return (d2 * 2 + d1).astype(jnp.int8)
        dec = jnp.concatenate([
            pack(s0_, d10, d00), pack(s1_d, d10, d00),
            pack(s2_, d11, d01), pack(s3_, d11, d01),
        ], axis=0)                           # (64, B), row i*16 + q

        live = (base + i) < steps            # one mask per fused pair:
        dec = jnp.where(live, dec, 0)        # steps_vec is even
        bsz = m.shape[1]
        new = jnp.stack([n0, n1, n2, n3], axis=1).reshape(64, bsz)
        return new, dec

    def body(blk, m):
        s0_blk = s0_ref[pl.ds(blk * _SUB, _SUB), :]   # (8, B)
        s1_blk = s1_ref[pl.ds(blk * _SUB, _SUB), :]
        for u in range(_SUB // 2):
            i0, i1 = 2 * u, 2 * u + 1
            m, dec = step2(m, s0_blk[i0:i0 + 1, :], s1_blk[i0:i0 + 1, :],
                           s0_blk[i1:i1 + 1, :], s1_blk[i1:i1 + 1, :],
                           blk * _SUB + i0)
            dec_ref[blk * (_SUB // 2) + u] = dec
        return m

    metrics_ref[:] = jax.lax.fori_loop(0, TIME_CHUNK // _SUB, body,
                                       metrics_ref[:])


def _chainback_kernel_r4(dec_ref, out_ref, state_ref):
    """Survivor chainback over radix-4 fused decisions: ONE one-hot gather
    per TWO trellis steps (the fused entry carries both bits).

    dec_ref: VMEM (TIME_CHUNK // 2, 64, B) int8 fused decisions
        (time-reversed grid) in BLOCK row order: natural state n lives at
        row ((n & 3) << 4) | (n >> 2) (see _acs_kernel_r4).
    out_ref: VMEM (TIME_CHUNK, B) int32 - per-trellis-step decision bits.
    state_ref: VMEM scratch (1, B) int32 survivor state, persists.
    """
    @pl.when(pl.program_id(1) == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    def body(j, state):
        blk = TIME_CHUNK // _SUB - 1 - j
        bits = []
        for k in range(_SUB // 2 - 1, -1, -1):
            dec = dec_ref[blk * (_SUB // 2) + k].astype(jnp.int32)  # (64,B)
            row = jax.lax.broadcasted_iota(jnp.int32, dec.shape, 0)
            srow = ((state & 3) << 4) | (state >> 2)
            v = jnp.sum(jnp.where(row == srow, dec, 0), axis=0,
                        keepdims=True).astype(jnp.int32)
            d2 = v >> 1                       # trellis step blk*_SUB+2k+1
            bits.append(d2)
            state = (state >> 1) | (d2 << 5)
            d1 = v & 1                        # trellis step blk*_SUB+2k
            bits.append(d1)
            state = (state >> 1) | (d1 << 5)
        out_ref[pl.ds(blk * _SUB, _SUB), :] = jnp.concatenate(
            bits[::-1], axis=0)
        return state

    state_ref[:] = jax.lax.fori_loop(0, TIME_CHUNK // _SUB, body,
                                     state_ref[:])


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(jax.jit,
                   static_argnames=("nbits", "interpret", "metric_dtype",
                                    "radix"))
def _decode_tiles(s0: jnp.ndarray, s1: jnp.ndarray, steps_vec: jnp.ndarray,
                  init_vec: jnp.ndarray, nbits: int,
                  interpret: bool = False,
                  metric_dtype: str = "int32",
                  radix: int = 2) -> jnp.ndarray:
    """Decode (B, T_pad) soft pairs -> (B, nbits) bits. B, T_pad pre-padded.

    steps_vec: (B,) int32 per-frame even trellis-step counts.
    init_vec: (B,) int32 - 1 = exact frame-start metric init, 0 = uniform
    (block-overlap warm-up lanes).
    metric_dtype: ACS metric carrier precision (METRIC_DTYPES) - all
    bit-exact, narrower packs more VPU lanes (see _acs_kernel).
    radix: 2 = one trellis step per ACS iteration, 4 = two steps fused
    (_acs_kernel_r4; bit-exact, fewer sublane shuffles).
    """
    bsz, t_pad = s0.shape
    n_bt = bsz // BATCH_TILE
    n_tc = t_pad // TIME_CHUNK
    mdt = jnp.dtype(metric_dtype)
    if radix == 4:
        acs, chainback = _acs_kernel_r4, _chainback_kernel_r4
        bt = _branch_cols_r4(metric_dtype)
        dec_steps, dec_chunk = t_pad // 2, TIME_CHUNK // 2
    else:
        acs, chainback = _acs_kernel, _chainback_kernel
        bt = _branch_cols(metric_dtype)
        dec_steps, dec_chunk = t_pad, TIME_CHUNK

    s0 = s0.T.astype(mdt)  # (T_pad, B): time on sublanes, frames on lanes
    s1 = s1.T.astype(mdt)

    dec = pl.pallas_call(
        acs,
        grid=(n_bt, n_tc),
        in_specs=[
            pl.BlockSpec((1, BATCH_TILE), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BATCH_TILE), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt.shape[0], 1), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TIME_CHUNK, BATCH_TILE), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TIME_CHUNK, BATCH_TILE), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (dec_chunk, NUMSTATES, BATCH_TILE), lambda b, t: (t, 0, b),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dec_steps, NUMSTATES, bsz),
                                       jnp.int8),
        scratch_shapes=[pltpu.VMEM((NUMSTATES, BATCH_TILE), mdt)],
        interpret=interpret,
    )(steps_vec[None, :], init_vec[None, :], jnp.asarray(bt), s0, s1)

    ks = pl.pallas_call(
        chainback,
        grid=(n_bt, n_tc),
        in_specs=[
            pl.BlockSpec((dec_chunk, NUMSTATES, BATCH_TILE),
                         lambda b, t: (pl.num_programs(1) - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TIME_CHUNK, BATCH_TILE),
            lambda b, t: (pl.num_programs(1) - 1 - t, b),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, bsz), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, BATCH_TILE), jnp.int32)],
        interpret=interpret,
    )(dec)

    # decoded bit n is the decision bit read at trellis step n + 6
    return ks[K - 1: K - 1 + nbits, :].T  # (B, nbits)


def _viterbi_decode_impl(soft: jnp.ndarray, steps_vec: jnp.ndarray,
                         nbits: int, interpret: bool = False,
                         metric_dtype: str = "int32",
                         radix: int = 2) -> jnp.ndarray:
    """soft (..., 2*(nbits+6)), steps_vec (...,) -> bits (..., nbits)."""
    soft = jnp.asarray(soft, jnp.int32)
    batch_shape = soft.shape[:-1]
    total_steps = nbits + (K - 1)

    flat = soft.reshape(-1, soft.shape[-1])
    bsz = flat.shape[0]
    b_pad = _cdiv(max(bsz, 1), BATCH_TILE) * BATCH_TILE
    t_pad = _cdiv(total_steps, TIME_CHUNK) * TIME_CHUNK

    pairs = jnp.zeros((b_pad, 2 * t_pad), jnp.int32)
    pairs = pairs.at[:bsz, : soft.shape[-1]].set(flat)
    s0 = pairs[:, 0::2]
    s1 = pairs[:, 1::2]

    sv = jnp.zeros((b_pad,), jnp.int32)
    sv = sv.at[:bsz].set(steps_vec.reshape(-1))
    iv = jnp.ones((b_pad,), jnp.int32)  # standalone frames: exact init

    bits = _decode_tiles(s0, s1, sv, iv, nbits, interpret=interpret,
                         metric_dtype=metric_dtype, radix=radix)
    return bits[:bsz].reshape(*batch_shape, nbits)


@functools.lru_cache(maxsize=None)
def _decoder(nbits: int, interpret: bool, metric_dtype: str = "int32",
             radix: int = 2):
    """custom_vmap'd decoder for one static (nbits, interpret) config.

    The impl natively handles arbitrary leading batch dims by flattening
    them into the kernel's lane tile, so every vmap level (frames,
    channels, ...) should collapse into that flat batch instead of going
    through Pallas's default vmap rule (which would add grid dimensions
    with mostly-empty 128-lane tiles).
    """
    @jax.custom_batching.custom_vmap
    def f(soft, steps_vec):
        return _viterbi_decode_impl(soft, steps_vec, nbits, interpret,
                                    metric_dtype, radix)

    @f.def_vmap
    def _rule(axis_size, in_batched, soft, steps_vec):
        sb, vb = in_batched
        if not sb:
            soft = jnp.broadcast_to(soft[None], (axis_size,) + soft.shape)
        if not vb:
            steps_vec = jnp.broadcast_to(
                steps_vec[None], (axis_size,) + steps_vec.shape)
        return f(soft, steps_vec), True

    return f


def _blocked_decode_impl(soft: jnp.ndarray, steps_vec: jnp.ndarray,
                         nbits: int, n_blocks: int, warmup: int,
                         interpret: bool, return_merge_ok: bool = False,
                         metric_dtype: str = "int32", radix: int = 2):
    """Time-parallel block-overlap decode (SURVEY.md section 7 hard part #1).

    The trellis is split into n_blocks time blocks mapped onto the
    kernel's 128-lane batch axis; each block decodes its span plus a
    `warmup`-step lead-in (uniform metric init - the path metrics merge to
    the true survivor within ~5K constraint lengths) and a `warmup`-step
    tail (truncated chainback from an arbitrary state merges the same
    way). Block 0 keeps the exact frame-start init; the last live block
    inherits the exact end-of-frame chainback (zero-shifted state 0 at
    its live edge, the reference's contract, viterbi.cpp:108-146). Single-
    frame latency drops ~n_blocks-fold at 2*warmup/(span) extra compute.

    Splice exactness is guarded, not assumed: around every block cut the
    2*warmup-step region [b*tb - wf, b*tb + wc) is decoded independently
    by both adjacent blocks (block b-1's span end + truncation tail,
    block b's lead-in + span start), and with return_merge_ok=True the
    per-frame agreement over all cut regions is returned. A forward
    (warm-up) merge failure corrupts a block's lead-in; a reverse
    (truncated-chainback) merge failure corrupts a block's tail - both
    land inside a compared region, so a single-block merge failure flags
    the frame unless its neighbor independently fails onto identical
    wrong bits across the 2*warmup-bit window (vanishing at the
    production warmup=128; constructible only at degenerate warmups).
    Callers (runtime/chain.py) re-decode flagged frames with the exact
    sequential kernel, restoring a bit-exact end-to-end contract.
    Measured flag rate at working SNRs: 0 in 3.1 Mbit adversarial sweep
    (tools/viterbi_blocked_ab.py, docs/NOTES_r3.md).
    """
    soft = jnp.asarray(soft, jnp.int32)
    batch_shape = soft.shape[:-1]
    flat = soft.reshape(-1, soft.shape[-1])
    nf = flat.shape[0]
    total_steps = nbits + (K - 1)
    tb = _cdiv(total_steps, 2 * n_blocks) * 2     # even block span
    wf = _cdiv(warmup, 2) * 2
    wc = wf
    win = wf + tb + wc                            # window trellis steps
    # emit the FULL window (lead-in + span + tail): the tail bits cost
    # nothing (the chainback computes every window step anyway) and give
    # the merge guard a 2*warmup-wide doubly-decoded region at each cut
    nbits_win = win

    # per-block window offsets into the trellis (block 0 starts exact)
    offs = np.maximum(0, np.arange(n_blocks) * tb - wf).astype(np.int32)
    flat_pad = jnp.pad(flat, ((0, 0), (0, 2 * win)))
    wins = jnp.stack([
        jax.lax.dynamic_slice_in_dim(flat_pad, 2 * int(o), 2 * win, axis=1)
        for o in offs], axis=1)                   # (F, n_blocks, 2*win)

    steps_w = jnp.clip(steps_vec.reshape(-1)[:, None] - offs[None, :],
                       0, win)                    # (F, n_blocks) even
    init_w = jnp.zeros((nf, n_blocks), jnp.int32).at[:, 0].set(1)

    # flatten (frame, block) onto the kernel batch axis
    bsz = nf * n_blocks
    b_pad = _cdiv(max(bsz, 1), BATCH_TILE) * BATCH_TILE
    # + (K-1): the decoded-bit slice for nbits_win = win reads K-1 steps
    # past the window (dead, zero-decision steps)
    t_pad = _cdiv(win + (K - 1), TIME_CHUNK) * TIME_CHUNK
    pairs = jnp.zeros((b_pad, 2 * t_pad), jnp.int32)
    pairs = pairs.at[:bsz, : 2 * win].set(wins.reshape(bsz, 2 * win))
    sv = jnp.zeros((b_pad,), jnp.int32).at[:bsz].set(steps_w.reshape(-1))
    iv = jnp.zeros((b_pad,), jnp.int32).at[:bsz].set(init_w.reshape(-1))

    bits = _decode_tiles(pairs[:, 0::2], pairs[:, 1::2], sv, iv,
                         nbits_win, interpret=interpret,
                         metric_dtype=metric_dtype, radix=radix)
    bits = bits[:bsz].reshape(nf, n_blocks, nbits_win)

    # splice: frame bit n lives in block b = n // tb at local index
    # n - b*tb (+wf lead for blocks after the first)
    n_idx = np.arange(nbits)
    b_idx = (n_idx // tb).astype(np.int32)
    m_idx = (n_idx - b_idx * tb + np.where(b_idx > 0, wf, 0)).astype(np.int32)
    out = bits[:, b_idx, m_idx].reshape(*batch_shape, nbits)
    if not return_merge_ok:
        return out

    # merge guard: compare the two independent decodes of the
    # doubly-decoded region around every cut, [b*tb - wf, b*tb + wc)
    # (block b-1's span end + truncation tail vs block b's lead-in +
    # span start). The outermost `trim` bits on each side are each
    # block's by-construction-unreliable margins (block b's first bits
    # sit right after its uniform metric init; block b-1's last bits are
    # its chainback truncation start, garbage until the backward merge
    # settles, typically within ~5K = 35 steps) — comparing them would
    # flag healthy frames constantly, so they are excluded. Masked to
    # each frame's real bit extent.
    ov = wf + wc
    trim = min(_GUARD_TRIM, ov // 4)
    nb_f = jnp.maximum(steps_vec.reshape(-1) - (K - 1), 0)  # real data bits
    live_hi = jnp.minimum(nb_f, nbits)[:, None]
    mism = jnp.zeros((nf,), bool)
    for b in range(1, n_blocks):
        lo = b * tb - wf                       # overlap start (trellis bit)
        prev_start = lo - int(offs[b - 1])     # local index in block b-1
        sl = slice(trim, ov - trim)
        prev = bits[:, b - 1, prev_start:prev_start + ov][:, sl]
        cur = bits[:, b, :ov][:, sl]
        live = (lo + np.arange(ov)[sl])[None, :] < live_hi
        mism = mism | jnp.any((prev != cur) & live, axis=-1)
    return out, (~mism).reshape(batch_shape)


@functools.lru_cache(maxsize=None)
def _blocked_decoder(nbits: int, n_blocks: int, warmup: int,
                     interpret: bool, guarded: bool = False,
                     metric_dtype: str = "int32", radix: int = 2):
    """custom_vmap'd blocked decoder (same batch-collapse rule as
    _decoder: every vmap level flattens into the kernel lane tile).
    guarded=True also returns the per-frame merge-agreement flag."""
    @jax.custom_batching.custom_vmap
    def f(soft, steps_vec):
        return _blocked_decode_impl(soft, steps_vec, nbits, n_blocks,
                                    warmup, interpret,
                                    return_merge_ok=guarded,
                                    metric_dtype=metric_dtype, radix=radix)

    @f.def_vmap
    def _rule(axis_size, in_batched, soft, steps_vec):
        sb, vb = in_batched
        if not sb:
            soft = jnp.broadcast_to(soft[None], (axis_size,) + soft.shape)
        if not vb:
            steps_vec = jnp.broadcast_to(
                steps_vec[None], (axis_size,) + steps_vec.shape)
        return f(soft, steps_vec), ((True, True) if guarded else True)

    return f


def _resolve_radix(radix: int | None, default: int = DEFAULT_RADIX) -> int:
    """Resolve a radix argument: explicit > FUN_OFDM_VITERBI_RADIX env >
    the kernel's default (A/B escape hatch, same pattern as
    FUN_OFDM_VITERBI)."""
    if radix is not None:
        return int(radix)
    import os
    env = os.environ.get("FUN_OFDM_VITERBI_RADIX")
    return int(env) if env else default


def viterbi_decode_pallas_blocked(soft: jnp.ndarray, nbits: int,
                                  n_blocks: int = 16, warmup: int = 128,
                                  interpret: bool = False,
                                  nbits_dynamic: jnp.ndarray | None = None,
                                  return_merge_ok: bool = False,
                                  metric_dtype: str | None = None,
                                  radix: int | None = None):
    """Block-overlap time-parallel variant of viterbi_decode_pallas.

    Same contract (soft (..., 2*(nbits+6)) -> (..., nbits) bits), but the
    trellis time axis is decoded in n_blocks parallel lanes with
    warmup-step overlap regions, cutting single-frame latency ~n_blocks x.
    Use for small-batch / long-frame (the streaming chain's operating
    point); the plain kernel is cheaper at large batch (no overlap
    overhead).

    return_merge_ok=True additionally returns a (...,) bool per-frame flag
    that is False whenever adjacent blocks disagree on any overlap span -
    the signature of a survivor-merge failure. A frame with
    merge_ok=False must be re-decoded with the exact kernel to preserve
    bit-exactness (the streaming chain does this automatically); frames
    with merge_ok=True are exact unless two adjacent blocks independently
    failed onto identical wrong bits (see _blocked_decode_impl).
    """
    soft = jnp.asarray(soft, jnp.int32)
    if nbits_dynamic is None:
        nb = jnp.full(soft.shape[:-1], nbits, jnp.int32)
    else:
        nb = jnp.broadcast_to(jnp.asarray(nbits_dynamic, jnp.int32),
                              soft.shape[:-1])
    steps_vec = ((nb + (K - 1)) // 2) * 2
    total_steps = nbits + (K - 1)
    n_blocks = max(1, min(n_blocks, total_steps // max(2 * warmup, 2)))
    fn = _blocked_decoder(nbits, n_blocks, warmup, interpret,
                          guarded=return_merge_ok,
                          metric_dtype=metric_dtype or DEFAULT_METRIC_DTYPE,
                          radix=_resolve_radix(radix, DEFAULT_RADIX_BLOCKED))
    return fn(soft, steps_vec)


def viterbi_decode_pallas(soft: jnp.ndarray, nbits: int,
                          interpret: bool = False,
                          nbits_dynamic: jnp.ndarray | None = None,
                          metric_dtype: str | None = None,
                          radix: int | None = None
                          ) -> jnp.ndarray:
    """Drop-in Pallas replacement for ops.viterbi.viterbi_decode.

    soft:  (..., 2*(nbits+6)) int soft coded bits (0..255; >=128 leans 1).
    nbits: number of data bits to output (static upper bound).
    nbits_dynamic: optional traced (...,) per-element bit counts <= nbits
           (see ops.viterbi.viterbi_decode).
    metric_dtype: ACS metric carrier precision (METRIC_DTYPES); None =
           DEFAULT_METRIC_DTYPE. All choices are bit-exact.
    Returns (..., nbits) int32 decoded bits, bit-exact with the scan path.
    """
    soft = jnp.asarray(soft, jnp.int32)
    if nbits_dynamic is None:
        nb = jnp.full(soft.shape[:-1], nbits, jnp.int32)
    else:
        nb = jnp.broadcast_to(jnp.asarray(nbits_dynamic, jnp.int32),
                              soft.shape[:-1])
    steps_vec = ((nb + (K - 1)) // 2) * 2
    return _decoder(nbits, interpret,
                    metric_dtype or DEFAULT_METRIC_DTYPE,
                    _resolve_radix(radix))(soft, steps_vec)
