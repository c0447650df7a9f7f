"""Header-driven dynamic-rate/length receive.

The reference receiver learns each frame's (rate, length) from its SIGNAL
header at runtime (src/frame_decoder.cpp:72-88); these tests cover the
TPU-native equivalent: per-frame dynamic lengths via masked Viterbi
trellises, right-aligned dynamic CRC, and the full detect -> header ->
payload path. Dynamic decodes must be bit-identical to the static decode
specialized at each frame's true length.
"""

import zlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fun_ofdm_tpu import Rate
from fun_ofdm_tpu.models import frontend, ppdu, rx, tx
from fun_ofdm_tpu.ops import convcode, crc32, viterbi, viterbi_pallas
from fun_ofdm_tpu.rates import params_for


def test_crc32_dynamic_matches_zlib():
    rng = np.random.default_rng(0)
    n_max = 96
    data = rng.integers(0, 256, (6, n_max), dtype=np.uint8)
    n_valid = np.array([1, 5, 40, 96, 96, 17], np.int32)
    got = np.asarray(jax.jit(crc32.crc32_dynamic)(
        jnp.asarray(data), jnp.asarray(n_valid)))
    want = np.array([zlib.crc32(bytes(d[:n])) for d, n in zip(data, n_valid)],
                    np.uint32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("impl", ["scan", "pallas"])
def test_viterbi_dynamic_matches_per_length_static(impl):
    """Masked trellis == per-element static decode at each length."""
    rng = np.random.default_rng(1)
    nbits_max = 120
    lengths = np.array([120, 37, 80, 5], np.int32)
    bits = rng.integers(0, 2, size=(4, nbits_max + 6))
    coded = np.asarray(convcode.conv_encode(jnp.asarray(bits)))
    soft = np.clip(coded * 255 + rng.integers(-120, 120, coded.shape), 0, 255)
    soft_j = jnp.asarray(soft)

    if impl == "pallas":
        got = np.asarray(viterbi_pallas.viterbi_decode_pallas(
            soft_j, nbits_max, interpret=True,
            nbits_dynamic=jnp.asarray(lengths)))
    else:
        got = np.asarray(viterbi.viterbi_decode_scan(
            soft_j, nbits_max, nbits_dynamic=jnp.asarray(lengths)))

    for i, nb in enumerate(lengths):
        # static decode of the same row truncated to its real trellis
        want = np.asarray(viterbi.viterbi_decode_scan(
            soft_j[i, : 2 * (nb + 6)], int(nb)))
        np.testing.assert_array_equal(got[i, :nb], want, err_msg=f"row {i}")


@pytest.mark.parametrize("rate", [Rate.RATE_1_2_BPSK, Rate.RATE_3_4_QAM16])
def test_decode_data_dynamic_matches_static(rate):
    """Dynamic decode == static decode specialized per length."""
    rng = np.random.default_rng(2)
    max_len = 64
    rp = params_for(rate)
    nsym_max = rp.num_symbols(max_len)
    for length in (1, 23, 64):
        payload = rng.integers(0, 256, length, dtype=np.uint8)
        sam = ppdu.encode(jnp.asarray(payload), rate)
        data = sam[48:]  # drop header symbol samples
        # pad data-subcarrier samples to the max-geometry with garbage
        pad = (rng.standard_normal(nsym_max * 48 - data.shape[-1])
               + 1j * rng.standard_normal(nsym_max * 48 - data.shape[-1]))
        full = jnp.concatenate([data, jnp.asarray(pad, data.dtype)])
        got_p, got_ok, got_srv = ppdu.decode_data_dynamic_p(
            (jnp.real(full), jnp.imag(full)), rate,
            jnp.asarray(length), max_len)
        want_p, want_ok, want_srv = ppdu.decode_data(data, rate, length)
        assert bool(got_ok) and bool(want_ok)
        np.testing.assert_array_equal(
            np.asarray(got_p)[:length], np.asarray(want_p))
        assert int(got_srv) == int(want_srv)


def test_receive_capture_dynamic_mixed_lengths():
    rate = Rate.RATE_1_2_QPSK
    max_len = 120
    rng = np.random.default_rng(3)
    lens = [120, 3, 57]
    stream = np.zeros(8000, np.complex64)
    pos, positions, payloads = 90, [], []
    for L in lens:
        p = rng.integers(0, 256, L, dtype=np.uint8)
        f = np.asarray(tx.build_frame(jnp.asarray(p), rate))
        stream[pos:pos + len(f)] = f
        positions.append(pos)
        payloads.append(p)
        pos += len(f) + 300
    out = frontend.receive_capture_dynamic_p(
        (jnp.asarray(stream.real), jnp.asarray(stream.imag)),
        rate, max_len, max_frames=5)
    for k, (p0, p) in enumerate(zip(positions, payloads)):
        assert int(np.asarray(out["starts"])[k]) == p0
        assert bool(np.asarray(out["crc_ok"])[k])
        assert int(np.asarray(out["hdr_length"])[k]) == len(p)
        np.testing.assert_array_equal(
            np.asarray(out["payload"])[k, :len(p)], p)
    assert not np.asarray(out["crc_ok"])[len(lens):].any()


def test_dynamic_rejects_other_rate():
    """A frame at a different rate reports its header, crc_ok=False."""
    rng = np.random.default_rng(4)
    payload = rng.integers(0, 256, 40, dtype=np.uint8)
    frame = np.asarray(tx.build_frame(jnp.asarray(payload),
                                      Rate.RATE_3_4_QAM16))
    stream = np.zeros(3000, np.complex64)
    stream[100:100 + len(frame)] = frame
    out = frontend.receive_capture_dynamic_p(
        (jnp.asarray(stream.real), jnp.asarray(stream.imag)),
        Rate.RATE_1_2_BPSK, 64, max_frames=2)
    assert bool(np.asarray(out["header_ok"])[0])
    assert int(np.asarray(out["hdr_length"])[0]) == 40
    assert int(np.asarray(out["rate_field"])[0]) == 0xB  # 3/4-QAM16
    assert not np.asarray(out["crc_ok"])[0]


def test_decode_headers_only():
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 256, 25, dtype=np.uint8)
    frame = np.asarray(tx.build_frame(jnp.asarray(payload),
                                      Rate.RATE_2_3_QAM64))
    stream = np.zeros(2500, np.complex64)
    stream[64:64 + len(frame)] = frame
    out = frontend.decode_headers_p(
        (jnp.asarray(stream.real), jnp.asarray(stream.imag)), max_frames=3)
    assert bool(np.asarray(out["header_ok"])[0])
    assert int(np.asarray(out["starts"])[0]) == 64
    assert int(np.asarray(out["hdr_length"])[0]) == 25
    assert int(np.asarray(out["rate_field"])[0]) == 0x1  # 2/3-QAM64
