"""Unit tests: JAX ops vs the serial NumPy golden model."""

import numpy as np
import pytest

import jax.numpy as jnp

import golden_model as gm
from fun_ofdm_tpu.ops import convcode, crc32, interleave, puncture, qam, scramble, viterbi
from fun_ofdm_tpu.rates import Rate
from fun_ofdm_tpu.utils.bits import np_bits_to_bytes, np_bytes_to_bits

RNG = np.random.default_rng(1234)


def test_crc32_matches_zlib():
    import zlib

    for n in [1, 2, 31, 32, 33, 100, 1502]:
        data = RNG.integers(0, 256, size=n, dtype=np.uint8)
        ours = int(np.asarray(crc32.crc32(jnp.asarray(data))))
        assert ours == zlib.crc32(bytes(data)), n


def test_crc32_batched():
    data = RNG.integers(0, 256, size=(5, 77), dtype=np.uint8)
    ours = np.asarray(crc32.crc32(jnp.asarray(data)))
    import zlib

    want = [zlib.crc32(bytes(row)) for row in data]
    assert list(ours) == want


def test_scramble_matches_golden_and_self_inverse():
    data = RNG.integers(0, 256, size=300, dtype=np.uint8)
    ours = np.asarray(scramble.scramble_bytes(jnp.asarray(data)))
    want = gm.scramble(data)
    np.testing.assert_array_equal(ours, want)
    back = np.asarray(scramble.descramble_bytes(jnp.asarray(ours)))
    np.testing.assert_array_equal(back, data)


@pytest.mark.parametrize("nbits", [18, 24, 96, 250])
def test_conv_encode_matches_golden(nbits):
    nbytes = (nbits + 6 + 7) // 8
    data = RNG.integers(0, 256, size=nbytes, dtype=np.uint8)
    want = gm.conv_encode(data, nbits)
    bits = np_bytes_to_bits(data)[: nbits + 6]
    ours = np.asarray(convcode.conv_encode(jnp.asarray(bits)))
    np.testing.assert_array_equal(ours, want)


@pytest.mark.parametrize("rate", list(Rate))
def test_puncture_roundtrip_and_golden(rate):
    n = 288 * 2
    data = RNG.integers(0, 2, size=n, dtype=np.uint8)
    ours = np.asarray(puncture.puncture(jnp.asarray(data), rate))
    want = gm.puncture(data, int(rate))
    np.testing.assert_array_equal(ours, want)
    soft = RNG.integers(0, 256, size=len(ours), dtype=np.uint8)
    ours_dp = np.asarray(puncture.depuncture(jnp.asarray(soft), rate))
    want_dp = gm.depuncture(soft, int(rate))
    np.testing.assert_array_equal(ours_dp, want_dp)


def test_interleave_matches_golden():
    data = RNG.integers(0, 256, size=48 * 5, dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(interleave.interleave(jnp.asarray(data))), gm.interleave(data))
    np.testing.assert_array_equal(
        np.asarray(interleave.deinterleave(jnp.asarray(data))), gm.deinterleave(data))
    rt = interleave.deinterleave(interleave.interleave(jnp.asarray(data)))
    np.testing.assert_array_equal(np.asarray(rt), data)


@pytest.mark.parametrize("rate", list(Rate))
def test_modulate_matches_golden(rate):
    bpsc = gm.RATE_INFO[int(rate)][3]
    bits = RNG.integers(0, 2, size=48 * bpsc, dtype=np.uint8)
    ours = np.asarray(qam.modulate(jnp.asarray(bits), rate, dtype=jnp.complex128))
    want = gm.modulate(bits, int(rate))
    np.testing.assert_allclose(ours, want, atol=1e-12)


@pytest.mark.parametrize("rate", list(Rate))
def test_demodulate_matches_golden(rate):
    bpsc = gm.RATE_INFO[int(rate)][3]
    bits = RNG.integers(0, 2, size=48 * bpsc, dtype=np.uint8)
    syms = gm.modulate(bits, int(rate))
    # perturb to exercise soft confidences
    noise = (RNG.normal(size=syms.shape) + 1j * RNG.normal(size=syms.shape)) * 0.05
    syms = syms + noise
    ours = np.asarray(qam.demodulate(jnp.asarray(syms, jnp.complex128), rate))
    want = gm.demodulate(syms, int(rate))
    np.testing.assert_array_equal(ours, want)


def _random_data_zero_tail(rng, nbits):
    """Random bytes whose 6 bits after position nbits are zero, so the
    encoder terminates at state 0 (the chainback's assumed end state)."""
    data = rng.integers(0, 256, size=(nbits + 6 + 7) // 8, dtype=np.uint8)
    bits = np_bytes_to_bits(data)
    bits[nbits:nbits + 6] = 0
    return np_bits_to_bytes(bits).astype(np.uint8), bits


def test_viterbi_clean_roundtrip():
    nbits = 96
    data, bits = _random_data_zero_tail(RNG, nbits)
    coded = gm.conv_encode(data, nbits)
    soft = np.where(coded > 0, 255, 0).astype(np.uint8)
    ours = np.asarray(viterbi.viterbi_decode(jnp.asarray(soft), nbits))
    np.testing.assert_array_equal(ours, bits[:nbits])


def test_viterbi_nonzero_tail_matches_golden():
    """With nonzero tail bits the reference chainback (from state 0) may
    corrupt trailing bits; we must reproduce the same decisions."""
    nbits = 96
    data = RNG.integers(0, 256, size=(nbits + 6 + 7) // 8, dtype=np.uint8)
    coded = gm.conv_encode(data, nbits)
    soft = np.where(coded > 0, 255, 0).astype(np.uint8)
    want = gm.viterbi_decode(soft, nbits)
    ours = np.asarray(viterbi.viterbi_decode(jnp.asarray(soft), nbits))
    np.testing.assert_array_equal(ours, want)


@pytest.mark.parametrize("trial", range(4))
def test_viterbi_noisy_matches_golden(trial):
    """Decisions must match the golden u8-semantics model bit for bit."""
    rng = np.random.default_rng(trial)
    nbits = 200
    data = rng.integers(0, 256, size=(nbits + 6 + 7) // 8, dtype=np.uint8)
    coded = gm.conv_encode(data, nbits)
    clean = np.where(coded > 0, 255.0, 0.0)
    noisy = np.clip(clean + rng.normal(scale=60.0, size=clean.shape), 0, 255)
    soft = noisy.astype(np.uint8)
    want = gm.viterbi_decode(soft, nbits)
    ours = np.asarray(viterbi.viterbi_decode(jnp.asarray(soft), nbits))
    np.testing.assert_array_equal(ours, want)


def test_viterbi_batched():
    nbits = 48
    cases = [_random_data_zero_tail(RNG, nbits) for _ in range(3)]
    softs = np.stack([
        np.where(gm.conv_encode(d, nbits) > 0, 255, 0).astype(np.uint8)
        for d, _ in cases])
    ours = np.asarray(viterbi.viterbi_decode(jnp.asarray(softs), nbits))
    for i, (_, bits) in enumerate(cases):
        np.testing.assert_array_equal(ours[i], bits[:nbits])


def test_demodulate_all_matches_per_rate():
    """The 13-lane all-modulation soft vector (universal decoder input)
    slices to exactly demodulate_p's output for every rate."""
    import jax.numpy as jnp
    from fun_ofdm_tpu.ops import qam
    from fun_ofdm_tpu.rates import ALL_RATES, params_for

    rng = np.random.default_rng(31)
    sym = (jnp.asarray(rng.normal(0, 0.5, 96).astype(np.float32)),
           jnp.asarray(rng.normal(0, 0.5, 96).astype(np.float32)))
    all13 = np.asarray(qam.demodulate_all_p(sym))        # (96, 13)
    for rate in ALL_RATES:
        bpsc = params_for(rate).bpsc
        off = qam.ALL_SOFT_OFFSET[bpsc]
        want = np.asarray(qam.demodulate_p(sym, rate)).reshape(96, bpsc)
        np.testing.assert_array_equal(all13[:, off:off + bpsc], want)
