"""Pallas Viterbi kernel: bit-exactness vs the lax.scan trellis.

Runs the kernel in interpreter mode (tests run on CPU; the compiled path is
exercised on hardware by bench.py and was validated bit-exact on a real
TPU). The scan path is itself validated bit-exactly against the compiled
reference decoder in test_golden_reference.py, so transitivity gives
kernel == reference.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fun_ofdm_tpu.ops import convcode, viterbi, viterbi_pallas


def _noisy_soft(rng, batch, nbits):
    bits = rng.integers(0, 2, size=batch + (nbits + 6,))
    coded = np.asarray(convcode.conv_encode(jnp.asarray(bits)))
    return np.clip(coded * 255 + rng.integers(-120, 120, coded.shape), 0, 255)


@pytest.mark.parametrize("nbits", [18, 100, 337, 811])
def test_pallas_matches_scan(nbits):
    rng = np.random.default_rng(nbits)
    soft = jnp.asarray(_noisy_soft(rng, (3,), nbits))
    ref = np.asarray(viterbi.viterbi_decode_scan(soft, nbits))
    got = np.asarray(
        viterbi_pallas.viterbi_decode_pallas(soft, nbits, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_pallas_erasure_and_extremes():
    # all-erasure (127/128 midpoints) and hard 0/255 inputs
    rng = np.random.default_rng(7)
    nbits = 90
    soft_h = _noisy_soft(rng, (2,), nbits)
    soft_e = np.full_like(soft_h, 127)
    for soft in (soft_h, soft_e):
        s = jnp.asarray(soft)
        ref = np.asarray(viterbi.viterbi_decode_scan(s, nbits))
        got = np.asarray(
            viterbi_pallas.viterbi_decode_pallas(s, nbits, interpret=True))
        np.testing.assert_array_equal(ref, got)


def test_pallas_custom_vmap_collapses_batch():
    """Nested vmaps must flatten into the kernel batch, stay exact."""
    rng = np.random.default_rng(3)
    nbits = 130
    soft = jnp.asarray(_noisy_soft(rng, (2, 3), nbits))

    ref = np.asarray(viterbi.viterbi_decode_scan(soft, nbits))
    fn = jax.vmap(jax.vmap(
        lambda s: viterbi_pallas.viterbi_decode_pallas(
            s, nbits, interpret=True)))
    got = np.asarray(fn(soft))
    np.testing.assert_array_equal(ref, got)


def test_dispatcher_selects_scan_on_cpu():
    assert viterbi.default_impl() == "scan"
    rng = np.random.default_rng(5)
    soft = jnp.asarray(_noisy_soft(rng, (1,), 100))
    np.testing.assert_array_equal(
        np.asarray(viterbi.viterbi_decode(soft, 100)),
        np.asarray(viterbi.viterbi_decode_scan(soft, 100)))
