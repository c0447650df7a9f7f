"""Channel impairment sim + BER/PER harness + CFO correction.

The reference has no channel simulator or error-rate baseline at all
(reference: examples/test_sim.cpp is a noise-free loopback), so these tests
pin down the statistical behavior of the rebuilt chain: decode under AWGN,
multipath within the cyclic prefix, CFO estimation accuracy, and sane
PER-vs-SNR ordering from the harness.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_ofdm_tpu.models import rx, tx
from fun_ofdm_tpu.rates import Rate
from fun_ofdm_tpu.sim import ber, channel

RATE = Rate.RATE_1_2_QPSK
LENGTH = 64


def _frame_p(seed=0, batch=None):
    rng = np.random.default_rng(seed)
    shape = (LENGTH,) if batch is None else (batch, LENGTH)
    payload = rng.integers(0, 256, size=shape, dtype=np.uint8)
    return payload, tx.build_frame_p(jnp.asarray(payload), RATE)


def test_awgn_high_snr_decodes():
    payload, frame = _frame_p(batch=4)
    noisy = channel.awgn(frame, jax.random.PRNGKey(0), 25.0)
    out = rx.decode_frame_p(noisy, RATE, LENGTH)
    assert np.asarray(out["crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["payload"]), payload)


def test_awgn_low_snr_fails():
    _, frame = _frame_p(batch=4)
    noisy = channel.awgn(frame, jax.random.PRNGKey(1), -10.0)
    out = rx.decode_frame_p(noisy, RATE, LENGTH)
    assert not np.asarray(out["crc_ok"]).any()


def test_awgn_snr_calibration():
    """Measured noise power matches the requested SNR within 5%."""
    z = (jnp.zeros(200_000), jnp.zeros(200_000))
    n_re, n_im = channel.awgn(z, jax.random.PRNGKey(2), 10.0)
    p = float(jnp.mean(n_re**2 + n_im**2))
    want = channel.DEFAULT_SIGNAL_POWER / 10.0
    assert abs(p - want) / want < 0.05


def test_multipath_within_cp_decodes():
    payload, frame = _frame_p(seed=3)
    taps = (1.0, 0.0, 0.25 + 0.2j, 0.0, 0.1j)
    faded = channel.multipath(frame, taps)
    out = rx.decode_frame_p(faded, RATE, LENGTH)
    assert bool(out["crc_ok"])
    np.testing.assert_array_equal(np.asarray(out["payload"]), payload)


def test_cfo_estimate_accuracy():
    _, frame = _frame_p(seed=4)
    f = 1.5e-3  # cycles/sample
    rotated = channel.cfo(frame, f)
    start = jnp.zeros((), jnp.int32)
    lts, _ = rx.extract_symbols_p(rotated, start, 2)
    w = float(rx.estimate_cfo_p(lts))
    assert abs(w - 2 * np.pi * f) < 1e-4


def test_cfo_corrected_decode():
    payload, frame = _frame_p(seed=5)
    rotated = channel.cfo(frame, 1.5e-3)
    out = rx.decode_frame_p(rotated, RATE, LENGTH, cfo_correct=True)
    assert bool(out["crc_ok"])
    np.testing.assert_array_equal(np.asarray(out["payload"]), payload)


def test_cfo_correction_beats_uncorrected():
    """At a CFO large enough to break the uncorrected chain, the corrected
    chain still decodes (QAM16-3/4 is phase sensitive)."""
    rate = Rate.RATE_3_4_QAM16
    rng = np.random.default_rng(6)
    payload = rng.integers(0, 256, size=120, dtype=np.uint8)
    frame = tx.build_frame_p(jnp.asarray(payload), rate)
    rotated = channel.cfo(frame, 2.5e-3)
    out_raw = rx.decode_frame_p(rotated, rate, 120, cfo_correct=False)
    out_fix = rx.decode_frame_p(rotated, rate, 120, cfo_correct=True)
    assert bool(out_fix["crc_ok"])
    np.testing.assert_array_equal(np.asarray(out_fix["payload"]), payload)
    assert not bool(out_raw["crc_ok"])


def test_error_rate_curve_ordering():
    res = ber.error_rates(RATE, 32, snr_dbs=[-6.0, 30.0],
                          n_frames=16, batch=16, seed=0)
    assert res.per[0] > 0.9      # deep noise: everything fails
    assert res.per[1] == 0.0     # clean: everything decodes
    assert res.ber[1] == 0.0
    assert res.ber[0] > 0.05
    assert res.n_frames == 16


def test_error_rate_detect_mode():
    res = ber.error_rates(RATE, 32, snr_dbs=[25.0], n_frames=8, batch=8,
                          seed=1, detect=True, pad=128)
    assert res.per[0] == 0.0
    assert np.isnan(res.ber[0])
