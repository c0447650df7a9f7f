"""Preamble constants: closed-form construction vs standard values."""

import numpy as np

from fun_ofdm_tpu import preamble as pre


def test_shapes():
    assert pre.PREAMBLE_SAMPLES.shape == (320,)
    assert pre.LTS_FREQ_DOMAIN.shape == (64,)
    assert pre.LTS_TIME_DOMAIN_CONJ.shape == (64,)


def test_sts_periodic():
    sts = pre.PREAMBLE_SAMPLES[:160]
    # 10 periods of 16 samples (sample 0 is halved by windowing)
    for k in range(1, 10):
        np.testing.assert_allclose(
            sts[k * 16:(k + 1) * 16], np.r_[sts[16], sts[1:16]], atol=1e-12)
    np.testing.assert_allclose(sts[0], sts[16] / 2, atol=1e-12)


def test_lts_structure():
    lts = pre.LTS_TIME_DOMAIN
    # CP then two copies
    np.testing.assert_allclose(pre.PREAMBLE_SAMPLES[161:192], lts[33:], atol=1e-12)
    np.testing.assert_allclose(pre.PREAMBLE_SAMPLES[160], lts[32] / 2, atol=1e-12)
    np.testing.assert_allclose(pre.PREAMBLE_SAMPLES[192:256], lts, atol=1e-12)
    np.testing.assert_allclose(pre.PREAMBLE_SAMPLES[256:320], lts, atol=1e-12)


def test_known_values():
    """Spot-check against the reference table values (src/preamble.h)."""
    np.testing.assert_allclose(
        pre.PREAMBLE_SAMPLES[0], 0.0229993772561 + 0.0229993772561j, atol=1e-10)
    np.testing.assert_allclose(
        pre.PREAMBLE_SAMPLES[1], -0.132443716852 + 0.00233959188499j, atol=1e-10)
    np.testing.assert_allclose(pre.LTS_TIME_DOMAIN[0], 0.15625 + 0j, atol=1e-10)
    np.testing.assert_allclose(
        pre.LTS_TIME_DOMAIN_CONJ[1], -0.00512125036042 + 0.120325132674j, atol=1e-10)
    # LTS freq: subcarrier -26 (index 6) and -25 both +1, -24 -1
    assert pre.LTS_FREQ_DOMAIN[6] == 1 and pre.LTS_FREQ_DOMAIN[7] == 1
    assert pre.LTS_FREQ_DOMAIN[8] == -1
    assert pre.LTS_FREQ_DOMAIN[32] == 0  # DC null
