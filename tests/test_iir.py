"""IIR design/application vs scipy oracles."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from aware_tpu.ops.iir import (
    butter,
    filtfilt,
    fir_approx,
    iir_impulse_response,
    lfilter,
    lfilter_zi,
)


@pytest.mark.parametrize(
    "order,wn,btype",
    [
        (6, 0.5, "low"),            # LowPassFilter attack: 4kHz @ 16k
        (4, 0.0625, "high"),        # HighPassFilter attack: 500Hz @ 16k
        (4, (0.1, 0.125), "bandstop"),  # RandomBandstop attack shape
        (4, (0.2, 0.4), "bandpass"),
        (2, 0.3, "low"),
    ],
)
def test_butter_matches_scipy(order, wn, btype):
    b, a = butter(order, wn, btype)
    b_ref, a_ref = scipy.signal.butter(order, wn, btype=btype)
    np.testing.assert_allclose(b, b_ref, atol=1e-10, rtol=1e-8)
    np.testing.assert_allclose(a, a_ref, atol=1e-10, rtol=1e-8)


def test_lfilter_matches_scipy(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    b, a = butter(6, 0.5, "low")
    ours = np.asarray(lfilter(b, a, jnp.asarray(x)))
    ref = scipy.signal.lfilter(b, a, x.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_lfilter_batched(rng):
    x = rng.standard_normal((3, 1000)).astype(np.float32)
    b, a = butter(4, 0.0625, "high")
    ours = np.asarray(lfilter(b, a, jnp.asarray(x)))
    for i in range(3):
        ref = scipy.signal.lfilter(b, a, x[i].astype(np.float64))
        # near-unit poles of the 500 Hz highpass amplify f32 rounding
        np.testing.assert_allclose(ours[i], ref, atol=1e-3, rtol=1e-3)


def test_lfilter_zi_matches_scipy():
    b, a = butter(4, 0.2, "low")
    np.testing.assert_allclose(
        lfilter_zi(b, a), scipy.signal.lfilter_zi(b, a), atol=1e-9
    )


def test_filtfilt_matches_scipy(rng):
    """b,a filtfilt on a well-conditioned lowpass (direct form is f32-safe)."""
    x = rng.standard_normal(4000).astype(np.float64)
    b, a = butter(4, 0.3, "low")
    ours = np.asarray(filtfilt(b, a, jnp.asarray(x)))
    ref = scipy.signal.filtfilt(b, a, x)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_sos_bandstop_stable_and_matches_scipy(rng):
    """The narrow order-4 bandstop (RandomBandstop attack shape) explodes in
    f32 direct form; the SOS cascade must stay stable and match scipy."""
    from aware_tpu.ops.iir import butter_sos, sosfilt, sosfiltfilt

    x = rng.standard_normal(4000).astype(np.float32)
    sos = butter_sos(4, (0.1, 0.125), "bandstop")
    ref_sos = scipy.signal.butter(4, (0.1, 0.125), btype="bandstop", output="sos")

    y = np.asarray(sosfilt(sos, jnp.asarray(x)))
    ref = scipy.signal.sosfilt(ref_sos, x.astype(np.float64))
    assert np.abs(y).max() < 10.0  # stable
    np.testing.assert_allclose(y, ref, atol=2e-3, rtol=1e-2)

    y2 = np.asarray(sosfiltfilt(sos, jnp.asarray(x)))
    ref2 = scipy.signal.sosfiltfilt(ref_sos, x.astype(np.float64))
    assert y2.shape == ref2.shape
    err = np.sqrt(np.mean((y2 - ref2) ** 2) / np.mean(ref2**2))
    assert err < 1e-2, err


def test_sos_transfer_function_equivalent():
    """Our SOS pairing differs from scipy's ordering but the cascade must
    realize the same transfer function."""
    from aware_tpu.ops.iir import butter_sos

    sos = butter_sos(4, (0.1, 0.125), "bandstop")
    b_ref, a_ref = scipy.signal.butter(4, (0.1, 0.125), btype="bandstop")
    w, h_ours = scipy.signal.sosfreqz(sos, worN=512)
    _, h_ref = scipy.signal.freqz(b_ref, a_ref, worN=512)
    np.testing.assert_allclose(np.abs(h_ours), np.abs(h_ref), atol=1e-7)


def test_impulse_response_matches_scipy():
    b, a = butter(6, 0.5, "low")
    h = iir_impulse_response(b, a, 256)
    x = np.zeros(256)
    x[0] = 1.0
    ref = scipy.signal.lfilter(b, a, x)
    np.testing.assert_allclose(h, ref, atol=1e-12)


def test_fir_approx_close_to_iir(rng):
    x = rng.standard_normal(8000).astype(np.float32)
    b, a = butter(4, 0.0625, "high")
    exact = scipy.signal.lfilter(b, a, x.astype(np.float64))
    approx = np.asarray(fir_approx(b, a, jnp.asarray(x), length=2048))
    assert approx.shape == x.shape
    err = np.sqrt(np.mean((approx - exact) ** 2) / np.mean(exact**2))
    assert err < 1e-4, err
