"""DSP chain parity vs scipy (float64 oracle) and wavelet invariants."""

import numpy as np
import pytest
from scipy import interpolate
from scipy import signal as sps

from ecg_byte_tpu.ops import dsp, wavelet as W


def scipy_advanced_ecg_filter(ecg, fs=500, notch_freqs=(50, 60), highcut=100.0):
    """Oracle: the reference filter chain written directly with scipy
    (preprocess_utils.py:64-86 parameters), axis=-1 (time-last)."""
    out = ecg.copy()
    for f0 in notch_freqs:
        b, a = sps.iirnotch(f0, 30.0, fs)
        out = sps.filtfilt(b, a, out, axis=-1)
    nyq = 0.5 * fs
    b, a = sps.butter(4, [0.5 / nyq, highcut / nyq], btype="band")
    out = sps.filtfilt(b, a, out, axis=-1)
    b, a = sps.butter(4, 0.05 / nyq, btype="high")
    out = sps.filtfilt(b, a, out, axis=-1)
    return out


@pytest.fixture(scope="module")
def ecg_batch():
    rng = np.random.default_rng(0)
    t = np.arange(1000) / 500.0
    base = np.sin(2 * np.pi * 1.2 * t) + 0.3 * np.sin(2 * np.pi * 50 * t)
    x = base[None, None, :] + 0.1 * rng.normal(size=(2, 12, 1000))
    return x.astype(np.float64)


def test_filtfilt_operator_matches_scipy(ecg_batch):
    want = scipy_advanced_ecg_filter(ecg_batch, fs=500)
    got = np.asarray(dsp.advanced_ecg_filter(ecg_batch.astype(np.float32), fs=500))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 2e-4


def test_filtfilt_operator_removes_mains_hum():
    t = np.arange(2000) / 500.0
    clean = np.sin(2 * np.pi * 5 * t)
    hum = 0.5 * np.sin(2 * np.pi * 50 * t) + 0.5 * np.sin(2 * np.pi * 60 * t)
    got = np.asarray(dsp.advanced_ecg_filter((clean + hum)[None, :].astype(np.float32)))
    # mid-section (away from edges) should track the clean 5 Hz component
    mid = slice(500, 1500)
    resid = got[0][mid] - clean[mid]
    # scipy's own chain leaves ~0.06 RMS (passband ripple); hum is 0.5+0.5 amp
    assert np.sqrt(np.mean(resid**2)) < 0.1


def test_resample_matches_scipy(ecg_batch):
    n = ecg_batch.shape[-1]
    duration = n / 500.0
    t_orig = np.linspace(0, duration, n, endpoint=True)
    t_target = np.linspace(0, duration, n // 2, endpoint=True)
    f = interpolate.interp1d(
        t_orig, ecg_batch, kind="cubic", axis=-1,
        bounds_error=False, fill_value="extrapolate",
    )
    want = f(t_target)
    got = np.asarray(dsp.nsample_ecg(ecg_batch.astype(np.float32), 500.0, 250.0))
    assert got.shape == want.shape
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 2e-5


def test_wavelet_filters_match_published_db6():
    f = W.daubechies(6)
    h = f.rec_lo
    assert len(h) == 12
    np.testing.assert_allclose(h.sum(), np.sqrt(2), atol=1e-12)
    np.testing.assert_allclose(h[0], 0.11154074335008017, atol=1e-10)
    np.testing.assert_allclose(h[-1], -0.00107730108499558, atol=1e-10)
    # orthonormal shifts
    for k in range(1, 6):
        np.testing.assert_allclose(np.dot(h[: 12 - 2 * k], h[2 * k :]), 0, atol=1e-12)
    # 6 vanishing moments of the wavelet filter
    g = f.rec_hi
    for m in range(6):
        np.testing.assert_allclose(
            sum(g[k] * k**m for k in range(12)), 0, atol=1e-6
        )


def test_wavelet_perfect_reconstruction():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 12, 1000)).astype(np.float32)
    f = W.daubechies(6)
    coeffs = W.wavedec(x, f, 4)
    lengths = W.dec_lengths(1000, f.dec_len, 4)
    rec = np.asarray(W.waverec(coeffs, f, lengths))
    assert np.max(np.abs(rec - x)) < 1e-5


def test_haar_known_values():
    ca, cd = W.dwt(np.array([1.0, 2, 3, 4], np.float32), W.daubechies(1))
    np.testing.assert_allclose(np.asarray(ca), [3 / np.sqrt(2), 7 / np.sqrt(2)], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cd), [-1 / np.sqrt(2), -1 / np.sqrt(2)], rtol=1e-6)


def test_wavelet_denoise_properties():
    rng = np.random.default_rng(2)
    n = 2000
    t = np.arange(n) / 500.0
    clean = np.sin(2 * np.pi * 2 * t)
    noisy = clean + 0.1 * rng.normal(size=n)
    x = np.stack([clean, noisy]).astype(np.float32)
    den = np.asarray(W.wavelet_denoise(x))
    assert den.shape == x.shape
    # denoising reduces error vs clean
    before = np.sqrt(np.mean((noisy - clean) ** 2))
    after = np.sqrt(np.mean((den[1] - clean) ** 2))
    assert after < before
    # zero signal stays zero
    z = np.asarray(W.wavelet_denoise(np.zeros((1, 512), np.float32)))
    assert np.max(np.abs(z)) == 0.0


def test_segment_and_reorder():
    x = np.arange(2 * 12 * 10, dtype=np.float32).reshape(2, 12, 10)
    seg = np.asarray(dsp.segment_ecg(x, 4))
    assert seg.shape == (2, 2, 12, 4)
    np.testing.assert_array_equal(seg[0, 0, 0], x[0, 0, :4])
    np.testing.assert_array_equal(seg[0, 1, 0], x[0, 0, 4:8])

    leads = np.arange(12, dtype=np.float32)[None, :, None] * np.ones((1, 12, 3))
    r = np.asarray(dsp.reorder_leads(leads))
    np.testing.assert_array_equal(r[0, :, 0], [0, 1, 2, 5, 3, 4, 6, 7, 8, 9, 10, 11])


def test_preprocess_records_pipeline():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 12, 1000)).astype(np.float32)
    out = np.asarray(dsp.preprocess_records(x, fs=500.0, target_fs=250.0))
    assert out.shape == (2, 12, 500)
    assert np.all(np.isfinite(out))
    # NaNs in input are scrubbed, not propagated
    x[0, 0, 10] = np.nan
    out = np.asarray(dsp.preprocess_records(x, fs=500.0, target_fs=250.0))
    assert np.all(np.isfinite(out))


def test_wavelet_fused_matches_conv_path():
    """Operator-form denoise == conv-chain denoise (the pipeline default
    vs the reference-shaped implementation), including the data-dependent
    threshold and the zero-signal edge case."""
    from ecg_byte_tpu.ops import wavelet as W

    rng = np.random.default_rng(7)
    x = rng.normal(size=(3, 12, 700)).astype(np.float32).cumsum(axis=-1)
    a = np.asarray(W.wavelet_denoise(x))
    b = np.asarray(W.wavelet_denoise_fused(x))
    scale = np.abs(a).max() + 1e-9
    # f32 summation-order budget (measured ~6e-5 worst-case on random
    # walks; the conv path's own f32-vs-pywt-f64 budget is looser)
    np.testing.assert_allclose(b / scale, a / scale, atol=3e-4)
    z = np.asarray(W.wavelet_denoise_fused(np.zeros((1, 512), np.float32)))
    assert np.all(z == 0)
