"""Top-level analyze_buffer API (BASELINE: analyze-buffer → feature structs)."""

import numpy as np

import audio_analyzer_rs_tpu as aat
from audio_analyzer_rs_tpu.models import generators as gen

SR = 44100.0


def test_analyze_buffer_full_struct():
    x = gen.tone_with_harmonics(220.0, 1.0, SR, harmonics=8, amplitude=0.4)
    click = gen.calibration_click(SR, volume=0.6)
    x[int(0.5 * SR):int(0.5 * SR) + len(click)] += click
    res = aat.analyze_buffer(x, SR)
    assert res.spectrogram.shape[1] == 1025
    assert len(res.frames) == res.spectrogram.shape[0]
    f = res.frames[len(res.frames) // 4]
    assert f.rms > 0.01
    assert 0 < f.centroid_hz < SR / 2
    assert f.yin_voiced and abs(f.yin_f0_hz - 220.0) < 5.0
    assert any(abs(p - 220.0) < 5.0 for p, _ in f.stable_pitches)
    # The click produced at least one onset near 0.5 s.
    assert any(abs(o["time_s"] - 0.5) < 0.05 for o in res.onsets), res.onsets
    d = res.to_dicts()
    assert isinstance(d[0]["stable_pitches"], list)


def test_analyze_buffer_as_arrays_matches_structs():
    x = gen.tone_with_harmonics(220.0, 1.0, SR, harmonics=8, amplitude=0.4)
    res = aat.analyze_buffer(x, SR)
    arr = aat.analyze_buffer(x, SR, as_arrays=True)
    n = len(res.frames)
    assert arr.rms.shape == (n,)
    assert arr.stable_freqs.shape == (n, 8)
    for i in (0, n // 2, n - 1):
        f = res.frames[i]
        assert arr.rms[i] == np.float32(f.rms)
        assert arr.yin_f0_hz[i] == np.float32(f.yin_f0_hz)
        assert arr.time_s[i] == np.float32(f.time_s)
        stable = [(float(a), float(b)) for a, b, v in
                  zip(arr.stable_freqs[i], arr.stable_scores[i],
                      arr.stable_valid[i]) if v]
        assert stable == f.stable_pitches
    assert arr.onsets == res.onsets
    np.testing.assert_array_equal(arr.spectrogram, res.spectrogram)

    empty = aat.analyze_buffer(np.zeros(100, np.float32), SR, as_arrays=True)
    assert empty.rms.shape == (0,)
    assert empty.spectrogram.shape == (0, 1025)


def test_analyze_buffer_short_audio():
    res = aat.analyze_buffer(np.zeros(100, np.float32), SR)
    assert res.frames == [] and len(res.onsets) == 0


def test_analyze_buffer_segmented_matches_sequential():
    """The segmented bulk path must match the sequential columnar path: the
    stateless stages exactly (including flux across feature-chunk
    boundaries, which carry a lead frame), and — with few enough frames
    that the segment count clamps to 1 — the stable/onset streams with the
    same decisions.  Pitch *values* are tolerance-identical, not bitwise:
    the bulk path's pitch pass uses the banded GEMM backend
    (ops.stft.PITCH_BACKEND) while the rich path computes the full spectrum
    with "fft" for the spectrogram/feature pack (see analyze_buffer)."""
    x = gen.tone_with_harmonics(220.0, 2.0, SR, harmonics=8, amplitude=0.4)
    click = gen.calibration_click(SR, volume=0.6)
    x[int(1.1 * SR):int(1.1 * SR) + len(click)] += click
    seq = aat.analyze_buffer(x, SR, as_arrays=True)
    seg = aat.analyze_buffer_segmented(x, SR, segments=4,
                                       feature_chunk_frames=32)
    n = len(seq.rms)
    assert len(seg.rms) == n and n > 64          # several feature chunks
    for field in ("time_s", "rms", "energy", "centroid_hz", "rolloff_hz",
                  "flux", "yin_f0_hz", "yin_voiced", "spectrogram"):
        np.testing.assert_array_equal(
            getattr(seg, field), getattr(seq, field), err_msg=field)
    np.testing.assert_array_equal(seg.stable_valid, seq.stable_valid)
    np.testing.assert_allclose(seg.stable_freqs, seq.stable_freqs,
                               rtol=1e-5, atol=1e-3)
    assert [o["frame"] for o in seg.onsets] == [o["frame"] for o in seq.onsets]
    assert seg.raw_freqs.shape == (0, 8)         # not produced in this mode

    empty = aat.analyze_buffer_segmented(np.zeros(100, np.float32), SR)
    assert empty.rms.shape == (0,)

    # Forcing one backend for every stage restores bit-identity.
    seq_f = aat.analyze_buffer(x, SR, backend="fft", as_arrays=True)
    seg_f = aat.analyze_buffer_segmented(x, SR, segments=4, backend="fft",
                                         feature_chunk_frames=32)
    np.testing.assert_array_equal(seg_f.stable_freqs, seq_f.stable_freqs)
    np.testing.assert_array_equal(seg_f.stable_valid, seq_f.stable_valid)


def test_package_exports():
    assert aat.AudioEngine is not None
    assert aat.PitchAnalyzer is not None
    assert aat.MusicalTransport is not None


def test_analyze_buffer_accepts_int16():
    """Both entry points must interpret int16 identically (scaled 1/32768,
    like utils.wav) — not silently treat raw sample values as floats."""
    x = gen.tone_with_harmonics(220.0, 1.0, SR, harmonics=6, amplitude=0.4)
    i16 = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
    f32 = i16.astype(np.float32) / 32768.0
    a = aat.analyze_buffer(f32, SR, as_arrays=True)
    b = aat.analyze_buffer(i16, SR, as_arrays=True)
    np.testing.assert_array_equal(a.rms, b.rms)
    np.testing.assert_array_equal(a.stable_freqs, b.stable_freqs)
    assert a.onsets == b.onsets
