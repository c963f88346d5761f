"""YIN pitch detection tests (BASELINE config #4: sweeps + notes)."""

import numpy as np

from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.ops.yin import yin_pitch, yin_pitch_np
from audio_analyzer_rs_tpu.utils.framing import frame_signal_np

SR = 44100.0
W = 2048


def test_yin_pure_tones():
    for f0 in [82.4, 110.0, 220.0, 440.0, 660.0, 987.8]:
        x = gen.sine(f0, 0.2, SR, amplitude=0.5)
        frames = frame_signal_np(x, W, W)
        res = yin_pitch(frames, SR)
        f = np.asarray(res.f0_hz)
        v = np.asarray(res.voiced)
        assert v.all(), f0
        assert np.all(np.abs(f - f0) / f0 < 0.01), (f0, f)


def test_yin_harmonic_tone_finds_fundamental():
    x = gen.tone_with_harmonics(196.0, 0.3, SR, harmonics=8)
    frames = frame_signal_np(x, W, 512)
    res = yin_pitch(frames, SR)
    f = np.asarray(res.f0_hz)[np.asarray(res.voiced)]
    assert len(f) > 0
    assert np.all(np.abs(f - 196.0) / 196.0 < 0.01), f


def test_yin_sweep_tracks_frequency():
    x = gen.sweep(200.0, 800.0, 2.0, SR, amplitude=0.5)
    frames = frame_signal_np(x, W, 1024)
    res = yin_pitch(frames, SR)
    f = np.asarray(res.f0_hz)
    v = np.asarray(res.voiced)
    # Frame centers move through the sweep; detected f0 should increase.
    centers = (np.arange(len(frames)) * 1024 + W / 2) / SR
    expected = 200.0 + (800.0 - 200.0) / 2.0 * centers
    ok = v & (expected > 210) & (expected < 780)
    assert ok.sum() > 10
    rel_err = np.abs(f[ok] - expected[ok]) / expected[ok]
    assert np.percentile(rel_err, 90) < 0.03, rel_err.max()


def test_yin_silence_unvoiced():
    frames = np.zeros((4, W), np.float32)
    res = yin_pitch(frames, SR)
    assert not np.asarray(res.voiced).any()
    assert np.all(np.asarray(res.f0_hz) == 0.0)


def test_yin_noise_mostly_unvoiced():
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((8, W)).astype(np.float32)
    res = yin_pitch(frames, SR)
    assert np.asarray(res.voiced).sum() <= 2


def test_yin_matches_oracle():
    x = gen.tone_with_harmonics(330.0, 0.1, SR, harmonics=5)
    frames = frame_signal_np(x, W, W)
    res = yin_pitch(frames, SR)
    for i in range(len(frames)):
        f_o, v_o = yin_pitch_np(frames[i], SR)
        if v_o:
            assert abs(float(res.f0_hz[i]) - f_o) / f_o < 0.005, (
                float(res.f0_hz[i]), f_o)
