"""Golden end-to-end regression: a fixed three-note scene's outputs are
frozen as literals so cross-component drift (STFT x floor x comb x tracker x
onset) can't slip through componentwise oracle tests unnoticed."""

import numpy as np

from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.models.analyzer import OnsetAnalyzer, PitchAnalyzer

SR = 44100.0


def scene():
    return np.concatenate([
        gen.tone_with_harmonics(220.0, 0.4, SR, harmonics=6, amplitude=0.35),
        gen.silence(0.1, SR),
        gen.tone_with_harmonics(293.66, 0.4, SR, harmonics=6, amplitude=0.35),
        gen.silence(0.1, SR),
        gen.tone_with_harmonics(392.0, 0.4, SR, harmonics=5, amplitude=0.3),
    ]).astype(np.float32)


def test_golden_pitch_sequence():
    out = PitchAnalyzer(SR).process(scene())
    golden = {10: 220.31, 20: 220.31, 45: 292.64, 55: 293.34}
    for frame, freq in golden.items():
        got = out.stable_freqs[frame][out.stable_valid[frame]]
        assert len(got) == 1, (frame, got)
        assert abs(float(got[0]) - freq) < 0.5, (frame, float(got[0]), freq)
    # Silence gap frame reports nothing.
    assert not out.stable_valid[80].any()


def test_golden_onsets():
    o = OnsetAnalyzer(SR).process(scene())
    fired = np.nonzero(o.fired)[0].tolist()
    # Second and third attacks fire (the first is swallowed by per-bin floor
    # initialization on the opening frame — reference behavior for audio
    # starting mid-note); positions within a hop of the golden frames.
    assert len(fired) == 2, fired
    assert abs(fired[0] - 342) <= 2 and abs(fired[1] - 686) <= 2, fired
