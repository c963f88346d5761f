"""Onset detector parity (scan vs NumPy transcription) + end-to-end clicks."""

import numpy as np

from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.models.analyzer import OnsetAnalyzer
from audio_analyzer_rs_tpu.ops import onset as onset_ops

SR = 48000.0
HALF = onset_ops.HALF


def _compare(mags, gf, ts):
    state = onset_ops.init_state(HALF)
    _, out = onset_ops.onset_scan(state, mags, gf, ts)
    oracle = onset_ops.onset_np(mags, gf, ts)
    np.testing.assert_array_equal(np.asarray(out.fired), oracle["fired"])
    np.testing.assert_array_equal(np.asarray(out.detected), oracle["detected"])
    np.testing.assert_allclose(np.asarray(out.velocity), oracle["velocity"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.flux), oracle["flux"],
                               rtol=1e-3, atol=1e-4)


def test_onset_scan_matches_oracle_random(rng):
    n = 60
    mags = (rng.random((n, HALF)) * 2.0).astype(np.float32)
    # Inject bursts at frames 20 and 40.
    mags[20] *= 20.0
    mags[40] *= 25.0
    gf = np.full(n, 0.05, np.float32)
    ts = np.zeros(n, bool)
    _compare(mags, gf, ts)


def test_onset_scan_tick_suppression(rng):
    n = 30
    mags = (rng.random((n, HALF)) * 1.0).astype(np.float32)
    mags[15] *= 30.0
    gf = np.full(n, 0.05, np.float32)
    ts = np.zeros(n, bool)
    ts[15] = True  # metronome tick exactly at the burst
    _compare(mags, gf, ts)
    state = onset_ops.init_state(HALF)
    _, out = onset_ops.onset_scan(state, mags, gf, ts)
    assert not np.asarray(out.fired)[15], "tick-suppressed onset must not fire"


def test_onset_refractory_blocks_double_fire(rng):
    n = 20
    mags = (rng.random((n, HALF)) * 0.5).astype(np.float32)
    mags[10] *= 40.0
    mags[11] *= 45.0  # immediately repeated burst
    gf = np.full(n, 0.02, np.float32)
    ts = np.zeros(n, bool)
    _compare(mags, gf, ts)


def test_onset_analyzer_detects_clicks_end_to_end():
    """Clicks every 0.25 s in quiet noise → fired onsets near click frames."""
    rng = np.random.default_rng(7)
    dur = 2.0
    x = (rng.standard_normal(int(SR * dur)) * 1e-4).astype(np.float32)
    click_times = [0.25, 0.75, 1.25, 1.75]
    click = gen.calibration_click(SR, volume=0.8)
    for t in click_times:
        i = int(t * SR)
        x[i:i + len(click)] += click
    an = OnsetAnalyzer(SR)
    out = an.process(x)
    fired_frames = np.nonzero(out.fired)[0]
    assert len(fired_frames) >= len(click_times), fired_frames
    # Every click must have a fired onset within 4 hops (≈5 ms).
    for t in click_times:
        frame = int(t * SR) // onset_ops.HOP
        assert np.any(np.abs(fired_frames - frame) <= 6), (t, fired_frames)


def test_onset_analyzer_silent_input_no_fires():
    an = OnsetAnalyzer(SR)
    out = an.process(np.zeros(int(SR), np.float32))
    assert not out.fired.any()


def test_onset_streaming_matches_batch(rng):
    x = (rng.standard_normal(int(SR * 0.5)) * 1e-4).astype(np.float32)
    click = gen.calibration_click(SR, volume=0.7)
    x[4000:4000 + len(click)] += click
    a1 = OnsetAnalyzer(SR)
    full = a1.process(x)
    a2 = OnsetAnalyzer(SR)
    outs = [o for o in (a2.process(c) for c in np.array_split(x, 7))
            if o is not None]
    fired2 = np.concatenate([o.fired for o in outs])
    np.testing.assert_array_equal(fired2, full.fired)
