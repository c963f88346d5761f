"""Batched multi-recording segmented analysis (serving many short takes):
per-recording outputs must match the single-recording segmented path run at
the same stream geometry, across lengths, dtypes, and the device mesh."""

import numpy as np

from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.models.segmented import (
    _batch_plan, segmented_onset_analysis, segmented_onset_analysis_batch,
    segmented_pitch_analysis, segmented_pitch_analysis_batch)
from audio_analyzer_rs_tpu.utils.framing import num_frames

SR = 44100.0


def melody(duration_s: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(int(SR * duration_s)) * 1e-4).astype(np.float32)
    freqs = [220.0, 261.63, 329.63, 392.0, 440.0]
    t, i = 0.0, seed
    while t + 0.5 < duration_s:
        tone = gen.tone_with_harmonics(freqs[i % len(freqs)], 0.45, SR,
                                       harmonics=6, amplitude=0.35)
        s = int(t * SR)
        x[s:s + len(tone)] += tone
        t += 0.5
        i += 1
    return x


def percussive(duration_s: float, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(int(SR * duration_s)) * 1e-4).astype(np.float32)
    t = 0.1 + 0.01 * seed
    while t < duration_s - 0.1:
        burst = gen.noise_burst(0.6, 20.0, SR, seed=seed + int(t * 1000))
        s = int(t * SR)
        x[s:s + len(burst)] += burst
        t += 0.5
    return x


def _single_at_batch_geometry(x, plan, **kw):
    """The single-recording run at the batch's shared stream geometry.

    The batch plans payload/warmup from the LONGEST recording; the
    single-recording call would re-plan from this recording's own length.
    Matching segments/warmup/chunk reproduces the same stream decomposition
    for the longest recording; shorter ones are compared via this helper
    only when their geometry coincides (same n), else against the batch's
    own contract (coverage + fresh-prefix equality), tested separately.
    """
    return segmented_pitch_analysis(
        x, SR, segments=plan.segments, warmup_frames=plan.warmup_frames,
        chunk_frames=64, **kw)


def test_batch_equal_lengths_matches_single():
    """Equal-length batch: every recording must reproduce the single-
    recording segmented run bit-for-bit (same geometry, fft backend —
    per-row-deterministic so batch size can't shift rounding)."""
    xs = [melody(8.0, seed=k) for k in range(3)]
    outs = segmented_pitch_analysis_batch(xs, SR, backend="fft",
                                          chunk_frames=64)
    plan = _batch_plan([num_frames(len(x), 2048, 512) for x in xs],
                       None, 128, 64, 2048, 512)
    assert len(outs) == 3
    for x, (sf, ss, sv) in zip(xs, outs):
        ref = _single_at_batch_geometry(x, plan, backend="fft")
        np.testing.assert_array_equal(sf, ref[0])
        np.testing.assert_array_equal(ss, ref[1])
        np.testing.assert_array_equal(sv, ref[2])


def test_batch_mixed_lengths_cover_and_agree():
    """Different-length recordings: outputs clip to each recording's own
    frame count and agree with its sequential analysis (same agreement
    definition as test_segmented)."""
    from audio_analyzer_rs_tpu.models.analyzer import PitchAnalyzer
    xs = [melody(10.0, seed=1), melody(4.0, seed=2), melody(7.0, seed=3)]
    outs = segmented_pitch_analysis_batch(xs, SR, chunk_frames=64)
    for x, (sf, ss, sv) in zip(xs, outs):
        n = num_frames(len(x), 2048, 512)
        assert sf.shape == (n, 8) and sv.shape == (n, 8)
        seq = PitchAnalyzer(SR).process(x)
        agree = 0
        for i in range(n):
            a = sorted(np.round(sf[i][sv[i]], 1))
            b = sorted(np.round(seq.stable_freqs[i][seq.stable_valid[i]], 1))
            agree += a == b
        assert agree / n > 0.99, f"only {agree}/{n} frames agree"


def test_batch_onset_matches_single():
    xs = [percussive(8.0, seed=k) for k in (1, 2)]
    outs = segmented_onset_analysis_batch(xs, SR, chunk_frames=1024)
    plan = _batch_plan([num_frames(len(x), 256, 64) for x in xs],
                       None, 128, 1024, 256, 64)
    for x, got in zip(xs, outs):
        ref = segmented_onset_analysis(
            x, SR, segments=plan.segments,
            warmup_frames=plan.warmup_frames, chunk_frames=1024)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)


def test_batch_int16_matches_f32():
    xs = [melody(5.0, seed=k) for k in (4, 5)]
    i16s = [np.clip(x * 32768.0, -32768, 32767).astype(np.int16) for x in xs]
    f32s = [i.astype(np.float32) / 32768.0 for i in i16s]
    a = segmented_pitch_analysis_batch(f32s, SR, chunk_frames=64)
    b = segmented_pitch_analysis_batch(i16s, SR, chunk_frames=64)
    for ta, tb in zip(a, b):
        for x_a, x_b in zip(ta, tb):
            np.testing.assert_array_equal(x_a, x_b)


def test_batch_edge_cases():
    assert segmented_pitch_analysis_batch([], SR) == []
    outs = segmented_pitch_analysis_batch(
        [np.zeros(100, np.float32), np.zeros(50, np.float32)], SR)
    assert [o[0].shape for o in outs] == [(0, 8), (0, 8)]
    # One real + one too-short recording in the same batch.
    outs = segmented_pitch_analysis_batch(
        [melody(4.0, seed=6), np.zeros(100, np.float32)], SR,
        chunk_frames=64)
    n = num_frames(int(SR * 4.0), 2048, 512)
    assert outs[0][0].shape == (n, 8)
    assert outs[1][0].shape == (0, 8)
    o_outs = segmented_onset_analysis_batch([], SR)
    assert o_outs == []


def test_batch_on_mesh_matches_unmeshed():
    """3 recordings x 4 segments = 12 rows pads up to 16 on the 8-device
    mesh; results must match the unmeshed batch exactly."""
    from audio_analyzer_rs_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    xs = [melody(8.0, seed=k) for k in range(3)]
    ref = segmented_pitch_analysis_batch(
        xs, SR, segments_per_recording=4, chunk_frames=64)
    got = segmented_pitch_analysis_batch(
        xs, SR, segments_per_recording=4, chunk_frames=64, mesh=mesh)
    for ta, tb in zip(ref, got):
        for a, b in zip(ta, tb):
            np.testing.assert_array_equal(a, b)


def test_batch_plan_row_targeting():
    """segments-per-recording lands B*S near the 128-row sweet spot and
    never violates auto_segments' payload rule."""
    n = num_frames(int(SR * 30.0), 2048, 512)   # ~2583 frames per take
    for b, expect_cap in ((1, 128), (4, 32), (64, 2), (256, 1)):
        plan = _batch_plan([n] * b, None, 128, 64, 2048, 512)
        assert plan.segments <= expect_cap
        # payload >= 10x warmup unless capped at 1.
        if plan.segments > 1:
            assert n // (128 * 10) >= 1
