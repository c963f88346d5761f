"""Fused streaming path parity: one-device-program-per-slot vs sequential.

The live engine's fused path (api/engine.py _fused_consume +
models/analyzer.fused_slot_step) must be an exact drop-in for the
sequential per-consumer path it accelerates: same tuner outputs, same
onset events, same analyzer states, slot for slot.  Ref: the realtime
callbacks it rebuilds, src/audio_io/mod.rs:657-938.
"""

import json

import numpy as np
import pytest

from audio_analyzer_rs_tpu.api.device import ArraySource
from audio_analyzer_rs_tpu.api.engine import AudioEngine
from audio_analyzer_rs_tpu.models import generators as gen

SR = 48000.0


def _run_session(fused: bool, seconds: float = 3.0, pause_at: int = -1):
    """Scripted live session (tuner + onset over a mixed scene with loopback
    calibration); returns per-slot polled outputs + the engine."""
    scene = gen.mixed_scene(seconds + 0.5, SR, seed=11)
    e = AudioEngine(input_source=ArraySource(scene), sample_rate=SR,
                    loopback_latency_samples=2048, loopback_gain=1.0)
    e.fused_streaming = fused
    tuner = e.start_tuner()
    onset = e.start_onset_detection()
    slot_s = e.buffer_size / SR
    outs = []
    n_slots = int(seconds / slot_s)
    for i in range(n_slots):
        if pause_at >= 0 and i == pause_at:
            onset.pause()
        if pause_at >= 0 and i == pause_at + 12:
            onset.resume()
        e.advance(slot_s)
        outs.append((tuner.poll_output(), onset.poll_onsets()))
    return e, outs


def _consumers(e):
    from audio_analyzer_rs_tpu.api.engine import _OnsetConsumer, _PitchConsumer
    pc = next(c for c in e._consumers.values() if isinstance(c, _PitchConsumer))
    oc = next(c for c in e._consumers.values() if isinstance(c, _OnsetConsumer))
    return pc, oc


def test_fused_matches_sequential_slot_for_slot():
    ef, outs_f = _run_session(fused=True)
    es, outs_s = _run_session(fused=False)
    # The fused path must actually have engaged (post-calibration).
    assert ef._fused_slots > 0
    assert es._fused_slots == 0
    for i, (a, b) in enumerate(zip(outs_f, outs_s)):
        assert a == b, f"slot {i}: fused {a} != sequential {b}"
    # Onset events must have fired in the fused span (mixed_scene has
    # percussion), or the parity above proves nothing about events.
    fused_span_events = sum(len(json.loads(o)) for _, o in
                            outs_f[len(outs_f) // 2:])
    assert fused_span_events > 0


def test_fused_final_states_match():
    ef, _ = _run_session(fused=True)
    es, _ = _run_session(fused=False)
    pf, of = _consumers(ef)
    ps, os_ = _consumers(es)
    assert pf.analyzer.frames_consumed == ps.analyzer.frames_consumed
    assert of.analyzer.frames_consumed == os_.analyzer.frames_consumed
    np.testing.assert_array_equal(np.asarray(pf.analyzer._tail),
                                  np.asarray(ps.analyzer._tail))
    np.testing.assert_array_equal(np.asarray(of.analyzer._tail),
                                  np.asarray(os_.analyzer._tail))
    for a, b in zip(pf.analyzer.nf_state, ps.analyzer.nf_state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(pf.analyzer.tr_state, ps.analyzer.tr_state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(of.analyzer.state, os_.analyzer.state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_falls_back_on_pause_and_stays_exact():
    """Pausing the onset flow mid-run must drop to the sequential path
    (dropped-samples bookkeeping) and still match a sequential-only run."""
    ef, outs_f = _run_session(fused=True, pause_at=100)
    es, outs_s = _run_session(fused=False, pause_at=100)
    assert ef._fused_slots > 0
    assert outs_f == outs_s


def test_debug_recorder_disables_fusion():
    from audio_analyzer_rs_tpu import devtools
    scene = gen.mixed_scene(1.0, SR, seed=3)
    e = AudioEngine(input_source=ArraySource(scene), sample_rate=SR)
    e.attach_debug_recorder(devtools.DebugRecorder(max_frames=64))
    e.start_tuner()
    e.start_onset_detection()
    e.advance(0.8)
    assert e._fused_slots == 0
