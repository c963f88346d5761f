"""Aux subsystems (SURVEY §5): tracing, failure recovery, checkpoint/resume."""

import logging
import math
import os

import numpy as np
import pytest

from audio_analyzer_rs_tpu import checkpoint, tracing
from audio_analyzer_rs_tpu.api.device import ArraySource
from audio_analyzer_rs_tpu.api.engine import AudioEngine
from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.models.analyzer import OnsetAnalyzer, PitchAnalyzer
from audio_analyzer_rs_tpu.transport import MusicalTransport

SR = 48000.0


# ── tracing ──────────────────────────────────────────────────────────────

def test_tracing_dual_sinks(tmp_path, capsys):
    log_path = str(tmp_path / "output.log")
    root = tracing.init_tracing(log_file=log_path)
    logger = tracing.get_logger("unit")
    logger.info("calibration residual=42ms")
    logger.debug("debug only in file")
    for h in root.handlers:
        h.flush()
    content = open(log_path).read()
    assert "calibration residual=42ms" in content
    assert "debug only in file" in content      # file gets DEBUG
    err = capsys.readouterr().err
    assert "calibration residual=42ms" in err   # stderr gets INFO
    assert "debug only in file" not in err


# ── failure detection / recovery (ref mod.rs:585-655,673-676) ────────────

def test_input_error_recovery():
    tone = gen.tone_with_harmonics(220.0, 2.0, SR, amplitude=0.3)
    e = AudioEngine(input_source=ArraySource(tone))
    e.transport.set_calibration_offset(100)
    e.start_input()
    e.advance(0.2)
    e.inject_input_error()
    assert not e.device.input_running
    # start_input detects the flag, rebuilds, resets calibration, retries.
    e.start_input()
    assert e.device.input_running
    assert not e.input_error
    assert not e.transport.is_calibrated()   # calibration reset on rebuild
    e.advance(0.2)                            # pipeline functional again


def test_output_error_recovery():
    e = AudioEngine()
    e.start_output()
    e.inject_output_error()
    assert not e.device.output_running
    e.start_output()
    assert e.device.output_running and not e.output_error


def test_auto_stop_idle_streams():
    e = AudioEngine()
    t = e.start_tuner()
    assert e.device.input_running
    e.stop_tuner()
    assert not e.device.input_running   # no consumers left → auto stop
    e.create_metronome(120.0, [3, 1], [], 1.0, False)
    assert e.device.output_running
    e.stop_metronome()
    e.advance(0.1)   # metronome source drops after Stop command processes
    e.clean_output()
    assert not e.device.output_running


# ── checkpoint / resume ──────────────────────────────────────────────────

def test_pitch_analyzer_checkpoint_roundtrip(tmp_path):
    x = gen.tone_with_harmonics(220.0, 1.0, SR, harmonics=6, amplitude=0.4)
    a, b = np.split(x, [len(x) // 2])

    an1 = PitchAnalyzer(SR)
    an1.process(a)
    path = str(tmp_path / "pitch.npz")
    checkpoint.save_pitch_analyzer(path, an1)
    an2 = checkpoint.load_pitch_analyzer(path)
    out_resumed = an2.process(b)

    an_full = PitchAnalyzer(SR)
    an_full.process(a)
    out_full = an_full.process(b)
    np.testing.assert_array_equal(out_resumed.stable_freqs,
                                  out_full.stable_freqs)
    np.testing.assert_array_equal(out_resumed.stable_valid,
                                  out_full.stable_valid)
    assert an2.frames_consumed == an_full.frames_consumed


def test_onset_analyzer_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(int(SR)) * 1e-4).astype(np.float32)
    click = gen.calibration_click(SR, volume=0.8)
    x[30000:30000 + len(click)] += click
    a, b = np.split(x, [20000])

    an1 = OnsetAnalyzer(SR)
    an1.process(a)
    path = str(tmp_path / "onset.npz")
    checkpoint.save_onset_analyzer(path, an1)
    an2 = checkpoint.load_onset_analyzer(path)
    out_resumed = an2.process(b)

    an_full = OnsetAnalyzer(SR)
    an_full.process(a)
    out_full = an_full.process(b)
    np.testing.assert_array_equal(out_resumed.fired, out_full.fired)


def test_transport_checkpoint_roundtrip(tmp_path):
    t = MusicalTransport(93.0, SR)
    t.play()
    t.tick_output(48000, 1.0)
    t.tick_input(47000)
    t.notify_tick_at_frame(24000)
    t.set_calibration_offset(123)
    path = str(tmp_path / "transport.json")
    checkpoint.save_transport(path, t)
    t2 = checkpoint.load_transport(path)
    assert t2.get_bpm() == t.get_bpm()
    assert t2.get_accumulated_beats() == t.get_accumulated_beats()
    assert t2.get_output_frames() == t.get_output_frames()
    assert t2.get_calibration_offset() == 123
    assert t2.is_calibrated()
    assert (t2.nearest_tick_distance_beats(0.775)
            == t.nearest_tick_distance_beats(0.775))


def test_engine_checkpoint_roundtrip(tmp_path):
    """Engine-level snapshot: reducer/AGC histories + transport + active
    tuner/onset consumer state restore into a fresh engine, and continued
    analysis matches the uninterrupted run exactly."""
    tone = gen.tone_with_harmonics(261.63, 4.0, SR, harmonics=6,
                                   amplitude=0.35)

    def build():
        e = AudioEngine(input_source=ArraySource(tone))
        e.transport.set_calibration_offset(10)   # skip calibration phase
        e.start_tuner()
        e.start_onset_detection()
        return e

    e1 = build()
    e1.advance(1.5)
    path = str(tmp_path / "engine.npz")
    checkpoint.save_engine(path, e1)

    e2 = build()
    checkpoint.load_engine(path, e2)
    # Restored engine mirrors the live one...
    assert e2.transport.get_input_frames() == e1.transport.get_input_frames()
    assert e2.dynamics_out == e1.dynamics_out
    assert e2.dynamics.play_pos == e1.dynamics.play_pos
    np.testing.assert_array_equal(e2.dynamics.play, e1.dynamics.play)
    # ...and continues identically to the uninterrupted engine.
    # (Advance both from the same input position: ArraySource is positional.)
    e2.device.input_source.pos = e1.device.input_source.pos
    e1.advance(1.0)
    e2.advance(1.0)
    assert e1.poll_dynamics() == e2.poll_dynamics()
    assert (e1.active_tuner.poll_output() == e2.active_tuner.poll_output())
    assert (e1.active_onset.poll_onsets() == e2.active_onset.poll_onsets())


def test_engine_checkpoint_config_mismatch(tmp_path):
    e1 = AudioEngine(input_source=ArraySource(np.zeros(4096, np.float32)))
    path = str(tmp_path / "engine.npz")
    checkpoint.save_engine(path, e1)
    e2 = AudioEngine(input_source=ArraySource(np.zeros(4096, np.float32)),
                     sample_rate=44100.0)
    with pytest.raises(ValueError):
        checkpoint.load_engine(path, e2)
