"""Practice-mode behaviors end-to-end: Rubato seeks, count-off with
metronome, realtime runner."""

import json
import time

import numpy as np
import pytest

from audio_analyzer_rs_tpu.api.device import ArraySource
from audio_analyzer_rs_tpu.api.engine import AudioEngine
from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.utils.midi import write_midi_file

SR = 48000.0


def _midi(tmp_path, notes, bpm=120.0):
    path = str(tmp_path / "ref.mid")
    write_midi_file(path, notes, bpm=bpm)
    return path


def _engine_with_performance(perf):
    e = AudioEngine(input_source=ArraySource(perf))
    e.transport.set_calibration_offset(1)
    e.transport.set_input_latency(0)
    e.transport.set_output_latency(0)
    return e


def test_rubato_seeks_to_played_note(tmp_path):
    """Rubato always re-anchors the transport to the matched note's beat
    (ref clock.rs:190-199) — play the 2nd note late and check the seek."""
    midi = _midi(tmp_path, [(60, 0.0, 0.9, 90), (64, 1.0, 0.9, 90),
                            (67, 2.0, 0.9, 90), (72, 3.0, 0.9, 90)])
    perf = np.zeros(int(SR * 4.0), dtype=np.float32)
    t1 = gen.tone_with_harmonics(261.63, 0.4, SR, harmonics=6, amplitude=0.35)
    t2 = gen.tone_with_harmonics(329.63, 0.4, SR, harmonics=6, amplitude=0.35)
    perf[:len(t1)] += t1
    late = int(0.85 * SR)              # note 2 ~0.35s late (beat ~1.7)
    perf[late:late + len(t2)] += t2

    e = _engine_with_performance(perf)
    session = e.create_practice_session(midi, "Piano", 0, "Rubato",
                                        "Advanced", 120.0)
    session.start(0, 0)
    e.advance(1.2)
    snap = json.loads(session.poll_transport())
    # After matching the late E4 the transport snapped back to ~beat 1.
    assert snap["beat_position"] < 1.6, snap["beat_position"]
    assert snap["is_playing"] is True  # Rubato drops Stop actions


def test_countoff_with_metronome(tmp_path):
    """Count-off: session seeks to first_beat - countoff - 0.001 and holds
    analysis until the count-off completes (ref practice/mod.rs:235-239,
    481-491); the metronome clicks during the count-off."""
    midi = _midi(tmp_path, [(60, 0.0, 0.9, 90), (64, 1.0, 0.9, 90)])
    perf = np.zeros(int(SR * 4.5), dtype=np.float32)
    # Notes shifted 2 s later (4 count-off beats at 120 BPM).
    t1 = gen.tone_with_harmonics(261.63, 0.4, SR, harmonics=6, amplitude=0.35)
    perf[int(2.0 * SR):int(2.0 * SR) + len(t1)] += t1

    e = _engine_with_performance(perf)
    e.create_metronome(120.0, [3, 1, 1, 1], [], 1.0, False)
    session = e.create_practice_session(midi, "Piano", 4, "Performance",
                                        "Advanced", 120.0)
    session.start(0, 0)
    snap = json.loads(session.poll_transport())
    assert snap["in_countoff"] is True
    assert snap["beat_position"] < -3.9   # seeked to -countoff - 0.001
    e.advance(1.0)
    assert json.loads(session.poll_transport())["in_countoff"] is True
    e.advance(1.2)
    assert json.loads(session.poll_transport())["in_countoff"] is False
    e.advance(1.0)
    errors = json.loads(session.poll_errors())
    matched = [x for x in errors if x["error_type"] == "None"]
    assert matched, errors   # the note after count-off was matched


def test_run_realtime_wall_clock():
    e = AudioEngine()
    e.start_output()
    t0 = time.monotonic()
    e.run_realtime(0.25)
    elapsed = time.monotonic() - t0
    assert 0.2 <= elapsed < 1.5
    # Virtual time advanced by the same amount.
    assert abs(e.device.samples_elapsed / SR - 0.235) < 0.05
