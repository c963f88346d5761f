"""Practice engine tests — ports of the reference's inline test suites
(conditioner.rs:331-499, matcher.rs:179-335, buffer.rs:322-522,
clock.rs:219-383, mode.rs:512-690)."""

import pytest

from audio_analyzer_rs_tpu.practice.buffer import MeasureBuffer, PENDING
from audio_analyzer_rs_tpu.practice.clock import ClockConfig, ClockManager
from audio_analyzer_rs_tpu.practice.conditioner import InputConditioner
from audio_analyzer_rs_tpu.practice.matcher import resolve
from audio_analyzer_rs_tpu.practice.mode import ModeController, TickInputs
from audio_analyzer_rs_tpu.practice.types import (
    DoubledNote, ExtraNote, Matched, Play, SeekToBeat, SetBpm, Stop,
    TrackedNoteStart, TunerFrame, practice_mode_from_str)
from audio_analyzer_rs_tpu.transport import MusicalTransport, OnsetEvent
from audio_analyzer_rs_tpu.utils.midi import Measure, SynthNote


def mk_transport():
    return MusicalTransport(120.0, 48000.0)


def measure_with_notes(notes, start):
    """notes: [(start_beat_in_measure, duration, freq)]."""
    return Measure(
        notes=[SynthNote(freq=f, start_beat_in_measure=s, duration_beats=d,
                         velocity=0.5, instrument="Piano")
               for (s, d, f) in notes],
        time_signature=(4, 4), bpm=120.0, global_start_beat=start)


def dummy_measure(start, n):
    return measure_with_notes([(float(i), 1.0, 440.0) for i in range(n)], start)


def ts(midi, beat, seq=0):
    return TrackedNoteStart(seq=seq, midi_note=midi, start_beat=beat,
                            start_source="Onset", initial_cents=0.0)


def onset(beat, vel=0.7):
    return OnsetEvent(beat_position=beat, raw_sample_offset=0,
                      output_samples=0, velocity=vel)


def frame(notes, beat):
    return TunerFrame(notes=notes, tuner_beat=beat)


# ── types ────────────────────────────────────────────────────────────────

def test_practice_mode_parsing():
    assert practice_mode_from_str("FollowAlong") == "FollowAlong"
    assert practice_mode_from_str("performance") == "Performance"
    assert practice_mode_from_str("RUBATO") == "Rubato"
    assert practice_mode_from_str("invalid") is None


# ── conditioner (ref conditioner.rs tests) ───────────────────────────────

def test_conditioner_no_inputs_empty():
    c = InputConditioner(mk_transport())
    assert c.ingest(None, []) == []


def test_conditioner_dedups_repeat_frames():
    c = InputConditioner(mk_transport())
    f = frame([], 1.0)
    c.ingest(f, [])
    assert c.ingest(f, []) == []


def test_conditioner_stable_5_frames_starts():
    c = InputConditioner(mk_transport())
    for i in range(4):
        assert c.ingest(frame([(60, 0.0)], i * 0.02), []) == []
    evs = c.ingest(frame([(60, 0.0)], 4 * 0.02), [])
    assert len(evs) == 1
    kind, s = evs[0]
    assert kind == "Started" and s.midi_note == 60
    assert abs(s.start_beat - 0.0) < 1e-9
    assert s.start_source == "StableFiveFrame"


def test_conditioner_onset_claim():
    c = InputConditioner(mk_transport())
    c.ingest(None, [onset(0.01)])
    started = None
    for i in range(5):
        for kind, e in c.ingest(frame([(60, 0.0)], 0.02 + i * 0.02), []):
            if kind == "Started":
                started = e
    assert started is not None
    assert started.start_source == "Onset"
    assert abs(started.start_beat - 0.01) < 1e-9


def test_conditioner_transient_cluster():
    c = InputConditioner(mk_transport())
    for i in range(4):
        c.ingest(frame([(50 + i, 0.0)], i * 0.02), [])
        c.ingest(frame([], (i + 0.5) * 0.02), [])
    started = None
    for i in range(5):
        for kind, e in c.ingest(frame([(60, 0.0)], 0.5 + i * 0.02), []):
            if kind == "Started":
                started = e
    assert started is not None
    assert started.start_source == "TransientCluster"
    assert abs(started.start_beat - 0.0) < 1e-9


def test_conditioner_glide_pivot_end():
    c = InputConditioner(mk_transport())
    for i in range(5):
        c.ingest(frame([(60, 30.0)], i * 0.02), [])
    for i, cents in enumerate([-50.0, -40.0, -30.0, -20.0]):
        c.ingest(frame([(61, cents)], 5 * 0.02 + i * 0.02), [])
    evs = c.ingest(frame([(61, -10.0)], 9 * 0.02), [])
    ended_c4 = [e for k, e in evs if k == "Ended" and e.midi_note == 60]
    started_csharp = [e for k, e in evs if k == "Started" and e.midi_note == 61]
    assert ended_c4 and abs(ended_c4[0].avg_cents - 30.0) < 1.0
    assert started_csharp


def test_conditioner_end_after_5_absent_frames():
    c = InputConditioner(mk_transport())
    for i in range(5):
        c.ingest(frame([(60, 0.0)], i * 0.02), [])
    ended = None
    for i in range(5, 10):
        for kind, e in c.ingest(frame([], i * 0.02), []):
            if kind == "Ended":
                ended = e
    assert ended is not None and ended.midi_note == 60
    assert abs(ended.end_beat - 0.10) < 1e-9


# ── matcher (ref matcher.rs tests) ───────────────────────────────────────

def test_matcher_in_window_correct_pitch():
    buf = MeasureBuffer([measure_with_notes([(0.0, 1.0, 261.626)], 0.0)], 0, 0)
    out = resolve(ts(60, 0.05), buf, (0, 0))
    assert isinstance(out, Matched)
    assert out.key == (0, 0) and out.pitch_correct


def test_matcher_lookahead_with_skip():
    buf = MeasureBuffer([measure_with_notes(
        [(0.0, 1.0, 261.626), (1.0, 1.0, 293.665), (2.0, 1.0, 329.628)],
        0.0)], 0, 0)
    buf.record_match((0, 0), ts(60, 0.0), True)
    out = resolve(ts(64, 2.05), buf, (0, 1))
    assert isinstance(out, Matched)
    assert out.key == (0, 2)
    assert out.skipped_keys == [(0, 1)]
    assert out.pitch_correct


def test_matcher_extra_note_in_rest():
    buf = MeasureBuffer([measure_with_notes([(0.0, 0.5, 261.626)], 0.0)], 0, 0)
    out = resolve(ts(60, 2.0), buf, (0, 0))
    assert isinstance(out, ExtraNote) and out.during is None


def test_matcher_doubled_within_freshness():
    buf = MeasureBuffer([measure_with_notes([(0.0, 1.0, 261.626)], 0.0)], 0, 0)
    buf.record_match((0, 0), ts(60, 0.0), True)
    out = resolve(ts(60, 0.2), buf, (0, 0))
    assert isinstance(out, DoubledNote) and out.key == (0, 0)


def test_matcher_doubled_beyond_freshness_is_extra():
    buf = MeasureBuffer([measure_with_notes([(0.0, 4.0, 261.626)], 0.0)], 0, 0)
    buf.record_match((0, 0), ts(60, 0.0), True)
    out = resolve(ts(60, 0.6), buf, (0, 0))
    assert not isinstance(out, DoubledNote)


def test_matcher_upgrade():
    buf = MeasureBuffer([measure_with_notes([(0.0, 1.0, 261.626)], 0.0)], 0, 0)
    buf.record_match((0, 0), ts(62, 0.05), False)
    out = resolve(ts(60, 0.10), buf, (0, 0))
    assert isinstance(out, Matched)
    assert out.key == (0, 0) and out.pitch_correct and out.upgrade


def test_matcher_in_window_wrong_pitch():
    buf = MeasureBuffer([measure_with_notes([(0.0, 1.0, 261.626)], 0.0)], 0, 0)
    out = resolve(ts(62, 0.05), buf, (0, 0))
    assert isinstance(out, Matched) and not out.pitch_correct


# ── buffer (ref buffer.rs tests) ─────────────────────────────────────────

def test_buffer_populates_current_and_future():
    buf = MeasureBuffer([dummy_measure(0.0, 2), dummy_measure(4.0, 3),
                         dummy_measure(8.0, 1)], 0, 2)
    assert buf.current_idx == 0 and buf.future_idx == 1 and buf.past_idx is None
    assert buf.slot((0, 0)) is not None and buf.slot((1, 2)) is not None
    assert buf.slot((2, 0)) is None
    assert buf.slot((0, 0)).status.kind == PENDING


def test_buffer_advance_cycles():
    buf = MeasureBuffer([dummy_measure(0.0, 1), dummy_measure(4.0, 1),
                         dummy_measure(8.0, 1)], 0, 2)
    assert buf.advance(2.0) == []
    aged = buf.advance(4.5)
    assert len(aged) == 1 and aged[0].measure_index == 0
    assert buf.current_idx == 1 and buf.past_idx == 0 and buf.future_idx == 2


def test_buffer_advance_expected_notes():
    buf = MeasureBuffer([dummy_measure(0.0, 2), dummy_measure(4.0, 1)], 0, 1)
    aged = buf.advance(4.5)
    assert len(aged[0].expected_notes) == 2


def test_buffer_match_upgrade_missed():
    buf = MeasureBuffer([dummy_measure(0.0, 2)], 0, 0)
    buf.record_match((0, 0), ts(60, 0.0), True)
    s = buf.slot((0, 0))
    assert s.status.kind == "Matched" and s.status.pitch_correct
    assert s.matched_start_beat == 0.0 and s.matched_seq == 0
    buf.record_match((0, 1), ts(61, 0.05, seq=1), False)
    buf.upgrade_match((0, 1), ts(60, 0.1, seq=2))
    s = buf.slot((0, 1))
    assert s.status.pitch_correct and s.matched_seq == 2
    buf.mark_missed((0, 0))
    assert buf.slot((0, 0)).status.kind == "Missed"


def test_buffer_next_pending():
    buf = MeasureBuffer([dummy_measure(0.0, 4)], 0, 0)
    buf.record_match((0, 0), ts(60, 0.0), True)
    assert buf.next_pending_after((0, 0)) == (0, 1)
    buf.mark_missed((0, 1))
    assert buf.next_pending_after((0, 0)) == (0, 2)


def test_buffer_next_pending_crosses_measures():
    buf = MeasureBuffer([dummy_measure(0.0, 1), dummy_measure(4.0, 2)], 0, 1)
    assert buf.next_pending_after((0, 0)) == (1, 0)


def test_buffer_measure_for_beat():
    buf = MeasureBuffer([dummy_measure(0.0, 1), dummy_measure(4.0, 1),
                         dummy_measure(8.0, 1)], 0, 2)
    assert buf.measure_for_beat(2.0) == 0
    assert buf.measure_for_beat(5.0) == 1
    assert buf.measure_for_beat(9.0) == 0    # fallback — not in window yet
    assert buf.measure_for_beat(4.0) == 1    # boundary belongs to measure 1
    buf.advance(4.5)
    assert buf.measure_for_beat(2.0) == 0
    assert buf.measure_for_beat(5.0) == 1
    assert buf.measure_for_beat(9.0) == 2


def test_buffer_done_after_practice_end():
    buf = MeasureBuffer([dummy_measure(0.0, 1), dummy_measure(4.0, 1)], 0, 1)
    assert not buf.is_done()
    buf.advance(4.5)
    assert not buf.is_done()
    aged = buf.advance(8.5)
    assert len(aged) == 1 and buf.is_done()
    assert buf.advance(20.0) == []


def test_buffer_candidates_kinds():
    buf = MeasureBuffer([dummy_measure(0.0, 4)], 0, 0)
    buf.record_match((0, 0), ts(60, 0.0), True)
    cands = buf.candidates(1.5, (0, 1))
    keys = {c.key: c.kind for c in cands}
    assert keys[(0, 1)] == "InWindow"
    assert keys[(0, 2)] == "Lookahead"
    assert keys[(0, 3)] == "Lookahead"
    assert keys[(0, 0)] == "Lookbehind"


# ── clock (ref clock.rs tests) ───────────────────────────────────────────

def mk_clock():
    return ClockManager(mk_transport(), ClockConfig(), 120.0)


def matched(key, timing_err=0.0):
    return Matched(key=key, timing_err=timing_err, pitch_correct=True,
                   upgrade=False, skipped_keys=[])


def exp_note(beat, dur):
    from audio_analyzer_rs_tpu.practice.metrics import ExpectedNote
    return ExpectedNote(beat_position=beat, duration_beats=dur,
                        midi_note=60, dynamic=None)


def test_clock_initial_t_stu():
    assert abs(mk_clock().t_stu_bpm() - 120.0) < 1e-6


def test_clock_local_tempo_ewma():
    cm = mk_clock()
    cm.on_match(matched((0, 0)), exp_note(0.0, 1.0), 0.0, "FollowAlong")
    cm.on_match(matched((0, 1)), exp_note(1.0, 1.0), 1.5, "FollowAlong")
    # local tempo 80; EWMA = 0.4*80 + 0.6*120 = 104.
    assert abs(cm.t_stu_bpm() - 104.0) < 0.5


def test_clock_doubled_followalong_seeks_back():
    cm = mk_clock()
    from audio_analyzer_rs_tpu.practice.buffer import NoteSlot, SlotStatus
    slot = NoteSlot(SlotStatus("Matched", True), matched_start_beat=2.0,
                    matched_seq=0)
    actions = cm.on_doubled(slot, "FollowAlong")
    seeks = [a.beat for a in actions if isinstance(a, SeekToBeat)]
    assert seeks == [2.001]
    assert any(isinstance(a, Play) for a in actions)
    assert cm.on_doubled(slot, "Performance") == []


def test_clock_stop_before_next_unplayed():
    buf = MeasureBuffer([measure_with_notes(
        [(0.0, 1.0, 261.626), (1.0, 1.0, 293.665), (2.0, 1.0, 329.628)],
        0.0)], 0, 0)
    cm = mk_clock()
    actions = cm.on_tick(buf, (0, 1), 1.999, "FollowAlong")
    assert any(isinstance(a, Stop) for a in actions)


def test_clock_within_threshold_no_seek():
    cm = mk_clock()
    cm.on_match(matched((0, 0)), exp_note(0.0, 1.0), 0.0, "FollowAlong")
    actions = cm.on_match(matched((0, 1), timing_err=0.10), exp_note(1.0, 1.0),
                          1.10, "FollowAlong")
    assert not any(isinstance(a, SeekToBeat) for a in actions)


def test_clock_early_seeks_minus_epsilon():
    cm = mk_clock()
    cm.on_match(matched((0, 0)), exp_note(0.0, 1.0), 0.0, "FollowAlong")
    actions = cm.on_match(matched((0, 1), timing_err=-0.3), exp_note(1.0, 1.0),
                          0.7, "FollowAlong")
    seeks = [a.beat for a in actions if isinstance(a, SeekToBeat)]
    assert seeks and abs(seeks[0] - 0.999) < 1e-9


def test_clock_late_seeks_plus_epsilon():
    cm = mk_clock()
    cm.on_match(matched((0, 0)), exp_note(0.0, 1.0), 0.0, "FollowAlong")
    actions = cm.on_match(matched((0, 1), timing_err=0.3), exp_note(1.0, 1.0),
                          1.3, "FollowAlong")
    seeks = [a.beat for a in actions if isinstance(a, SeekToBeat)]
    assert seeks and abs(seeks[0] - 1.001) < 1e-9


def test_clock_three_late_notes_set_bpm():
    cm = mk_clock()
    cm.on_match(matched((0, 0)), exp_note(0.0, 1.0), 0.0, "FollowAlong")
    last_actions = []
    for i, (real, expected_b) in enumerate([(1.5, 1.0), (3.0, 2.0), (4.5, 3.0)]):
        last_actions = cm.on_match(matched((0, i + 1)),
                                   exp_note(expected_b, 1.0), real,
                                   "FollowAlong")
    assert any(isinstance(a, SetBpm) for a in last_actions)


def test_clock_rubato_always_seeks():
    cm = mk_clock()
    cm.on_match(matched((0, 0)), exp_note(0.0, 1.0), 0.0, "Rubato")
    actions = cm.on_match(matched((0, 1), timing_err=0.01), exp_note(1.0, 1.0),
                          1.01, "Rubato")
    assert any(isinstance(a, SeekToBeat) for a in actions)


# ── mode controller (ref mode.rs tests) ──────────────────────────────────

def three_quarter_notes():
    return [measure_with_notes(
        [(0.0, 1.0, 261.626), (1.0, 1.0, 293.665), (2.0, 1.0, 329.628)], 0.0)]


def make_mc(mode):
    transport = mk_transport()
    transport.play()
    buffer = MeasureBuffer(three_quarter_notes(), 0, 0)
    conditioner = InputConditioner(transport)
    clock = ClockManager(transport, ClockConfig(), 120.0)
    return ModeController(mode, "Beginner", transport, conditioner, buffer,
                          clock, 0)


def test_mode_perfect_play_advances_frontier():
    mc = make_mc("FollowAlong")
    for i in range(5):
        mc.tick(TickInputs(transport_beat=i * 0.02,
                           tuner_frame=frame([(60, 0.0)], i * 0.02),
                           new_onsets=[], dynamic_level=-1))
    assert mc.frontier == (0, 1)


def test_mode_aged_pending_emits_missing_notes():
    mc = make_mc("Performance")
    mc.tick(TickInputs(transport_beat=1.0, tuner_frame=None, new_onsets=[],
                       dynamic_level=-1))
    assert mc.feedback == []
    out = mc.tick(TickInputs(transport_beat=4.5, tuner_frame=None,
                             new_onsets=[], dynamic_level=-1))
    assert len(out.aged_measures) == 1
    missing = [f for f in mc.feedback if f.error_type == "MissingNote"]
    assert len(missing) == 3


def test_mode_performance_never_seeks():
    mc = make_mc("Performance")
    initial = mc.transport.get_accumulated_beats()
    for i in range(5):
        mc.tick(TickInputs(transport_beat=5.0 + i * 0.02,
                           tuner_frame=frame([(60, 0.0)], 5.0 + i * 0.02),
                           new_onsets=[], dynamic_level=-1))
    assert abs(mc.transport.get_accumulated_beats() - initial) < 1e-6


def test_mode_boundary_bucketing():
    measures = [measure_with_notes([(0.0, 1.0, 261.626)], 0.0),
                measure_with_notes([(0.0, 1.0, 261.626)], 4.0)]
    buf = MeasureBuffer(measures, 0, 1)
    assert buf.measure_for_beat(4.05) == 1
    assert buf.measure_for_beat(3.95) == 0
