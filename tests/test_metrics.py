"""Metrics tests — ports of the reference metrics.rs test suite
(ref src/practice/metrics.rs:701-1113)."""

from audio_analyzer_rs_tpu.practice.metrics import (
    DynamicsEvent, ExpectedNote, MeasureData, NoteEvent, _std_dev,
    compute_metrics)
from audio_analyzer_rs_tpu.transport import OnsetEvent

MF, PPP, FFF = 4, 0, 7  # dynamic level indices


def onset(beat):
    return OnsetEvent(beat_position=beat, raw_sample_offset=0,
                      output_samples=0, velocity=0.8)


def note_event(beat, midi, cents):
    return NoteEvent(beat_position=beat, midi_note=midi, avg_cents=cents)


def expected(beat, midi, dur, dyn=None):
    return ExpectedNote(beat_position=beat, duration_beats=dur,
                        midi_note=midi, dynamic=dyn)


def md(**kw):
    return MeasureData(measure_index=kw.pop("measure_index", 0), **kw)


def compute(measures):
    return compute_metrics(0, 0, 120.0, measures)


def test_accuracy_all_matched_100():
    m = md(onsets=[onset(0.0), onset(1.0)],
           notes=[note_event(0.0, 60, 0.0), note_event(1.0, 64, 0.0)],
           expected_notes=[expected(0.0, 60, 1.0), expected(1.0, 64, 1.0)])
    assert abs(compute([m])["accuracy_percent"] - 100.0) < 1e-9


def test_accuracy_none_detected_0():
    m = md(expected_notes=[expected(0.0, 60, 1.0), expected(1.0, 64, 1.0)])
    r = compute([m])
    assert abs(r["accuracy_percent"]) < 1e-9
    assert r["num_notes_missed"] == 2


def test_accuracy_no_expected_100():
    assert abs(compute([md()])["accuracy_percent"] - 100.0) < 1e-9


def test_accuracy_half_matched_50():
    m = md(onsets=[onset(0.0)], notes=[note_event(0.0, 60, 0.0)],
           expected_notes=[expected(0.0, 60, 1.0), expected(1.0, 64, 1.0)])
    assert abs(compute([m])["accuracy_percent"] - 50.0) < 1e-9


def test_neighbor_pitch_counts_as_matched():
    # Timing-shifted neighbor: detected midi equals expected[ei+1].
    m = md(notes=[note_event(0.0, 64, 0.0)],
           expected_notes=[expected(0.0, 60, 1.0), expected(1.0, 64, 1.0)])
    r = compute([m])
    # First expected note matched via neighbor pitch; second unmatched.
    assert abs(r["accuracy_percent"] - 50.0) < 1e-9


def test_num_notes_missed_zero_when_matched():
    m = md(notes=[note_event(0.0, 60, 0.0)],
           expected_notes=[expected(0.0, 60, 1.0)])
    assert compute([m])["num_notes_missed"] == 0


def test_avg_cent_dev():
    m = md(notes=[note_event(0.0, 60, 10.0), note_event(1.0, 64, -30.0)])
    assert abs(compute([m])["avg_cent_dev"] - 20.0) < 1e-9
    assert abs(compute([md()])["avg_cent_dev"]) < 1e-9


def test_timing_consistency_zero_on_beat():
    m = md(onsets=[onset(0.0), onset(1.0)],
           expected_notes=[expected(0.0, 60, 1.0), expected(1.0, 64, 1.0)])
    assert compute([m])["timing_consistency"] < 1e-9


def test_microtiming_skew_rushing_negative():
    m = md(onsets=[onset(0.9), onset(1.9)],
           expected_notes=[expected(1.0, 60, 1.0), expected(2.0, 64, 1.0)])
    assert abs(compute([m])["microtiming_skew"] - (-0.1)) < 1e-9


def test_microtiming_skew_zero_without_onsets():
    m = md(expected_notes=[expected(1.0, 60, 1.0)])
    assert abs(compute([m])["microtiming_skew"]) < 1e-9


def test_dynamics_accuracy_within_one_step():
    m = md(dynamics=[DynamicsEvent(0.0, MF)],
           expected_notes=[expected(0.5, 60, 1.0, dyn=MF)])
    assert abs(compute([m])["dynamics_accuracy"] - 100.0) < 1e-9


def test_dynamics_accuracy_large_mismatch():
    m = md(dynamics=[DynamicsEvent(0.0, PPP)],
           expected_notes=[expected(0.5, 60, 1.0, dyn=FFF)])
    assert abs(compute([m])["dynamics_accuracy"]) < 1e-9


def test_tempo_stability_constant_is_one():
    # Two measures, perfect onsets → tempo map at reference bpm → stability 1.
    ms = [md(measure_index=i,
             onsets=[onset(i * 4.0), onset(i * 4.0 + 1.0)],
             expected_notes=[expected(i * 4.0, 60, 1.0),
                             expected(i * 4.0 + 1.0, 64, 1.0)])
          for i in range(2)]
    r = compute_metrics(0, 1, 120.0, ms)
    assert abs(r["tempo_stability"] - 1.0) < 1e-9
    assert all(abs(t - 120.0) < 1e-9 for t in r["measure_tempo_map"])


def test_tempo_map_dragging_measure():
    # Onsets span 1.2 beats where 1.0 expected → tempo = 120 * 1/1.2 = 100.
    m = md(onsets=[onset(0.0), onset(1.2)],
           expected_notes=[expected(0.0, 60, 1.0), expected(1.0, 64, 1.0)])
    r = compute([m])
    assert abs(r["measure_tempo_map"][0] - 100.0) < 1e-6


def test_std_dev():
    assert _std_dev([5.0]) == 0.0
    assert _std_dev([3.0, 3.0, 3.0]) == 0.0
    assert abs(_std_dev([2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]) - 2.0) < 1e-6


def test_compute_perfect_performance():
    m = md(onsets=[onset(float(i)) for i in range(4)],
           notes=[note_event(float(i), 60 + 2 * i, 0.0) for i in range(4)],
           expected_notes=[expected(float(i), 60 + 2 * i, 1.0)
                           for i in range(4)])
    r = compute([m])
    assert abs(r["accuracy_percent"] - 100.0) < 1e-9
    assert r["num_notes_missed"] == 0
    assert abs(r["avg_cent_dev"]) < 1e-9


def test_tempo_err_count():
    m = md(doubled_note_seqs=[1, 2, 3])
    r = compute([m])
    assert r["tempo_err_count"] == 3
    assert r["tempo_err_measures"] == [0]


def test_hold_err_count():
    m = md(notes=[note_event(0.0, 60, 0.0), note_event(2.0, 64, 0.0)],
           expected_notes=[expected(0.0, 60, 1.0), expected(2.0, 64, 1.0)],
           note_durations=[1.5, 0.5])
    r = compute([m])
    assert r["hold_err_count"] == (1, 1)
    assert r["hold_err_measures"] == [0]


def test_error_measure_categories():
    # Bad intonation in measure 0; bad rhythm in measure 1.
    m0 = md(measure_index=0,
            notes=[note_event(0.0, 60, 40.0)],
            expected_notes=[expected(0.0, 60, 1.0)])
    m1 = md(measure_index=1,
            onsets=[onset(4.2), onset(5.2)],
            expected_notes=[expected(4.0, 60, 1.0), expected(5.0, 64, 1.0)])
    r = compute_metrics(0, 1, 120.0, [m0, m1])
    assert 0 in r["intonation_err_measures"]
    assert 1 in r["rhythm_err_measures"]
    assert r["error_measures"] == sorted(set(
        r["rhythm_err_measures"] + r["note_err_measures"]
        + r["intonation_err_measures"] + r["dynamics_err_measures"]))


def test_dynamics_range_used():
    m = md(dynamics=[DynamicsEvent(0.0, 2), DynamicsEvent(1.0, 6),
                     DynamicsEvent(2.0, -1)])
    r = compute([m])
    assert r["dynamics_range_used"] == ("p", "ff")
    assert compute([md()])["dynamics_range_used"] == ("n/a", "n/a")


def test_num_notes_missed_counts_unmatched(  # ref metrics.rs num_notes_missed_counts_unmatched_expected_notes
        ):
    m = md(onsets=[onset(0.0)], notes=[note_event(0.0, 60, 0.0)],
           expected_notes=[expected(0.0, 60, 1.0), expected(1.0, 64, 1.0),
                           expected(2.0, 67, 1.0)])
    assert compute([m])["num_notes_missed"] == 2


def test_avg_cent_dev_zero_when_no_notes():
    # ref metrics.rs avg_cent_dev_zero_when_no_notes
    assert abs(compute([md()])["avg_cent_dev"]) < 1e-9


def test_tempo_stability_less_than_one_with_variance():
    # ref metrics.rs tempo_stability_less_than_one_with_variance: measures
    # played at different effective tempos lower the 1-CV stability.
    def measure_at_ratio(idx, start, ratio):
        # Two matched notes spanning the measure at the given time ratio.
        return md(measure_index=idx,
                  onsets=[onset(start + 0.0 * ratio),
                          onset(start + 2.0 * ratio)],
                  notes=[note_event(start + 0.0 * ratio, 60, 0.0),
                         note_event(start + 2.0 * ratio, 64, 0.0)],
                  expected_notes=[expected(start + 0.0, 60, 1.0),
                                  expected(start + 2.0, 64, 1.0)])
    steady = compute([measure_at_ratio(0, 0.0, 1.0),
                      measure_at_ratio(1, 4.0, 1.0)])
    varied = compute([measure_at_ratio(0, 0.0, 1.0),
                      measure_at_ratio(1, 4.0, 1.1)])
    assert abs(steady["tempo_stability"] - 1.0) < 1e-9
    assert varied["tempo_stability"] < steady["tempo_stability"]


def test_compute_all_notes_missed():
    # ref metrics.rs metrics_compute_all_notes_missed
    m = md(expected_notes=[expected(0.0, 60, 1.0), expected(1.0, 64, 1.0),
                           expected(2.0, 67, 1.0)])
    r = compute([m])
    assert abs(r["accuracy_percent"]) < 1e-9
    assert r["num_notes_missed"] == 3
    assert abs(r["avg_cent_dev"]) < 1e-9
