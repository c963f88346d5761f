"""Transport parity tests — ports of the reference timing.rs test suite
(ref src/audio_io/timing.rs:688-786) plus tick-history coverage."""

import math

from audio_analyzer_rs_tpu.transport import MusicalTransport


def test_basic_tick_and_beat_accumulation():
    t = MusicalTransport(120.0, 48000.0)
    t.play()
    t.tick_output(480, 0.0)
    assert abs(t.get_accumulated_beats() - 0.02) < 1e-9


def test_beat_crossing_detection():
    t = MusicalTransport(120.0, 48000.0)
    t.play()
    t.tick_output(23_520, 0.0)
    assert t.did_cross_beat(23_520) is None
    t.tick_output(960, 0.49)
    c = t.did_cross_beat(960)
    assert c is not None
    assert c.beat_number == 1
    assert 0 <= c.sample_offset_in_buffer <= 960


def test_onset_latency_compensation():
    t = MusicalTransport(120.0, 48000.0)
    t.play()
    t.set_input_latency(480)
    t.tick_output(48_000, 0.0)
    t.tick_input(48_000)
    onset = t.stamp_onset(0, 0.8)
    expected = 2.0 - (480.0 / 48000.0) * (120.0 / 60.0)
    assert abs(onset.beat_position - expected) < 1e-6


def test_calibrated_beat_subtracts_total_latency():
    t = MusicalTransport(120.0, 48000.0)
    t.set_input_latency(480)
    t.set_output_latency(240)
    t.set_calibration_offset(96)
    expected = 4.0 - (816.0 / 48000.0) * (120.0 / 60.0)
    assert abs(t.calibrated_beat(4.0) - expected) < 1e-9


def test_calibrated_beat_zero_latency_passthrough():
    t = MusicalTransport(120.0, 48000.0)
    assert abs(t.calibrated_beat(2.5) - 2.5) < 1e-9


def test_snapshot_display_position_leads_audio():
    t = MusicalTransport(120.0, 48000.0)
    t.play()
    t.set_output_latency(480)
    t.set_ui_latency(0.01)
    t.tick_output(24_000, 0.5)
    snap = t.snapshot()
    assert snap.display_beat_position > snap.beat_position


def test_tick_history_and_nearest_distance():
    t = MusicalTransport(120.0, 48000.0)
    assert math.isinf(t.nearest_tick_distance_beats(1.0))
    t.notify_tick_at_frame(24_000)  # 0.5 s @ 120bpm = beat 1.0
    assert abs(t.nearest_tick_distance_beats(1.0)) < 1e-9
    assert abs(t.nearest_tick_distance_beats(1.25) - 0.25) < 1e-9
    # Ring wraps after 8 entries.
    for i in range(10):
        t.notify_tick_at_frame(i * 1000)
    assert math.isfinite(t.nearest_tick_distance_beats(0.0))


def test_reset_clears_state():
    t = MusicalTransport(120.0, 48000.0)
    t.play()
    t.tick_output(48_000, 1.0)
    t.tick_input(100)
    t.notify_tick_at_frame(500)
    t.reset()
    assert t.get_accumulated_beats() == 0.0
    assert t.get_output_frames() == 0
    assert t.get_input_frames() == 0
    assert math.isinf(t.nearest_tick_distance_beats(0.0))


def test_beat_to_output_frame_and_samples_until():
    t = MusicalTransport(120.0, 48000.0)
    t.play()
    t.tick_output(24_000, 0.0)  # beat 1.0
    # Beat 2.0 is 0.5 s away = 24000 samples.
    assert t.samples_until_beat(2.0) == 24_000
    assert t.beat_to_output_frame(2.0) == 48_000
