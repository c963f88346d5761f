"""Dev-tools visualization tests (component #30: debug telemetry + PNG)."""

import json
import os

import numpy as np

from audio_analyzer_rs_tpu.devtools import (DebugRecorder, OnsetFrameRecord,
                                            export_frame_png,
                                            freq_to_note_label, onset_status)
from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.models.analyzer import PitchAnalyzer
from audio_analyzer_rs_tpu.ops.fft import hann_window

SR = 44100.0


def test_freq_to_note_label():
    assert freq_to_note_label(440.0) == "A4"
    assert freq_to_note_label(0.0) == "?"
    label = freq_to_note_label(445.0)
    assert label.startswith("A4") and "¢" in label


def test_onset_status_labels():
    assert onset_status(True, True, False, True, 5, 12.0, 4).startswith("DETECTED")
    assert onset_status(False, True, True, True, 5, 12.0, 4) == "blocked: tick"
    assert onset_status(False, True, False, False, 5, 12.0, 4) == "blocked: energy"
    assert "frame gate" in onset_status(False, True, False, True, 1, 12.0, 4)
    assert "candidate" in onset_status(False, False, False, False, 5, 3.0, 1)
    assert onset_status(False, False, False, False, 5, 0.0, 0) == "idle"


def test_pitch_analyzer_records_debug_frames():
    rec = DebugRecorder()
    an = PitchAnalyzer(SR, debug_recorder=rec)
    x = gen.tone_with_harmonics(220.0, 0.5, SR, harmonics=6, amplitude=0.4)
    an.process(x)
    assert len(rec.pitch_frames) > 0
    pf = rec.pitch_frames[-1]
    assert pf.magnitudes.shape == (1025,)
    assert pf.noise_floor.shape == (1025,)
    assert any(abs(f - 220.0) < 5.0 for f, _ in pf.stable_pitches)
    jsonl = rec.drain_jsonl()
    first = json.loads(jsonl.splitlines()[0])
    assert first["kind"] == "pitch" and "stable_pitches" in first
    assert len(rec.pitch_frames) == 0


def test_export_frame_png(tmp_path):
    rec = DebugRecorder()
    an = PitchAnalyzer(SR, debug_recorder=rec)
    x = gen.tone_with_harmonics(330.0, 0.3, SR, harmonics=6, amplitude=0.4)
    an.process(x)
    pf = rec.pitch_frames[-1]
    raw = x[:2048]
    windowed = raw * hann_window(2048)
    path = os.path.join(tmp_path, "frame_0.png")
    export_frame_png(path, raw, windowed, pf.magnitudes, pf.bin_width,
                     pf.noise_floor, pf.stable_pitches, frame=0)
    assert os.path.getsize(path) > 10_000


def test_onset_record_roundtrip():
    rec = DebugRecorder()
    rec.log_onset_frame(OnsetFrameRecord(
        frame=7, flux=12.5, burst_count=4, detected=True, fired=True,
        status="DETECTED flux=12.5 burst=4"))
    line = json.loads(rec.drain_jsonl())
    assert line["kind"] == "onset" and line["fired"] is True


def test_jsonl_stream_recorder_is_live(tmp_path):
    """The live sink (Rerun-viewer analog) must flush each record as it is
    logged — a tail-er sees frames mid-analysis, before any drain."""
    import json

    import numpy as np

    from audio_analyzer_rs_tpu.api.device import ArraySource
    from audio_analyzer_rs_tpu.api.engine import AudioEngine
    from audio_analyzer_rs_tpu.devtools import JsonlStreamRecorder
    from audio_analyzer_rs_tpu.models import generators as gen

    sr = 48000.0
    # Quiet lead-in, then the note attacks at 0.3 s: the burst floors see a
    # real attack (a tone from sample 0 initializes the floors to itself).
    tone = np.zeros(int(1.2 * sr), np.float32)
    note = gen.tone_with_harmonics(440.0, 0.9, sr, harmonics=5, amplitude=0.4)
    tone[int(0.3 * sr):int(0.3 * sr) + len(note)] = note
    path = str(tmp_path / "debug.jsonl")
    e = AudioEngine(input_source=ArraySource(tone), sample_rate=sr)
    e.transport.set_calibration_offset(1)
    rec = JsonlStreamRecorder(path)
    e.attach_debug_recorder(rec)
    e.start_tuner()
    e.start_onset_detection()

    e.advance(0.5)
    mid = open(path).read().splitlines()      # read while still running
    assert len(mid) > 0, "no live records after 0.5s"
    e.advance(0.5)
    end = open(path).read().splitlines()
    assert len(end) > len(mid), "stream did not grow while running"

    records = [json.loads(l) for l in end]
    kinds = {r["kind"] for r in records}
    assert kinds == {"pitch", "onset"}
    pitch = [r for r in records if r["kind"] == "pitch"]
    assert any(r["stable_pitches"] for r in pitch), "no pitches streamed"
    lbls = [p["label"] for r in pitch for p in r["stable_pitches"]]
    assert any(l.startswith("A4") for l in lbls), lbls
    onset = [r for r in records if r["kind"] == "onset"]
    assert {"flux", "burst_count", "status", "fired"} <= set(onset[0])
    assert any(r["status"] != "idle" for r in onset)
    rec.close()
