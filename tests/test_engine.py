"""AudioEngine integration tests — the reference's ffi_tests reworked for the
virtual device (ref src/testing.rs:9-318), plus hardware-free end-to-end
flows the reference could not test (SURVEY §4 calls this out as its biggest
test weakness)."""

import json
import os

import numpy as np
import pytest

from audio_analyzer_rs_tpu.api.device import ArraySource, PushSource
from audio_analyzer_rs_tpu.api.engine import (AudioEngine, AudioEngineError,
                                              SpawnFailed)
from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.utils import wav
from audio_analyzer_rs_tpu.utils.midi import write_midi_file

SR = 48000.0


# ── lifecycle guards (ref testing.rs:127-266) ────────────────────────────

def test_double_create_metronome_errors():
    e = AudioEngine()
    e.create_metronome(120.0, [3, 1, 1, 1], [], 1.0, False)
    with pytest.raises(SpawnFailed, match="Already active"):
        e.create_metronome(120.0, [3, 1, 1, 1], [], 1.0, False)
    e.stop_metronome()
    e.create_metronome(100.0, [3, 1], [], 0.5, False)  # re-create after stop


def test_double_create_tuner_errors():
    e = AudioEngine()
    e.start_tuner()
    with pytest.raises(SpawnFailed, match="Already active"):
        e.start_tuner()
    e.stop_tuner()
    e.start_tuner()


def test_double_create_onset_errors():
    e = AudioEngine()
    e.start_onset_detection()
    with pytest.raises(SpawnFailed, match="Already active"):
        e.start_onset_detection()


def test_unknown_ability_level_errors():
    e = AudioEngine()
    with pytest.raises(AudioEngineError, match="Unknown ability level"):
        e.create_practice_session("/nonexistent.mid", "Piano", 0,
                                  "FollowAlong", "wizard", 120.0)


def test_unknown_practice_mode_errors():
    e = AudioEngine()
    with pytest.raises(AudioEngineError, match="Unknown practice mode"):
        e.create_practice_session("/nonexistent.mid", "Piano", 0,
                                  "freestyle", "Beginner", 120.0)


def test_missing_midi_file_errors_and_cleans_up():
    e = AudioEngine()
    with pytest.raises(AudioEngineError, match="File error"):
        e.create_practice_session("/nonexistent.mid", "Piano", 0,
                                  "FollowAlong", "Beginner", 120.0)
    # Tuner/onset must have been torn down so they can be created again.
    e.start_tuner()
    e.start_onset_detection()


# ── JSON schemas (ref testing.rs:127-266, lib.rs:790-816) ────────────────

def test_poll_transport_schema():
    e = AudioEngine()
    e.start_output()
    e.advance(0.1)
    snap = json.loads(e.poll_transport())
    for field in ("beat_position", "bpm", "is_playing", "output_frames",
                  "input_frames", "drift_samples", "display_beat_position",
                  "ui_latency_compensation_s", "current_beat", "beat_phase",
                  "input_latency_samples", "capture_time_s"):
        assert field in snap, field
    assert snap["is_playing"] is True
    assert snap["output_frames"] > 0


def test_poll_dynamics_schema():
    e = AudioEngine()
    e.start_input()
    e.advance(0.1)
    d = json.loads(e.poll_dynamics())
    assert set(d) == {"level", "rms_db", "gain_db", "session_median_db",
                      "noise_floor_db"}
    assert d["level"] in ("silence", "ppp", "pp", "p", "mp", "mf", "f",
                          "ff", "fff")


def test_tuner_poll_output_schema():
    e = AudioEngine()
    tuner = e.start_tuner()
    e.advance(0.1)
    out = json.loads(tuner.poll_output())
    assert list(out) == ["label", "cents", "notes", "accuracies", "mode",
                         "system", "base_freq", "key", "beat_position"]
    assert out["mode"] == "MultiPitch"
    assert out["base_freq"] == 440.0


def test_poll_onsets_json_format():
    e = AudioEngine()
    onset = e.start_onset_detection()
    assert onset.poll_onsets() == "[]"


def test_consumer_handle_churn(tmp_path):
    """Create/stop cycles must recycle handles without leaking consumers
    (the reference recycles worker handles 0..255 via the reducer remove
    channel, ref stft.rs:138-144)."""
    tone = gen.tone_with_harmonics(220.0, 60.0, SR, harmonics=4,
                                   amplitude=0.3)
    e = AudioEngine(input_source=ArraySource(tone), sample_rate=SR)
    for i in range(30):
        e.start_tuner(); e.advance(0.05); e.stop_tuner()
        e.start_onset_detection(); e.advance(0.05); e.stop_onset_detection()
        e.start_recording(str(tmp_path / f"churn_{i % 2}.wav"))
        e.advance(0.05); e.stop_recording()
    assert len(e._consumers) == 0
    t = e.start_tuner()
    e.advance(1.0)
    assert "A3" in json.loads(t.poll_output())["notes"]


@pytest.mark.parametrize("rate,buf", [(16000.0, 256), (88200.0, 2048)])
def test_engine_at_other_buffer_geometries(rate, buf):
    """Non-default (rate, buffer) combos exercise chunk-geometry paths:
    sub-window buffers must accumulate in the analyzer tails, and
    larger-than-onset-window buffers must not double-consume frames."""
    tone = gen.tone_with_harmonics(220.0, 1.3, rate, harmonics=5,
                                   amplitude=0.3)
    e = AudioEngine(input_source=ArraySource(tone), sample_rate=rate,
                    buffer_size=buf)
    tuner = e.start_tuner()
    e.start_onset_detection()
    e.advance(1.2)
    out = json.loads(tuner.poll_output())
    assert "A3" in out["notes"], (rate, buf, out)
    dyn = json.loads(e.poll_dynamics())
    assert np.isfinite(dyn["rms_db"])


@pytest.mark.parametrize("rate", [22050.0, 44100.0, 96000.0])
def test_engine_at_other_sample_rates(rate):
    """The reference adapts to whatever rate the device reports
    (ref mod.rs:121-128); all analyzers must work at any rate."""
    tone = gen.tone_with_harmonics(220.0, 1.2, rate, harmonics=6,
                                   amplitude=0.3)
    e = AudioEngine(input_source=ArraySource(tone), sample_rate=rate)
    tuner = e.start_tuner()
    e.advance(1.0)
    out = json.loads(tuner.poll_output())
    assert "A3" in out["notes"], (rate, out)


def test_string_enum_silent_fallbacks():
    """Lenient string-enum parsing with silent fallbacks (ref lib.rs:95-114,
    136-145, 178-186; testing.rs exercises the same)."""
    e = AudioEngine()
    tuner = e.start_tuner()
    tuner.set_mode("garbage")        # → MultiPitch
    tuner.set_system("nonsense")     # → EqualTemperament
    e.advance(0.1)
    out = json.loads(tuner.poll_output())
    assert out["mode"] == "MultiPitch"
    assert out["system"] == "EqualTemperament"

    met = e.create_metronome(120.0, [3, 2, 1, 99], [], 1.0, False)
    # 99 maps to "None" (silent beat) — no crash, pattern length preserved.
    assert met._source.pattern == ["Strong", "Medium", "Weak", "None"]

    synth = e.create_synth()
    assert synth._instrument("Accordion") == "Violin"   # fallback
    assert synth._instrument("Piano") == "Piano"


# ── end-to-end: tuner hears a tone through the virtual mic ───────────────

def test_tuner_detects_tone_end_to_end():
    tone = gen.tone_with_harmonics(220.0, 2.0, SR, harmonics=8, amplitude=0.3)
    e = AudioEngine(input_source=ArraySource(tone))
    tuner = e.start_tuner()
    e.start_output()
    e.advance(1.5)
    out = json.loads(tuner.poll_output())
    assert "A3" in out["notes"], out
    assert abs(out["cents"]) < 20.0


def test_tuner_single_pitch_mode():
    tone = gen.tone_with_harmonics(440.0, 1.5, SR, harmonics=6, amplitude=0.3)
    e = AudioEngine(input_source=ArraySource(tone))
    tuner = e.start_tuner()
    tuner.set_mode("SinglePitch")
    tuner.set_base_freq(442.0)
    e.advance(1.0)
    out = json.loads(tuner.poll_output())
    assert out["mode"] == "SinglePitch"
    assert out["base_freq"] == 442.0
    assert out["label"].startswith("A4"), out


# ── end-to-end: onset calibration through loopback ───────────────────────

def test_onset_calibration_via_loopback():
    """The calibration click travels out→(loopback latency)→in and the
    detector measures the residual — the reference needs real hardware for
    this (ref onset.rs:404-440); the virtual device does it deterministically."""
    # The engine seeds in+out latency estimates of one buffer each (2048
    # total, ref mod.rs:242-247); the true round trip is 4096 — so 2048
    # samples go unreported, exactly what calibration must discover.
    e = AudioEngine(loopback_latency_samples=4096, loopback_gain=1.0)
    e.start_onset_detection()
    e.advance(1.5)
    assert e.transport.is_calibrated()
    measured = e.transport.get_calibration_offset()
    # Detection quantizes to the onset hop (64) + window-centre bias.
    assert abs(measured - 2048) < 512, measured


def test_onset_detection_of_input_clicks():
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(int(SR * 2)) * 1e-5).astype(np.float32)
    click = gen.calibration_click(SR, volume=0.8)
    for t in (0.6, 1.2):
        x[int(t * SR):int(t * SR) + len(click)] += click
    e = AudioEngine(input_source=ArraySource(x))
    e.transport.set_calibration_offset(1)  # skip calibration phase
    onset = e.start_onset_detection()
    e.advance(1.8)
    events = json.loads(onset.poll_onsets())
    assert len(events) >= 2, events


def test_late_started_consumers_stamp_current_beats():
    """Consumers attached after input has been running must stamp events at
    the live transport position, not lag by the prior input duration (the
    analyzer frame counter is consumer-relative; positions must be anchored
    at the attach-time input frame)."""
    rng = np.random.default_rng(11)
    x = gen.tone_with_harmonics(220.0, 4.0, SR, harmonics=4, amplitude=0.3)
    x += (rng.standard_normal(len(x)) * 1e-5).astype(np.float32)
    click = gen.calibration_click(SR, volume=0.8)
    x[int(2.6 * SR):int(2.6 * SR) + len(click)] += click
    e = AudioEngine(input_source=ArraySource(x))
    e.transport.set_calibration_offset(1)
    e.transport.set_input_latency(0)
    e.transport.set_output_latency(0)
    e.transport.set_bpm(120.0)
    e.start_input()
    e.start_output()                   # musical clock runs from t=0
    e.advance(2.0)                     # input runs with no consumers
    tuner = e.start_tuner()
    onset = e.start_onset_detection()
    e.advance(1.0)
    # Onset at t≈2.6 s → beat ≈ 5.2 at 120 BPM (was ≈ 1.2 with the skew).
    events = json.loads(onset.poll_onsets())
    assert events, "expected the click to be detected"
    assert abs(events[0]["beat_position"] - 5.2) < 0.3, events
    # Tuner frames from the 2.0–3.0 s window → beats in [4, 6.5].
    out = json.loads(tuner.poll_output())
    assert out["label"], out
    assert 3.9 < out["beat_position"] < 6.5, out


# ── recording ────────────────────────────────────────────────────────────

def test_onset_pause_resume_keeps_timestamps_aligned():
    """Audio dropped while paused must not skew post-resume onset beats
    (frame positions are re-anchored by the dropped-samples counter)."""
    rng = np.random.default_rng(9)
    x = (rng.standard_normal(int(SR * 3)) * 1e-5).astype(np.float32)
    click = gen.calibration_click(SR, volume=0.8)
    x[int(2.5 * SR):int(2.5 * SR) + len(click)] += click  # after the pause
    e = AudioEngine(input_source=ArraySource(x))
    e.transport.set_calibration_offset(1)
    e.transport.set_input_latency(0)
    e.transport.set_output_latency(0)
    e.transport.set_bpm(120.0)
    onset = e.start_onset_detection()
    e.start_output()
    e.advance(0.5)
    onset.pause()
    e.advance(1.0)       # 1 s of audio dropped
    onset.resume()
    e.advance(1.6)
    events = json.loads(onset.poll_onsets())
    assert events, "expected the post-resume click to fire"
    # Click at 2.5 s = beat 5.0 at 120 BPM (compensated within ~0.1 beat).
    assert abs(events[0]["beat_position"] - 5.0) < 0.15, events


def test_recording_writes_wav(tmp_path):
    tone = gen.sine(440.0, 1.0, SR, amplitude=0.4)
    e = AudioEngine(input_source=ArraySource(tone))
    path = str(tmp_path / "rec.wav")
    rec = e.start_recording(path)
    e.advance(0.5)
    rec.pause()
    e.advance(0.2)
    rec.resume()
    e.advance(0.3)
    e.stop_recording()
    data, sr, ch = wav.read_wav(path)
    assert sr == int(SR) and ch == 1
    # 0.5 + 0.3 s recorded (pause skipped), +- one buffer.
    assert abs(len(data) - int(0.8 * SR)) <= 2048
    # Conditioned audio still contains the tone.
    assert np.abs(data).max() > 0.2


def test_recording_flushes_every_8_slots(tmp_path):
    """Mid-recording crash durability (ref recorder.rs:69-79): after 8+
    slots the sample data must already be on disk, unstopped."""
    tone = gen.sine(440.0, 2.0, SR, amplitude=0.4)
    e = AudioEngine(input_source=ArraySource(tone))
    path = str(tmp_path / "rec.wav")
    e.start_recording(path)
    e.advance(12 * 1024 / SR)   # 12 slots > one 8-slot flush cadence
    flushed = os.path.getsize(path)
    # 8 slots of i16 mono (+44-byte header) must have hit the disk.
    assert flushed >= 44 + 8 * 1024 * 2, flushed
    e.stop_recording()


# ── metronome + synth through the engine ─────────────────────────────────

def test_metronome_renders_via_engine():
    e = AudioEngine()
    e.create_metronome(120.0, [3, 1, 1, 1], [], 1.0, False)
    path_done = []
    # Capture output by recording the device output via loopback into input.
    outs = []
    orig = e._output_callback

    def capture(buf):
        orig(buf)
        outs.append(buf.copy())
    e.device.output_callback = capture
    e.advance(1.2)
    audio = np.concatenate(outs)
    assert np.abs(audio).max() > 0.1  # ticks rendered


def test_synth_play_note_via_engine():
    e = AudioEngine()
    synth = e.create_synth()
    synth.play_note(440.0, 100.0, "Violin")
    outs = []
    orig = e._output_callback

    def capture(buf):
        orig(buf)
        outs.append(buf.copy())
    e.device.output_callback = capture
    e.advance(0.5)
    audio = np.concatenate(outs)
    assert np.abs(audio).max() > 0.05
    synth.play_note(440.0, 0.0, "Violin")  # NoteOff path
    e.advance(0.6)


# ── full practice session, hardware-free ─────────────────────────────────

@pytest.mark.slow
def test_practice_session_end_to_end(tmp_path):
    """Flagship integration: a MIDI reference is rendered by the synth, the
    rendered audio is played into the virtual microphone, and the practice
    session scores it — a loop the reference can only run with real
    speakers+mic (ref testing.rs:321-824 CLI sim)."""
    midi_path = str(tmp_path / "ref.mid")
    # Two 4/4 measures of quarter notes at 120 BPM.
    notes = [(60, 0.0, 0.9, 90), (64, 1.0, 0.9, 90), (67, 2.0, 0.9, 90),
             (72, 3.0, 0.9, 90),
             (72, 4.0, 0.9, 90), (67, 5.0, 0.9, 90), (64, 6.0, 0.9, 90),
             (60, 7.0, 0.9, 90)]
    write_midi_file(midi_path, notes, bpm=120.0)

    # Render the expected performance: tones at the right wall-clock times
    # (practice starts at beat 0 after seek; 120 BPM → 0.5 s/beat).
    perf = np.zeros(int(SR * 6.0), dtype=np.float32)
    for midi, start, dur, _vel in notes:
        freq = 440.0 * 2.0 ** ((midi - 69) / 12.0)
        tone = gen.tone_with_harmonics(freq, dur * 0.5 * 0.9, SR,
                                       harmonics=6, amplitude=0.35)
        s = int(start * 0.5 * SR)
        perf[s:s + len(tone)] += tone

    e = AudioEngine(input_source=ArraySource(perf))
    e.transport.set_calibration_offset(1)   # offline: no residual latency
    e.transport.set_input_latency(0)
    e.transport.set_output_latency(0)
    session = e.create_practice_session(midi_path, "Piano", 0,
                                        "Performance", "Beginner", 120.0)
    session.start(0, 1)
    e.advance(5.5)

    # Reference semantics (ref practice/mod.rs:541-556): the session ends as
    # soon as the frontier steps past the last note — i.e. when the player
    # matched everything, the final measure never ages out and metrics cover
    # the aged measures only.
    assert not session.is_running()
    metrics = json.loads(session.get_metrics())
    assert metrics, "metrics must be non-empty after the session"
    assert metrics["num_measures"] >= 1
    assert metrics["accuracy_percent"] >= 75.0, metrics
    t = json.loads(session.poll_transport())
    assert t["practice_end"] == 1
    errors = json.loads(session.poll_errors())
    assert isinstance(errors, list)


@pytest.mark.slow
def test_practice_followalong_stops_for_unplayed_notes(tmp_path):
    """FollowAlong clock behavior end-to-end: the player goes silent after
    the first note, so the transport must STOP before the next unplayed note
    (ref clock.rs:116-130) instead of running ahead."""
    midi_path = str(tmp_path / "fa.mid")
    notes = [(60, 0.0, 0.9, 90), (64, 1.0, 0.9, 90), (67, 2.0, 0.9, 90),
             (72, 3.0, 0.9, 90)]
    write_midi_file(midi_path, notes, bpm=120.0)

    # Performance: only the first note, then silence.
    perf = np.zeros(int(SR * 4.0), dtype=np.float32)
    tone = gen.tone_with_harmonics(261.63, 0.45, SR, harmonics=6,
                                   amplitude=0.35)
    perf[:len(tone)] += tone

    e = AudioEngine(input_source=ArraySource(perf))
    e.transport.set_calibration_offset(1)
    e.transport.set_input_latency(0)
    e.transport.set_output_latency(0)
    session = e.create_practice_session(midi_path, "Piano", 0,
                                        "FollowAlong", "Advanced", 120.0)
    session.start(0, 0)
    e.advance(3.5)
    snap = json.loads(session.poll_transport())
    # Transport stopped just before beat 2 (the unplayed second note's
    # successor) rather than running through the piece.
    assert snap["is_playing"] is False
    assert snap["beat_position"] < 2.1, snap["beat_position"]
    assert session.is_running()   # session waits for the player


def test_uniffi_api_surface_complete():
    """Every method the reference exports over uniffi (ref src/lib.rs
    #[uniffi::export] impls, lines 78-823) exists under the same name on
    the same-named object here — a reference user can port call-for-call."""
    from audio_analyzer_rs_tpu.api import engine as E

    surface = {
        "AudioEngine": [                     # ref lib.rs:448-823
            "start_input", "start_output", "create_metronome",
            "create_synth", "create_player", "start_recording",
            "start_onset_detection", "start_tuner", "stop_metronome",
            "stop_synth", "stop_player", "stop_recording",
            "stop_onset_detection", "create_practice_session",
            "stop_practice_session", "stop_tuner", "poll_dynamics",
            "poll_transport", "clean_input", "clean_output"],
        "Tuner": ["poll_output", "set_base_freq", "set_key", "set_mode",
                  "set_system"],            # ref lib.rs:78-120
        "Metronome": ["set_bpm", "set_volume", "set_pattern", "set_muted",
                      "set_polyrhythm"],    # ref lib.rs:122-174
        "Synth": ["load_file", "play", "play_note", "pause", "resume",
                  "clear", "set_volume", "set_muted"],  # ref lib.rs:176-252
        "Player": ["load_track", "play", "pause", "seek"],  # ref 254-286
        "Recording": ["pause", "resume"],   # ref lib.rs:288-308
        "OnsetDetection": ["poll_onsets", "pause", "resume"],  # ref 324-358
        "PracticeSession": ["start", "stop", "poll_transport", "poll_errors",
                            "get_metrics", "is_running", "set_tuner_mode",
                            "set_bpm"],     # ref lib.rs:360-446
    }
    missing = [f"{c}.{m}" for c, ms in surface.items()
               for m in ms if not hasattr(getattr(E, c, None), m)]
    assert not missing, missing


# ── input-format genericity (ref mod.rs:657-806) ─────────────────────────

def test_i16_input_equals_quantized_f32_input():
    """i16 microphone input through the whole engine must equal f32 input
    of the same quantized samples — the callback conversion is /32768,
    exactly the inverse of the recorder's quantization."""
    from audio_analyzer_rs_tpu.api.device import InterleavedSource

    tone = gen.tone_with_harmonics(261.63, 1.5, SR, harmonics=6,
                                   amplitude=0.4)
    i16 = np.clip(tone * 32768.0, -32768, 32767).astype(np.int16)
    f32 = i16.astype(np.float32) / 32768.0

    outs = []
    for src in (InterleavedSource(i16), ArraySource(f32)):
        e = AudioEngine(input_source=src)
        tuner = e.start_tuner()
        e.advance(1.4)
        outs.append((tuner.poll_output(), e.poll_dynamics()))
    assert outs[0] == outs[1]


def test_u16_and_stereo_downmix_inputs():
    from audio_analyzer_rs_tpu.api.device import (InterleavedSource,
                                                  downmix_interleaved)

    # u16 offset-binary: 32768 → 0.0, 0 → -1.0.
    u16 = np.array([32768, 0, 65535], np.uint16)
    got = downmix_interleaved(u16, 1)
    np.testing.assert_allclose(got, [0.0, -1.0, 32767 / 32768], atol=1e-7)

    # Stereo frames average per frame (ref mod.rs:784-794).
    stereo = np.array([0.2, 0.4, -1.0, 1.0], np.float32)  # 2 frames
    np.testing.assert_allclose(downmix_interleaved(stereo, 2), [0.3, 0.0],
                               atol=1e-7)

    # Through the engine: stereo with identical L/R equals the mono take.
    tone = gen.tone_with_harmonics(329.63, 1.2, SR, harmonics=5,
                                   amplitude=0.35)
    stereo = np.repeat(tone, 2)
    outs = []
    for src in (InterleavedSource(stereo, channels=2), ArraySource(tone)):
        e = AudioEngine(input_source=src)
        tuner = e.start_tuner()
        e.advance(1.1)
        outs.append(tuner.poll_output())
    assert outs[0] == outs[1]


def test_push_source_accepts_raw_formats():
    src = PushSource()
    src.push(np.array([16384, -16384], np.int16))
    np.testing.assert_allclose(src.next_block(2), [0.5, -0.5])
    src.push(np.array([0.5, 0.5, -0.5, 0.5], np.float32), channels=2)
    np.testing.assert_allclose(src.next_block(2), [0.5, 0.0])
