"""Output-path AudioSource tests: metronome, synth, player, calibration."""

import numpy as np
import pytest

from audio_analyzer_rs_tpu.models.calibration import CalibrationClick
from audio_analyzer_rs_tpu.models.metronome import Metronome
from audio_analyzer_rs_tpu.models.player import AudioPlayer, PlayerController
from audio_analyzer_rs_tpu.models.sources import Mixer
from audio_analyzer_rs_tpu.models.synth import Synthesizer, Voice, FINISHED
from audio_analyzer_rs_tpu.transport import MusicalTransport
from audio_analyzer_rs_tpu.utils import wav
from audio_analyzer_rs_tpu.utils.midi import Measure, SynthNote

SR = 48000.0
BUF = 1024


def run_source(source, transport, n_buffers, channels=1):
    """Drive a source through n_buffers output callbacks like the device."""
    out = []
    for _ in range(n_buffers):
        transport.tick_output(BUF, transport.get_output_frames() / SR)
        buf = np.zeros(BUF * channels, dtype=np.float32)
        source.process(buf, channels)
        out.append(buf.reshape(BUF, channels)[:, 0].copy())
    return np.concatenate(out)


# ── metronome ────────────────────────────────────────────────────────────

def test_metronome_ticks_on_beats():
    t = MusicalTransport(120.0, SR)
    t.play()
    met = Metronome(SR, t, bpm=120.0)
    audio = run_source(met, t, 100)  # ~2.1s = 4+ beats
    # Beats at 0.5s intervals → energy bursts near 24000, 48000, 72000.
    for beat_sample in [24000, 48000, 72000]:
        win = np.abs(audio[beat_sample:beat_sample + 2000])
        pre = np.abs(audio[beat_sample - 3500:beat_sample - 1500])
        assert win.max() > 0.1, f"no tick near {beat_sample}"
        assert win.max() > pre.max() * 2, f"tick not distinct at {beat_sample}"


def test_metronome_tick_registers_transport_history():
    t = MusicalTransport(120.0, SR)
    t.play()
    met = Metronome(SR, t, bpm=120.0)
    run_source(met, t, 50)
    # Beat 1 tick recorded at ~beat 1.0 in beat space.
    assert t.nearest_tick_distance_beats(1.0) < 0.02


def test_metronome_muted_outputs_silence():
    t = MusicalTransport(120.0, SR)
    t.play()
    met = Metronome(SR, t, bpm=120.0)
    met.send("SetMuted", True)
    audio = run_source(met, t, 60)
    assert np.abs(audio).max() == 0.0


def test_metronome_pattern_strong_weak_amplitudes():
    t = MusicalTransport(120.0, SR)
    t.play()
    met = Metronome(SR, t, bpm=120.0, pattern=["Strong", "Weak"])
    audio = run_source(met, t, 100)
    strong = np.abs(audio[24000:26000]).max()   # beat 1 → pattern[1] (Weak)
    weak = np.abs(audio[48000:50000]).max()     # beat 2 → pattern[0] (Strong)
    # Strengths differ (0.5 vs 1.0 volume, different freqs).
    assert abs(strong - weak) > 0.1


def test_metronome_subdivisions_fire_between_beats():
    t = MusicalTransport(120.0, SR)
    t.play()
    # Subdivisions load for the beat index just crossed: beat 1 → index 1.
    met = Metronome(SR, t, bpm=120.0, pattern=["Strong", "Weak", "Weak", "Weak"],
                    polys=[[], [2], [], []])
    audio = run_source(met, t, 100)
    # Beat 1 at 24000; subdivision (div=2) fires ~12000 samples later.
    sub_win = np.abs(audio[35000:38000])
    assert sub_win.max() > 0.05, "expected subdivision tick between beats"


def test_metronome_bpm_raise_with_polyrhythm_no_crash():
    """A BPM raise can shrink samples-per-beat below a subdivision counter
    accumulated under the old tempo; the tick must fire immediately (the
    reference's per-sample `counter >= sps` semantics), not spawn a
    negative-delay tick that crashes render."""
    t = MusicalTransport(60.0, SR)
    t.play()
    met = Metronome(SR, t, bpm=60.0, pattern=["Strong", "Weak", "Weak", "Weak"],
                    polys=[[2], [2], [2], [2]])
    run_source(met, t, 60)            # ~1.3 s: counter mid-subdivision
    met.send("SetBpm", 480.0)
    t.set_bpm(480.0)
    audio = run_source(met, t, 40)    # previously ValueError broadcast crash
    assert np.isfinite(audio).all()


def test_metronome_stop_finishes():
    t = MusicalTransport(120.0, SR)
    t.play()
    met = Metronome(SR, t, bpm=120.0)
    met.send("Stop")
    buf = np.zeros(BUF, np.float32)
    met.process(buf, 1)
    assert met.is_finished()


# ── synth ────────────────────────────────────────────────────────────────

def make_measures():
    return [Measure(
        notes=[SynthNote(freq=440.0, start_beat_in_measure=0.0,
                         duration_beats=1.0, velocity=0.8, instrument="Piano"),
               SynthNote(freq=523.25, start_beat_in_measure=2.0,
                         duration_beats=1.0, velocity=0.8, instrument="Piano")],
        time_signature=(4, 4), bpm=120.0, global_start_beat=0.0)]


def test_synth_note_on_produces_tone():
    t = MusicalTransport(120.0, SR)
    t.play()
    synth = Synthesizer(SR, t)
    # Violin: timbre mix 0.4 keeps the fundamental dominant.  (Piano's 0.8
    # bright mix makes 2f dominate, as in the reference timbre.)
    synth.send("NoteOn", 440.0, 100.0, "Violin")
    audio = run_source(synth, t, 40)
    assert np.abs(audio).max() > 0.05
    spec = np.abs(np.fft.rfft(audio[20000:28192] * np.hanning(8192)))
    peak_hz = np.argmax(spec) * SR / 8192
    assert abs(peak_hz - 440.0) < 10.0, peak_hz


def test_synth_note_off_releases():
    t = MusicalTransport(120.0, SR)
    t.play()
    synth = Synthesizer(SR, t)
    synth.send("NoteOn", 440.0, 100.0, "Piano")
    run_source(synth, t, 10)
    synth.send("NoteOff", 440.0)
    audio = run_source(synth, t, 60)
    assert np.abs(audio[-BUF:]).max() < 1e-4  # released to silence


def test_synth_note_on_idempotent():
    t = MusicalTransport(120.0, SR)
    t.play()
    synth = Synthesizer(SR, t)
    synth.send("NoteOn", 440.0, 100.0, "Piano")
    buf = np.zeros(BUF, np.float32)
    t.tick_output(BUF, 0.0)
    synth.process(buf, 1)
    synth.send("NoteOn", 440.0, 100.0, "Piano")  # drone re-poll
    t.tick_output(BUF, 0.0)
    synth.process(buf, 1)
    assert len(synth.voices) == 1


def test_synth_sequencer_plays_notes_with_countin():
    t = MusicalTransport(120.0, SR)
    synth = Synthesizer(SR, t)
    synth.send("LoadMeasures", make_measures())
    synth.send("Play", 0)
    audio = run_source(synth, t, 250)  # ~5.3s covers count-in (2s) + measure
    # Count-in: first ~1.9s silent.
    assert np.abs(audio[:int(1.8 * SR)]).max() < 1e-6
    # Note at beat 0 (t=2s) ringing shortly after.
    assert np.abs(audio[int(2.05 * SR):int(2.3 * SR)]).max() > 0.05
    # Second note at beat 2 (t=3s).
    assert np.abs(audio[int(3.05 * SR):int(3.3 * SR)]).max() > 0.05


def test_voice_envelope_compresses_short_notes():
    v = Voice(440.0, 0.8, 0.05, "Piano", 120.0)  # 25 ms note < natural env
    assert v.remaining_beats == 0.0
    assert v.attack_sec < 0.005


# ── player ───────────────────────────────────────────────────────────────

def test_player_roundtrip_playback(tmp_path):
    from audio_analyzer_rs_tpu.models import generators as gen
    path = str(tmp_path / "tone.wav")
    tone = gen.sine(440.0, 0.5, SR, amplitude=0.5)
    wav.write_wav(path, tone, int(SR))
    t = MusicalTransport(120.0, SR)
    player = AudioPlayer(SR)
    ctrl = PlayerController(player)
    ctrl.load_file(path)
    ctrl.play()
    audio = run_source(player, t, 20)
    np.testing.assert_allclose(audio[:1000], tone[:1000], atol=2e-4)


def test_player_resamples_rate_mismatch(tmp_path):
    from audio_analyzer_rs_tpu.models import generators as gen
    path = str(tmp_path / "tone22.wav")
    tone = gen.sine(440.0, 0.5, 22050.0, amplitude=0.5)
    wav.write_wav(path, tone, 22050)
    t = MusicalTransport(120.0, SR)
    player = AudioPlayer(SR)
    ctrl = PlayerController(player)
    ctrl.load_file(path)
    ctrl.play()
    audio = run_source(player, t, 20)
    # Output at 48 kHz still contains a 440 Hz tone (resampled).
    spec = np.abs(np.fft.rfft(audio[:8192] * np.hanning(8192)))
    peak_hz = np.argmax(spec) * SR / 8192
    assert abs(peak_hz - 440.0) < 12.0, peak_hz


def test_player_seek_and_stop():
    t = MusicalTransport(120.0, SR)
    player = AudioPlayer(SR)
    data = np.arange(1000, dtype=np.float32) / 1000.0
    player.send("LoadTrack", data, int(SR), 1)
    player.send("Seek", 0.5)
    player.send("Play")
    buf = np.zeros(BUF, np.float32)
    player.process(buf, 1)
    # Position 0.5s * 48000 > 1000 frames → clamped to end, playback stops.
    assert not player.playing


# ── calibration click ────────────────────────────────────────────────────

def test_calibration_click_fires_at_target():
    t = MusicalTransport(120.0, SR)
    t.play()
    click = CalibrationClick(t, SR, delay_samples=SR // 5)
    audio = run_source(click, t, 30)
    target = int(SR // 5)
    assert np.abs(audio[:target - 100]).max() == 0.0
    assert np.abs(audio[target:target + 500]).max() > 0.3
    assert click.fired
    assert click.actual_frame == target
    assert click.is_finished()


def test_mixer_sums_and_clamps():
    t = MusicalTransport(120.0, SR)
    t.play()

    class Loud:
        def process(self, buf, ch):
            buf += 0.8

        def is_finished(self):
            return False

    mixer = Mixer(1)
    mixer.add_source(Loud())
    mixer.add_source(Loud())
    buf = np.zeros(64, np.float32)
    mixer.process(buf, 1)
    assert np.all(buf == 1.0)  # 1.6 clamped


def test_mixer_drops_finished_sources():
    class OneShot:
        def __init__(self):
            self.done = False

        def process(self, buf, ch):
            buf += 0.1
            self.done = True

        def is_finished(self):
            return self.done

    mixer = Mixer(1)
    mixer.add_source(OneShot())
    buf = np.zeros(8, np.float32)
    mixer.process(buf, 1)
    assert mixer.has_sources()  # dropped on NEXT process
    mixer.process(buf, 1)
    assert not mixer.has_sources()
