"""Theory parity tests — ports of the reference's theory.rs test suite
(ref src/analysis/theory.rs:399-628)."""

import math

import numpy as np
import pytest

from audio_analyzer_rs_tpu.theory import (
    Interval, Key, MidiNote, Note, freq_to_midi, note_name_to_midi)


# ── Note identification ──────────────────────────────────────────────────

def test_note_from_freq_a4():
    note = Note.from_freq(440.0)
    assert note.get_name() == "A4"
    assert abs(note.get_cents()) < 2.0


def test_note_from_freq_c4():
    assert Note.from_freq(261.626).get_name() == "C4"


def test_note_from_freq_c_sharp_4():
    c_sharp_4 = 261.626 * 2.0 ** (1.0 / 12.0)
    assert Note.from_freq(c_sharp_4).get_name() == "C#4"


def test_note_cents_within_fifty():
    for freq in [261.63, 293.66, 329.63, 349.23, 392.0, 440.0, 493.88, 523.25]:
        cents = Note.from_freq(freq).get_cents()
        assert -50.0 <= cents <= 50.0, f"cents {cents} out of range for {freq}"


# ── Round trips ──────────────────────────────────────────────────────────

def test_note_a4_round_trip():
    assert abs(Note("A4").to_freq() - 440.0) < 0.1


def test_note_c4_round_trip():
    assert abs(Note("C4").to_freq() - 261.63) < 0.5


def test_sharp_frequency_ratio():
    ratio = Note("C#4").to_freq() / Note("C4").to_freq()
    assert abs(ratio - 2.0 ** (1 / 12)) < 0.001


def test_flat_frequency_ratio():
    ratio = Note("Bb3").to_freq() / Note("B3").to_freq()
    assert abs(ratio - 2.0 ** (-1 / 12)) < 0.001


# ── try_new / parsing errors ─────────────────────────────────────────────

def test_try_new_valid():
    note, err = Note.try_new("A4")
    assert err is None and note.get_name() == "A4"


def test_try_new_invalid_letter():
    note, err = Note.try_new("X4")
    assert note is None and "X" in err or "invalid" in err.lower()


def test_try_new_too_short():
    assert Note.try_new("A")[0] is None


def test_try_new_empty():
    assert Note.try_new("")[0] is None


# ── Intervals ────────────────────────────────────────────────────────────

@pytest.mark.parametrize("semis,name", [(7, "Per5"), (12, "Per8"), (4, "Maj3"),
                                        (3, "Min3"), (5, "Per4")])
def test_intervals_equal_temperament(semis, name):
    c4 = 261.63
    other = c4 * 2.0 ** (semis / 12.0)
    assert Interval.new([c4, other]).get_name() == name


def test_interval_single_freq_no_crash():
    assert Interval.new([440.0]).get_name() == "Per8"


def test_interval_empty_no_crash():
    assert Interval.new([]).get_name() == "Per8"


def test_interval_accuracy_formula():
    # Just-intonation perfect fifth 3/2 against an ET fifth: accuracy =
    # -ln(closest/ratio)*1732.5 (ref theory.rs:380).
    c4, g4 = 200.0, 300.0  # exact 3/2
    i = Interval.new([c4, g4], system="JustIntonation")
    assert i.get_name() == "Per5"
    assert abs(i.get_accuracy()) < 1e-3


# ── MidiNote ─────────────────────────────────────────────────────────────

def test_midi_note_a4_round_trip():
    midi = MidiNote.from_freq(440.0)
    assert midi.midi == 69
    assert abs(midi.to_freq() - 440.0) < 1.0


def test_midi_note_c4_round_trip():
    assert abs(MidiNote.from_freq(261.63).to_freq() - 261.63) < 1.0


# ── note_name_to_midi (ref practice/mod.rs tests) ────────────────────────

@pytest.mark.parametrize("name,midi", [("A4", 69), ("C4", 60), ("C#4", 61),
                                       ("Bb3", 58)])
def test_note_name_to_midi(name, midi):
    assert note_name_to_midi(name) == midi


@pytest.mark.parametrize("name", ["", "X4", "A", "Ax"])
def test_note_name_to_midi_invalid(name):
    assert note_name_to_midi(name) is None


def test_freq_to_midi():
    assert freq_to_midi(440.0) == 69
    assert freq_to_midi(261.626) == 60


# ── Key ──────────────────────────────────────────────────────────────────

def test_key_major_semis_map():
    assert Key("C Major").semis_map == (2, 2, 1, 2, 2, 2, 1)
    assert Key("A Minor").semis_map == (2, 1, 2, 2, 1, 2, 2)
