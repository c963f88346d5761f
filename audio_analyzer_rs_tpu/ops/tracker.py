"""PitchTracker — hysteresis over consecutive frames as a `lax.scan`.

Port of the reference tracker (ref src/audio_io/stft.rs:20-117): display after
2 hits, max life 3, 3% frequency tolerance, EMA 0.6/0.4 (snap on onset),
onset reaps unmatched tracks immediately.  The reference's growable Vec of
tracks becomes MAX_TRACKS fixed slots; relative (insertion) order — which the
Rust Vec preserves and the tuner's label join depends on — is reconstructed
by sorting emissions by a per-track creation sequence number.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pitch import MAX_NOTES

MAX_TRACKS = 16  # 8 live raw pitches + up to 8 coasting tracks
DISPLAY_THRESHOLD = 2
MAX_LIFE = 3
TOLERANCE = 0.03
EMA_OLD, EMA_NEW = 0.6, 0.4


class TrackerState(NamedTuple):
    freq: jax.Array    # [T] float32
    score: jax.Array   # [T] float32
    life: jax.Array    # [T] int32
    valid: jax.Array   # [T] bool
    seq: jax.Array     # [T] int32 creation order
    next_seq: jax.Array  # scalar int32


def init_state() -> TrackerState:
    t = MAX_TRACKS
    return TrackerState(
        freq=jnp.zeros((t,), jnp.float32),
        score=jnp.zeros((t,), jnp.float32),
        life=jnp.zeros((t,), jnp.int32),
        valid=jnp.zeros((t,), bool),
        seq=jnp.full((t,), jnp.iinfo(jnp.int32).max, jnp.int32),
        next_seq=jnp.asarray(0, jnp.int32),
    )


def _step(state: TrackerState, raw_freq, raw_score, raw_valid, onset):
    freq, score, life = state.freq, state.score, state.life
    valid, seq, next_seq = state.valid, state.seq, state.next_seq
    matched = jnp.zeros((MAX_TRACKS,), bool)

    # 1. Match raw pitches to tracks in raw order; first matching track wins
    #    (Rust scans tracks in vec order = ascending seq; ref stft.rs:50-83).
    order = jnp.argsort(seq)  # vec order
    for i in range(MAX_NOTES):
        rf, rs, rv = raw_freq[i], raw_score[i], raw_valid[i]
        rel = jnp.abs(freq - rf) / jnp.maximum(jnp.abs(freq), 1e-30)
        cand = valid & ~matched & (rel < TOLERANCE)
        cand_in_order = cand[order]
        any_match = jnp.any(cand_in_order) & rv
        first = order[jnp.argmax(cand_in_order)]
        new_f = jnp.where(onset, rf, freq[first] * EMA_OLD + rf * EMA_NEW)
        freq = jnp.where(any_match, freq.at[first].set(new_f), freq)
        score = jnp.where(any_match, score.at[first].set(rs), score)
        life = jnp.where(any_match,
                         life.at[first].set(jnp.minimum(life[first] + 1, MAX_LIFE)),
                         life)
        matched = jnp.where(any_match, matched.at[first].set(True), matched)
        # 2. Spawn a new track in the first free slot (ref stft.rs:76-83).
        spawn = rv & ~any_match
        free_slot = jnp.argmax(~valid)
        has_free = jnp.any(~valid)
        do_spawn = spawn & has_free
        freq = jnp.where(do_spawn, freq.at[free_slot].set(rf), freq)
        score = jnp.where(do_spawn, score.at[free_slot].set(rs), score)
        life = jnp.where(do_spawn, life.at[free_slot].set(1), life)
        seq = jnp.where(do_spawn, seq.at[free_slot].set(next_seq), seq)
        matched = jnp.where(do_spawn, matched.at[free_slot].set(True), matched)
        valid = jnp.where(do_spawn, valid.at[free_slot].set(True), valid)
        next_seq = next_seq + do_spawn.astype(jnp.int32)

    # 3. Misses: decay or (on onset) reap immediately (ref stft.rs:86-113).
    unmatched = valid & ~matched
    life = jnp.where(unmatched, jnp.where(onset, 0, life - 1), life)
    dead = valid & (life <= 0)
    valid = valid & ~dead
    seq = jnp.where(valid, seq, jnp.iinfo(jnp.int32).max)

    # Emit stable tracks (life >= 2) in vec (seq) order, up to MAX_NOTES.
    stable = valid & (life >= DISPLAY_THRESHOLD)
    emit_order = jnp.argsort(jnp.where(stable, seq, jnp.iinfo(jnp.int32).max))
    out_freq = freq[emit_order][:MAX_NOTES]
    out_score = score[emit_order][:MAX_NOTES]
    out_valid = stable[emit_order][:MAX_NOTES]
    new_state = TrackerState(freq, score, life, valid, seq, next_seq)
    return new_state, (out_freq, out_score, out_valid)


@jax.jit
def tracker_scan(state: TrackerState, raw_freqs, raw_scores, raw_valid,
                 onsets):
    """raw_* [N, 8], onsets [N] bool → (state, (freqs, scores, valid) [N, 8])."""
    def body(s, inp):
        rf, rs, rv, on = inp
        return _step(s, rf, rs, rv, on)
    return jax.lax.scan(body, state, (raw_freqs, raw_scores, raw_valid, onsets))


# ── NumPy oracle: transcription of the Rust PitchTracker ─────────────────

class PitchTrackerNp:
    """ref stft.rs:20-117, list-based."""

    def __init__(self):
        self.tracks = []  # [freq, score, life]

    def process(self, raw_pitches, onset: bool):
        matched = [False] * len(self.tracks)
        for raw_freq, raw_score in raw_pitches:
            found = False
            for i, tr in enumerate(self.tracks):
                if matched[i]:
                    continue
                if abs(tr[0] - raw_freq) / tr[0] < TOLERANCE:
                    tr[0] = raw_freq if onset else tr[0] * EMA_OLD + raw_freq * EMA_NEW
                    tr[1] = raw_score
                    tr[2] = min(tr[2] + 1, MAX_LIFE)
                    matched[i] = True
                    found = True
                    break
            if not found:
                self.tracks.append([raw_freq, raw_score, 1])
                matched.append(True)
        active = []
        i = 0
        while i < len(self.tracks):
            if not matched[i]:
                self.tracks[i][2] = 0 if onset else self.tracks[i][2] - 1
            if self.tracks[i][2] <= 0:
                self.tracks.pop(i)
                if len(matched) > i:
                    matched.pop(i)
            else:
                if self.tracks[i][2] >= DISPLAY_THRESHOLD:
                    active.append((self.tracks[i][0], self.tracks[i][1]))
                i += 1
        return active
