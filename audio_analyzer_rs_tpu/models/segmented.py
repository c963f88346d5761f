"""Segment-parallel offline analysis of one long recording.

The pitch pipeline's sequential state (per-bin noise floor, tracker) limits
single-stream throughput to the scan rate.  For *offline* analysis the
recording is split into S contiguous segments analyzed in parallel (vmap),
where every segment except the first warms its carried state on
`warmup_frames` of look-back audio whose outputs are discarded.  The floor
IIRs converge with time constants of ~25-50 frames (alphas 0.04/0.35/0.02,
ref stft.rs:219-225) and the tracker within 3 frames (max life), so a
256-frame (~3 s) warmup makes segment outputs match the exact sequential run
except for rare borderline peaks sitting right at the floor threshold.
Segment 0 starts from the fresh state — its outputs are bit-identical to
the sequential run.

Measured on TPU v5e: 16 segments ≈ 5.4x single-stream throughput
(~97k frames/s ≈ 1100x realtime at window 2048 / hop 512 / 44.1 kHz).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import noisefloor, onset as onset_ops, tracker
from ..ops.stft import ONSET_HOP, ONSET_WINDOW, PITCH_HOP, PITCH_WINDOW
from ..utils.framing import frame_signal, num_frames
from .analyzer import onset_analyze_frames, pitch_analyze_frames

DEFAULT_WARMUP_FRAMES = 256
# Onset state converges much faster than the pitch floor (flux/energy EMAs
# with per-frame alphas 0.84-0.89, TC < 10 frames; rise-once burst floors),
# but frames are also much shorter (hop 64 ≈ 1.45 ms), so a longer frame
# count is still a short wall-clock warmup (~0.74 s).
DEFAULT_ONSET_WARMUP_FRAMES = 512


@partial(jax.jit, static_argnames=("sample_rate", "window", "hop", "backend"))
def _vmapped_step(nf_states, tr_states, audio_chunks, global_floor, onsets,
                  sample_rate: float, window: int, hop: int, backend: str):
    def one(nf, tr, audio, gf, on):
        frames = frame_signal(audio, window, hop)
        return pitch_analyze_frames(nf, tr, frames, gf, on, sample_rate,
                                    window, hop, backend)
    return jax.vmap(one)(nf_states, tr_states, audio_chunks, global_floor,
                         onsets)


def segmented_pitch_analysis(audio: np.ndarray, sample_rate: float,
                             segments: int = 16,
                             warmup_frames: int = DEFAULT_WARMUP_FRAMES,
                             chunk_frames: int = 1024,
                             window: int = PITCH_WINDOW,
                             hop: int = PITCH_HOP,
                             backend: str = "dft",
                             global_floor_db: float = -96.0):
    """Analyze one long mono buffer with S parallel segments.

    Returns (stable_freqs [N,8], stable_scores [N,8], stable_valid [N,8])
    covering all N frames of the recording, in order.
    """
    audio = np.asarray(audio, dtype=np.float32)
    n_total = num_frames(len(audio), window, hop)
    if n_total <= 0:
        z = np.zeros((0, 8), np.float32)
        return z, z.copy(), np.zeros((0, 8), bool)

    # Every segment's stream is L = warmup + payload frames; segment 0's
    # whole stream is payload (fresh state = exact), segments 1.. discard
    # the first `warmup` outputs.  Payload split:
    #   seg 0 owns frames [0, L); seg s>=1 owns [L + (s-1)P, L + sP).
    segments = max(1, min(segments, max(n_total // max(chunk_frames, 1), 1)))
    payload = -(-max(n_total - warmup_frames, 1) // segments)
    payload = -(-payload // chunk_frames) * chunk_frames   # chunk multiple
    stream_len = warmup_frames + payload
    steps = -(-stream_len // chunk_frames)

    def seg_payload_range(s):
        if s == 0:
            return 0, min(stream_len, n_total)
        lo = stream_len + (s - 1) * payload
        return lo, min(lo + payload, n_total)

    stream_start = np.array(
        [0 if s == 0 else seg_payload_range(s)[0] - warmup_frames
         for s in range(segments)])
    assert (stream_start >= 0).all()

    half = window // 2 + 1
    gf_lin = float(np.asarray(
        noisefloor.global_floor_linear(global_floor_db, half)))

    def rep(state):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (segments,) + a.shape), state)
    nf_states = rep(noisefloor.init_state(half))
    tr_states = rep(tracker.init_state())

    chunk_samples = (chunk_frames - 1) * hop + window
    max_sample = int(stream_start.max() + steps * chunk_frames) * hop \
        + chunk_samples
    audio_pad = np.pad(audio, (0, max(0, max_sample - len(audio))))

    out_freqs = np.zeros((n_total, 8), np.float32)
    out_scores = np.zeros((n_total, 8), np.float32)
    out_valid = np.zeros((n_total, 8), bool)

    gf = jnp.full((segments, chunk_frames), gf_lin, jnp.float32)
    onsets = jnp.zeros((segments, chunk_frames), bool)

    for step in range(steps):
        starts = (stream_start + step * chunk_frames) * hop
        chunks = np.stack([audio_pad[s:s + chunk_samples] for s in starts])
        nf_states, tr_states, out = _vmapped_step(
            nf_states, tr_states, jnp.asarray(chunks), gf, onsets,
            sample_rate, window, hop, backend)
        sf = np.asarray(out.stable_freqs)
        ss = np.asarray(out.stable_scores)
        sv = np.asarray(out.stable_valid)
        for s in range(segments):
            pay_lo, pay_hi = seg_payload_range(s)
            if pay_lo >= pay_hi:
                continue
            # Stream positions covered by this chunk → global frame indices.
            g0 = stream_start[s] + step * chunk_frames
            lo = max(g0, pay_lo)
            hi = min(g0 + chunk_frames, pay_hi)
            if lo >= hi:
                continue
            src = lo - g0
            out_freqs[lo:hi] = sf[s, src:src + (hi - lo)]
            out_scores[lo:hi] = ss[s, src:src + (hi - lo)]
            out_valid[lo:hi] = sv[s, src:src + (hi - lo)]
    return out_freqs, out_scores, out_valid


@partial(jax.jit, static_argnames=("window", "backend", "hop"))
def _vmapped_onset_step(states, audio_chunks, global_floor, tick_sup, hold,
                        window: int, backend: str, hop: int):
    def one(st, audio, gf, ts, ch):
        frames = frame_signal(audio, window, hop)
        return onset_analyze_frames(st, frames, gf, ts, ch, window, backend)
    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
        states, audio_chunks, global_floor, tick_sup, hold)


def segmented_onset_analysis(audio: np.ndarray, sample_rate: float,
                             segments: int = 16,
                             warmup_frames: int = DEFAULT_ONSET_WARMUP_FRAMES,
                             chunk_frames: int = 4096,
                             window: int = ONSET_WINDOW,
                             hop: int = ONSET_HOP,
                             backend: str = "dft",
                             global_floor_db: float = -96.0):
    """Segment-parallel offline onset detection over one long mono buffer.

    Same warmup-overlap scheme as `segmented_pitch_analysis`; segment 0 is
    bit-identical to the sequential run.  Returns
    (fired [N] bool, velocity [N] f32, flux [N] f32, energy [N] f32)
    for all N = num_frames(len(audio)) onset frames, in order.
    """
    audio = np.asarray(audio, dtype=np.float32)
    n_total = num_frames(len(audio), window, hop)
    if n_total <= 0:
        z = np.zeros(0, np.float32)
        return np.zeros(0, bool), z, z.copy(), z.copy()

    segments = max(1, min(segments, max(n_total // max(chunk_frames, 1), 1)))
    payload = -(-max(n_total - warmup_frames, 1) // segments)
    payload = -(-payload // chunk_frames) * chunk_frames
    stream_len = warmup_frames + payload
    steps = -(-stream_len // chunk_frames)

    def seg_payload_range(s):
        if s == 0:
            return 0, min(stream_len, n_total)
        lo = stream_len + (s - 1) * payload
        return lo, min(lo + payload, n_total)

    stream_start = np.array(
        [0 if s == 0 else seg_payload_range(s)[0] - warmup_frames
         for s in range(segments)])
    assert (stream_start >= 0).all()

    half = window // 2 + 1
    gf_lin = float(np.asarray(
        noisefloor.global_floor_linear(global_floor_db, half)))

    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (segments,) + a.shape),
        onset_ops.init_state(half))

    chunk_samples = (chunk_frames - 1) * hop + window
    max_sample = int(stream_start.max() + steps * chunk_frames) * hop \
        + chunk_samples
    audio_pad = np.pad(audio, (0, max(0, max_sample - len(audio))))

    out_fired = np.zeros(n_total, bool)
    out_vel = np.zeros(n_total, np.float32)
    out_flux = np.zeros(n_total, np.float32)
    out_energy = np.zeros(n_total, np.float32)

    gf = jnp.full((segments, chunk_frames), gf_lin, jnp.float32)
    ts = jnp.zeros((segments, chunk_frames), bool)
    hold = jnp.zeros((segments, chunk_frames), bool)

    for step in range(steps):
        starts = (stream_start + step * chunk_frames) * hop
        chunks = np.stack([audio_pad[s:s + chunk_samples] for s in starts])
        states, out = _vmapped_onset_step(
            states, jnp.asarray(chunks), gf, ts, hold, window, backend, hop)
        fired = np.asarray(out.fired)
        vel = np.asarray(out.velocity)
        flux = np.asarray(out.flux)
        energy = np.asarray(out.energy)
        for s in range(segments):
            pay_lo, pay_hi = seg_payload_range(s)
            if pay_lo >= pay_hi:
                continue
            g0 = stream_start[s] + step * chunk_frames
            lo = max(g0, pay_lo)
            hi = min(g0 + chunk_frames, pay_hi)
            if lo >= hi:
                continue
            src = lo - g0
            out_fired[lo:hi] = fired[s, src:src + (hi - lo)]
            out_vel[lo:hi] = vel[s, src:src + (hi - lo)]
            out_flux[lo:hi] = flux[s, src:src + (hi - lo)]
            out_energy[lo:hi] = energy[s, src:src + (hi - lo)]
    return out_fired, out_vel, out_flux, out_energy
