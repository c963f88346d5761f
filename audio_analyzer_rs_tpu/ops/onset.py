"""Spectral-flux onset detection — `lax.scan` over 256-pt STFT frames.

Port of the reference detector (ref src/analysis/onset.rs:47-84,244-543):
frequency-weighted positive flux over 3-bin-smoothed magnitudes, per-bin
"rise-once" burst floors, adaptive FluxTracker threshold, asymmetric energy
EMA gate, 3-frame refractory, and ±15 ms metronome-tick suppression.

The tick guard and calibration logic are data inputs to the scan
(`tick_suppressed` per frame) / host-side respectively: both depend only on
deterministic transport state, so the device kernel stays a pure function.

Constants (ref onset.rs:122-186):
  window 256 / hop 64, FluxTracker(1.5, 0.84, 0.89) floor 0.9,
  ENERGY_EMA 0.84/0.95 rise x1.5, BIN_BURST_RATIO 2.5, OVERCOMP 1.3,
  FLOOR_RISE 0.1, FLOOR_DECAY 0.04, burst silence gate <2, trigger
  max_excess>3 && bursts>=3, refractory 3 frames (init 4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

WINDOW = 256
HOP = 64
HALF = WINDOW // 2 + 1

FLUX_MULTIPLIER = 1.5
FLUX_RISE_MEMORY = 0.84
FLUX_DECAY_MEMORY = 0.89
FLUX_THRESHOLD_FLOOR = 0.9
ENERGY_EMA_RISE = 0.84
ENERGY_EMA_DECAY = 0.95
ENERGY_RISING_RATIO = 1.5
BIN_BURST_RATIO = 2.5
FLOOR_OVERCOMPENSATE = 1.3
FLOOR_RISE = 0.1
FLOOR_DECAY = 0.04
TICK_GUARD_S = 0.015
REFRACTORY_FRAMES = 3


class OnsetState(NamedTuple):
    prev_mag: jax.Array       # [HALF]
    floor: jax.Array          # [HALF]
    floor_init: jax.Array     # bool
    threshold: jax.Array      # FluxTracker threshold
    energy_ema: jax.Array
    frames_since_onset: jax.Array  # int32


class OnsetFrameOut(NamedTuple):
    fired: jax.Array          # bool — passed every gate
    detected: jax.Array       # bool — flux+burst trigger (pre-gates)
    velocity: jax.Array       # float32
    flux: jax.Array           # float32 (post silence gate)
    energy: jax.Array         # float32
    # Decision telemetry for the dev-tools stream (ref onset.rs:458-533).
    burst_count: jax.Array    # int32
    energy_rising: jax.Array  # bool
    frames_since: jax.Array   # int32 — refractory counter BEFORE this frame


def init_state(half: int = HALF) -> OnsetState:
    z = jnp.zeros((half,), jnp.float32)
    return OnsetState(
        prev_mag=z, floor=z, floor_init=jnp.asarray(False),
        threshold=jnp.asarray(0.0, jnp.float32),
        energy_ema=jnp.asarray(0.0, jnp.float32),
        frames_since_onset=jnp.asarray(4, jnp.int32),
    )


def _step(state: OnsetState, mags, global_floor, tick_suppressed,
          calibration_hold):
    half = mags.shape[0]
    i = jnp.arange(half, dtype=jnp.float32)

    # 3-bin smoothed magnitudes; edges unsmoothed (ref onset.rs:264-269).
    sm = (jnp.concatenate([mags[:1], mags[:-1]]) + mags
          + jnp.concatenate([mags[1:], mags[-1:]])) / 3.0
    sm = sm.at[0].set(mags[0]).at[half - 1].set(mags[half - 1])

    weight = 1.0 - i / half
    diff = sm - state.prev_mag
    flux = jnp.sum(jnp.where(diff > 0.0, diff * weight, 0.0))
    energy = jnp.sum(mags)

    # Per-bin burst + floor update (ref onset.rs:293-332).
    floor_eps = jnp.maximum(global_floor, 0.01)
    floor0 = jnp.where(state.floor_init, state.floor,
                       jnp.maximum(mags, global_floor))
    r = mags / jnp.maximum(floor0, floor_eps)
    burst = r > BIN_BURST_RATIO
    floor1 = jnp.where(
        burst, mags * FLOOR_OVERCOMPENSATE,
        jnp.where(mags > floor0,
                  floor0 + FLOOR_RISE * (mags - floor0),
                  floor0 + FLOOR_DECAY * (mags - floor0)))
    burst_count = jnp.sum(burst.astype(jnp.int32))
    max_excess = jnp.max(r)

    # Silence gate (ref onset.rs:337-339).
    flux = jnp.where(burst_count < 2, 0.0, flux)

    # Energy EMA, asymmetric (ref onset.rs:341-350).
    ema_mem = jnp.where(energy > state.energy_ema, ENERGY_EMA_RISE, ENERGY_EMA_DECAY)
    energy_ema = state.energy_ema * ema_mem + energy * (1.0 - ema_mem)

    # FluxTracker (ref onset.rs:67-83).
    is_onset = flux > state.threshold
    mem = jnp.where(is_onset, FLUX_RISE_MEMORY, FLUX_DECAY_MEMORY)
    threshold = jnp.maximum(state.threshold * mem + flux * (1.0 - mem),
                            FLUX_THRESHOLD_FLOOR)
    flux_onset = is_onset & (flux > threshold * FLUX_MULTIPLIER)

    bin_burst_onset = (max_excess > 3.0) & (burst_count >= 3)
    detected = flux_onset & bin_burst_onset

    energy_rising = energy > energy_ema * ENERGY_RISING_RATIO
    velocity = jnp.clip(jnp.maximum(flux, max_excess * 5.0) / 50.0, 0.0, 1.0)
    fired = (detected & ~tick_suppressed & energy_rising
             & (state.frames_since_onset >= REFRACTORY_FRAMES))

    # During round-trip calibration the host may reject a fired event
    # (pre-click noise / implausible residual); the reference then leaves
    # the refractory counter un-reset (ref onset.rs:535-539, onset_fired
    # false on rejection), so a `calibration_hold` frame never resets on
    # `fired` — the engine zeroes the counter explicitly on acceptance.
    frames_since = jnp.where(
        (fired & ~calibration_hold)
        | (detected & (state.frames_since_onset < REFRACTORY_FRAMES)),
        0, state.frames_since_onset + 1)

    new_state = OnsetState(mags, floor1, jnp.asarray(True), threshold,
                           energy_ema, frames_since)
    return new_state, OnsetFrameOut(fired, detected, velocity, flux, energy,
                                    burst_count, energy_rising,
                                    state.frames_since_onset)


@jax.jit
def onset_scan(state: OnsetState, mags: jax.Array, global_floor: jax.Array,
               tick_suppressed: jax.Array,
               calibration_hold: jax.Array | None = None):
    """mags [N, HALF], global_floor [N], tick_suppressed [N] bool →
    (state, OnsetFrameOut of [N] arrays)."""
    if calibration_hold is None:
        calibration_hold = jnp.zeros(mags.shape[0], bool)
    def body(s, inp):
        m, g, t, ch = inp
        return _step(s, m, g, t, ch)
    return jax.lax.scan(body, state,
                        (mags, global_floor, tick_suppressed,
                         calibration_hold), unroll=8)


# ── NumPy oracle (loop transcription, float32) ───────────────────────────

def onset_np(mags: np.ndarray, global_floor: np.ndarray,
             tick_suppressed: np.ndarray,
             calibration_hold: np.ndarray | None = None):
    """Transcription of onset.rs:244-543's per-frame math. Returns dict of arrays."""
    n, half = mags.shape
    if calibration_hold is None:
        calibration_hold = np.zeros(n, dtype=bool)
    prev = np.zeros(half, dtype=np.float32)
    floor = np.zeros(half, dtype=np.float32)
    floor_init = False
    threshold = np.float32(0.0)
    energy_ema = np.float32(0.0)
    frames_since = 4
    fired_all, det_all, vel_all, flux_all = [], [], [], []
    for fidx in range(n):
        m = mags[fidx].astype(np.float32)
        g = np.float32(global_floor[fidx])
        flux = np.float32(0.0)
        energy = np.float32(0.0)
        sm = np.empty(half, dtype=np.float32)
        for k in range(half):
            if k == 0 or k >= half - 1:
                sm[k] = m[k]
            else:
                sm[k] = (m[k - 1] + m[k] + m[k + 1]) / np.float32(3.0)
        for k in range(half):
            energy += m[k]
            w = np.float32(1.0 - k / half)
            d = sm[k] - prev[k]
            if d > 0.0:
                flux += d * w
            prev[k] = m[k]
        floor_eps = max(g, np.float32(0.01))
        if not floor_init:
            floor = np.maximum(m, g)
            floor_init = True
        max_excess = np.float32(0.0)
        burst_count = 0
        for k in range(half):
            fk = max(floor[k], floor_eps)
            r = m[k] / fk
            if r > BIN_BURST_RATIO:
                burst_count += 1
                floor[k] = m[k] * np.float32(FLOOR_OVERCOMPENSATE)
            elif m[k] > floor[k]:
                floor[k] += np.float32(FLOOR_RISE) * (m[k] - floor[k])
            else:
                floor[k] += np.float32(FLOOR_DECAY) * (m[k] - floor[k])
            max_excess = max(max_excess, r)
        if burst_count < 2:
            flux = np.float32(0.0)
        ema_mem = np.float32(ENERGY_EMA_RISE if energy > energy_ema else ENERGY_EMA_DECAY)
        energy_ema = energy_ema * ema_mem + energy * (np.float32(1.0) - ema_mem)
        is_onset = flux > threshold
        mem = np.float32(FLUX_RISE_MEMORY if is_onset else FLUX_DECAY_MEMORY)
        threshold = threshold * mem + flux * (np.float32(1.0) - mem)
        threshold = max(threshold, np.float32(FLUX_THRESHOLD_FLOOR))
        flux_onset = is_onset and flux > threshold * np.float32(FLUX_MULTIPLIER)
        bin_burst_onset = max_excess > 3.0 and burst_count >= 3
        detected = flux_onset and bin_burst_onset
        energy_rising = energy > energy_ema * np.float32(ENERGY_RISING_RATIO)
        velocity = float(np.clip(max(flux, max_excess * np.float32(5.0))
                                 / np.float32(50.0), 0.0, 1.0))
        fired = (detected and not tick_suppressed[fidx] and energy_rising
                 and frames_since >= REFRACTORY_FRAMES)
        if ((fired and not calibration_hold[fidx])
                or (detected and frames_since < REFRACTORY_FRAMES)):
            frames_since = 0
        else:
            frames_since += 1
        fired_all.append(fired)
        det_all.append(detected)
        vel_all.append(velocity)
        flux_all.append(float(flux))
    return {"fired": np.array(fired_all), "detected": np.array(det_all),
            "velocity": np.array(vel_all), "flux": np.array(flux_all)}
