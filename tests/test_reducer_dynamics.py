"""Reducer (biquad+gate) and DynamicsTracker/AGC parity tests."""

import numpy as np
import pytest

from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.ops import dynamics, reducer

SR = 48000.0


# ── biquad + gate ────────────────────────────────────────────────────────

def test_biquad_coeffs_are_f32_reference_math():
    b0, b1, b2, a1, a2 = reducer.biquad_coeffs(40.0, SR, is_lpf=False)
    # HPF at 40 Hz: near-unity passband gain, b1 ≈ -2*b0.
    assert 0.99 < b0 < 1.0
    assert abs(b1 + 2 * b0) < 1e-5
    lb0, lb1, lb2, la1, la2 = reducer.biquad_coeffs(14000.0, SR, is_lpf=True)
    assert lb0 > 0 and abs(lb1 - 2 * lb0) < 1e-5


def test_reduce_signal_matches_oracle():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(4096) * 0.1).astype(np.float32)
    x += gen.sine(440.0, 4096 / SR, SR, amplitude=0.3)[:4096]
    state = reducer.reducer_init()
    _, y = reducer.reduce_signal(state, x, SR)
    oracle = reducer.reduce_signal_np(x, SR)
    # f32 FMA/ordering differences (~1e-8/step) amplified by the HPF's ~100x
    # transient → ~1e-4 absolute ceiling; the same drift class separates any
    # two f32 implementations of this recurrence.
    np.testing.assert_allclose(np.asarray(y), oracle, atol=2e-4)
    # Fast mode: blocked parallel-prefix IIR amplifies f32 roundoff
    # (≈ -30 dB worst case on full-scale signals; see ops/reducer.py).
    state = reducer.reducer_init()
    _, yf = reducer.reduce_signal(state, x, SR, mode="fast")
    np.testing.assert_allclose(np.asarray(yf), oracle, atol=3e-2, rtol=1e-2)


def test_reduce_signal_streaming_equals_batch():
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(3000) * 0.2).astype(np.float32)
    s1 = reducer.reducer_init()
    _, full = reducer.reduce_signal(s1, x, SR)
    s2 = reducer.reducer_init()
    parts = []
    for chunk in np.array_split(x, 4):
        s2, y = reducer.reduce_signal(s2, chunk, SR)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(full),
                               atol=2e-3, rtol=1e-3)


def test_gate_attenuates_quiet_passes_loud():
    quiet = np.full(8000, 1e-5, np.float32)  # well below -60 dB
    loud = np.full(8000, 0.5, np.float32)
    sg = reducer.gate_init()
    _, gq = reducer.noise_gate(sg, quiet, SR)
    sg = reducer.gate_init()
    _, gl = reducer.noise_gate(sg, loud, SR)
    assert np.abs(np.asarray(gq)[-100:]).max() < 1e-8   # ratio^4 crush
    np.testing.assert_allclose(np.asarray(gl), loud, rtol=1e-6)


# ── dynamics / AGC ───────────────────────────────────────────────────────

def _make_slots(n_slots, rng, level=0.1):
    """Alternating quiet / tonal-active slots."""
    slots = np.zeros((n_slots, 1024), np.float32)
    t = np.arange(1024) / SR
    for i in range(n_slots):
        if i % 3 == 0:
            slots[i] = (rng.standard_normal(1024) * 1e-5).astype(np.float32)
        else:
            slots[i] = (level * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    return slots


def test_dynamics_exact_matches_oracle(rng):
    slots = _make_slots(40, rng)
    state = dynamics.init_state()
    _, outs, gained = dynamics.dynamics_scan(state, slots, SR, 1024, mode="exact")
    oracle = dynamics.DynamicsTrackerNp(SR, 1024)
    for i in range(len(slots)):
        o = oracle.process_slot(slots[i])
        assert int(outs.level[i]) == o["level"], f"slot {i}"
        np.testing.assert_allclose(float(outs.rms_db[i]), o["rms_db"],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(float(outs.gain_db[i]), o["gain_db"],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(float(outs.noise_floor_db[i]),
                                   o["noise_floor_db"], rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(gained[i]), o["slot"],
                                   rtol=1e-3, atol=1e-5)


def test_dynamics_hist_mode_tracks_exact(rng):
    slots = _make_slots(60, rng, level=0.05)
    s1 = dynamics.init_state()
    _, exact, _ = dynamics.dynamics_scan(s1, slots, SR, 1024, mode="exact")
    s2 = dynamics.init_state()
    _, hist, _ = dynamics.dynamics_scan(s2, slots, SR, 1024, mode="hist")
    # Histogram percentiles quantize to ~0.25 dB buckets.
    active = np.asarray(exact.level) >= 0
    np.testing.assert_allclose(np.asarray(hist.session_median_db)[active],
                               np.asarray(exact.session_median_db)[active],
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(hist.gain_db), np.asarray(exact.gain_db),
                               atol=0.5)
    # Levels may differ by at most one step at bucket boundaries.
    assert np.all(np.abs(np.asarray(hist.level) - np.asarray(exact.level)) <= 1)


def test_dynamics_agc_boosts_quiet_signal(rng):
    """A persistently quiet tonal signal should accrue positive gain."""
    t = np.arange(1024) / SR
    tone = (0.003 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)  # ~-50 dB
    slots = np.tile(tone, (400, 1))
    # Seed some quiet slots so the noise floor drops and the tone is active.
    slots[:40] = (np.random.default_rng(0).standard_normal((40, 1024)) * 1e-6
                  ).astype(np.float32)
    state = dynamics.init_state()
    _, outs, gained = dynamics.dynamics_scan(state, slots, SR, 1024, mode="exact")
    assert float(outs.gain_db[-1]) > 0.5, float(outs.gain_db[-1])
    # Headroom clamp: output never exceeds 0.97.
    assert np.abs(np.asarray(gained)).max() <= 0.97 + 1e-5


def test_dynamics_level_names():
    assert dynamics.LEVEL_NAMES[0] == "silence"
    assert dynamics.LEVEL_NAMES[8] == "fff"
