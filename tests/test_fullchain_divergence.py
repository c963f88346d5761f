"""Quantify fast-mode divergence of the batched full step.

The sharded full step (parallel/sharding.py) defaults to histogram AGC
percentiles (ops/dynamics.py mode="hist", 0.18 dB quantization over
[-180, 6] dB); the reducer runs the exact sequential scan.  This test
measures what the composed chain does to the actual pitch/onset outputs on
a realistic scene along two axes:

1. fast mode vs exact mode, both on device — isolates the hist-AGC
   approximation.  Measured: 100.000% frame agreement on the canonical
   mixed scene (the histogram's bucket error is ~0.09 dB on the floors, far
   below any decision threshold).
2. device chain vs the exact NumPy oracle chain (`full_chain_np`:
   sequential biquad + gate, sort-based AGC, float64 STFT, *_np pipelines)
   — adds fp32 instruction-level rounding (FMA contraction in the floor
   scan and the reducer's IIR recursion, f32-vs-f64 FFT) at the
   extractor's hard thresholds, where a 1-ulp difference can flip a
   borderline peak and the tracker's hysteresis stretches single-frame
   flips into short runs.  Measured: 99.1% frame agreement on the same
   scene, identical for both AGC modes (i.e. not mode-driven).

The precision attribution is VERIFIED, not asserted, in
tests/test_divergence_proof.py: the floor scan is bitwise equal to an
FMA-contraction-faithful oracle, agreement is exactly 100.000% once the
conditioned signal and magnitudes are equalized, and every composed-chain
stable flip is tracker-anchored to a raw extraction flip under
precision-bounded input differences.

Longer-scene reproduction: tools/fullchain_divergence.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.parallel.sharding import (_single_stream_step,
                                                     full_chain_np,
                                                     init_stream_states)

SR = 48000.0


def device_chain(audio, dyn_mode):
    states = jax.tree.map(lambda a: a[0], init_stream_states(1))
    single = partial(_single_stream_step, sample_rate=SR, slot_len=1024,
                     pitch_hop=512, onset_hop=64, dyn_mode=dyn_mode)
    _, (sf, sv, fired, vel, level, gf_db) = jax.jit(
        single, static_argnames=("dyn_mode",))(states, jnp.asarray(audio))
    return (np.asarray(sf), np.asarray(sv), np.asarray(fired),
            np.asarray(vel))


def frame_sets(sf, sv):
    # Integer deci-hertz: float32 vs float64 decimal representations of the
    # same rounded value must compare equal.
    return [sorted(int(round(float(f) * 10)) for f in sf[i][sv[i]])
            for i in range(sf.shape[0])]


def test_fullchain_fast_vs_exact_divergence():
    audio = gen.mixed_scene(25.0, SR, seed=3)
    audio = audio[:(len(audio) // 1024) * 1024]

    sf_h, sv_h, fired_h, vel_h = device_chain(audio, "hist")
    sf_e, sv_e, fired_e, vel_e = device_chain(audio, "exact")
    oracle = full_chain_np(audio, SR)

    # Axis 1: hist AGC vs exact AGC (pure fast-mode divergence).
    sets_h, sets_e = frame_sets(sf_h, sv_h), frame_sets(sf_e, sv_e)
    mode_agree = np.mean([a == b for a, b in zip(sets_h, sets_e)])
    assert mode_agree >= 0.999, f"hist-vs-exact agreement {mode_agree:.4%}"
    np.testing.assert_array_equal(fired_h, fired_e)

    # Axis 2: device chain vs exact NumPy oracle (adds fp32/fp64
    # threshold sensitivity; measured 99.1% on this scene).
    assert len(oracle["stable"]) == sf_h.shape[0]
    sets_o = [sorted(int(round(float(f) * 10)) for f, _ in fr)
              for fr in oracle["stable"]]
    orac_agree = np.mean([a == b for a, b in zip(sets_h, sets_o)])
    assert orac_agree >= 0.98, f"pitch agreement vs oracle {orac_agree:.4%}"

    o_fired = oracle["onset_fired"][:len(fired_h)]
    frame_agree = (fired_h == o_fired).mean()
    assert frame_agree >= 0.999, f"onset frame agreement {frame_agree:.4%}"
    fast_idx = np.flatnonzero(fired_h)
    orac_idx = np.flatnonzero(o_fired)
    assert abs(len(fast_idx) - len(orac_idx)) <= max(1, len(orac_idx) // 20), (
        fast_idx, orac_idx)
    if len(fast_idx) == len(orac_idx) and len(orac_idx):
        assert np.abs(fast_idx - orac_idx).max() <= 2
