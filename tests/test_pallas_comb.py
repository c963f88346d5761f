"""Fused Pallas comb vs the XLA comb: bit-identical outputs.

Runs the kernel in interpret mode on the CPU backend (Mosaic compilation
needs a real TPU; the interpreter executes the same program).  The real-TPU
compiled path is exercised by tools/comb_bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.ops import pitch as pitch_ops
from audio_analyzer_rs_tpu.ops.pallas_comb import comb_pallas
from audio_analyzer_rs_tpu.ops.stft import stft_mags

SR = 44100.0
HALF = 1025
BIN_W = float(np.float32(SR) / np.float32(2048))


def _spectra():
    """A realistic batch of magnitude frames: harmonic tones + noise."""
    x = np.concatenate([
        gen.tone_with_harmonics(220.0, 0.4, SR, harmonics=10, amplitude=0.4),
        gen.tone_with_harmonics(523.25, 0.4, SR, harmonics=6, amplitude=0.3),
        (np.random.default_rng(0).standard_normal(int(0.4 * SR)) * 0.05
         ).astype(np.float32),
    ])
    return np.asarray(stft_mags(x, 2048, 512))     # [N, 1025]


def _pre(mags):
    min_bin = max(int(np.ceil(pitch_ops.MIN_FREQ / BIN_W)), 1)
    max_bin = min(int(np.floor(pitch_ops.MAX_FREQ / BIN_W)), HALF - 2)
    kc = min(HALF - 1, max(max_bin, pitch_ops.TOP_K))
    nf = np.full((mags.shape[0], kc), 1e-4, np.float32)
    from functools import partial
    pm, frac, fund, _, _ = jax.vmap(
        partial(pitch_ops._pre_comb, min_bin=min_bin, max_bin=max_bin,
                kc=kc))(mags, nf)
    return pm, frac, fund


def test_pallas_comb_bit_identical_to_xla():
    mags = _spectra()
    pm, frac, fund = _pre(mags)

    score_x, run_x, tot_x = jax.vmap(
        lambda p, f, m: pitch_ops._comb_xla(p, f, m, HALF))(pm, frac, fund)
    score_p, run_p, tot_p = comb_pallas(pm, frac, fund, HALF,
                                        interpret=True)

    np.testing.assert_array_equal(np.asarray(score_x), np.asarray(score_p))
    np.testing.assert_array_equal(np.asarray(run_x), np.asarray(run_p))
    np.testing.assert_array_equal(np.asarray(tot_x), np.asarray(tot_p))


def test_extract_pitches_pallas_backend_matches():
    """End-to-end extract_pitches with comb="pallas" equals the default."""
    mags = _spectra()
    kc = pitch_ops.candidate_band(BIN_W, HALF)
    nf = np.full((mags.shape[0], kc), 1e-4, np.float32)
    ref = pitch_ops.extract_pitches(mags, nf, BIN_W)
    got = pitch_ops.extract_pitches(mags, nf, BIN_W,
                                    comb="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(ref.freqs), np.asarray(got.freqs))
    np.testing.assert_array_equal(np.asarray(ref.scores),
                                  np.asarray(got.scores))
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))


def test_pallas_comb_degenerate_inputs():
    """All-zero and single-peak spectra take the guarded paths."""
    n, kc = 8, pitch_ops.candidate_band(BIN_W, HALF)
    pm = np.zeros((n, kc), np.float32)
    frac = np.broadcast_to(np.arange(kc, dtype=np.float32), (n, kc)).copy()
    fund = np.zeros((n, kc), np.float32)
    pm[3, 40] = 1.0
    pm[3, 80] = 0.5     # harmonic 2 of bin 40
    fund[3] = pm[3]
    score_x, run_x, tot_x = jax.vmap(
        lambda p, f, m: pitch_ops._comb_xla(p, f, m, HALF))(
            jax.numpy.asarray(pm), jax.numpy.asarray(frac),
            jax.numpy.asarray(fund))
    score_p, run_p, tot_p = comb_pallas(pm, frac, fund, HALF, interpret=True)
    np.testing.assert_array_equal(np.asarray(score_x), np.asarray(score_p))
    np.testing.assert_array_equal(np.asarray(run_x), np.asarray(run_p))
    np.testing.assert_array_equal(np.asarray(tot_x), np.asarray(tot_p))


def test_pallas_comb_under_segment_vmap():
    """The segmented pipeline vmaps extract_pitches over segments; the
    pallas_call batching rule must preserve exactness there too."""
    mags = _spectra()[:32]
    seg_m = np.stack([mags, (mags * 0.5).astype(np.float32)])
    kc = pitch_ops.candidate_band(BIN_W, HALF)
    nf = np.full((2, mags.shape[0], kc), 1e-4, np.float32)
    ref = jax.vmap(
        lambda m, f: pitch_ops.extract_pitches(m, f, BIN_W))(seg_m, nf)
    got = jax.vmap(
        lambda m, f: pitch_ops.extract_pitches(
            m, f, BIN_W, comb="pallas_interpret"))(seg_m, nf)
    np.testing.assert_array_equal(np.asarray(ref.freqs), np.asarray(got.freqs))
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))


def test_compiled_pallas_comb_is_gated():
    """comb="pallas" (compiled) cannot lower on this stack (Mosaic rejects
    the kernel — ops/pallas_comb.py STATUS); dispatch must raise a clear
    NotImplementedError instead of shipping an untestable branch, unless
    the probe flag is set (tools/comb_bench.py re-tests new toolchains)."""
    import pytest
    from audio_analyzer_rs_tpu.ops import pitch as pitch_ops

    mags = jnp.ones((4, HALF), jnp.float32)
    nf = jnp.full((4, HALF), 1e-3, jnp.float32)
    assert not pitch_ops.PALLAS_COMB_UNBLOCKED
    with pytest.raises(NotImplementedError, match="Mosaic"):
        pitch_ops.extract_pitches(mags, nf, BIN_W, comb="pallas")
