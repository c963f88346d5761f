"""Randomized oracle-parity fuzz across the device kernels (compact version
of the heavy 210-trial battery run during development — incl. the
sparse-spectrum case that exercises the zero-neighbor ln() guard)."""

import numpy as np
import pytest

from audio_analyzer_rs_tpu.ops import noisefloor, onset as onset_ops, pitch

SR, W = 44100.0, 2048
H = W // 2 + 1
BW = SR / W


def _spectrum(rng, kind):
    if kind == 0:    # dense random
        mags = (rng.random(H).astype(np.float32) * 10.0) ** 2
        floor = np.full(H, float(rng.random() * 3.0 + 0.5), np.float32)
    elif kind == 1:  # harmonic
        mags = np.full(H, 0.01, np.float32) + rng.random(H).astype(np.float32) * 0.05
        f0 = float(rng.uniform(30, 800))
        for h in range(1, 15):
            b = f0 * h / BW
            if b >= H - 2:
                break
            mags[int(round(b))] += float(rng.uniform(5, 120)) / h
        floor = np.full(H, 0.05, np.float32)
    else:            # sparse spikes with exact-zero neighbors
        mags = np.zeros(H, np.float32)
        for _ in range(rng.integers(1, 30)):
            mags[rng.integers(2, H - 2)] = float(rng.uniform(0.1, 50))
        floor = np.full(H, float(rng.uniform(0.01, 1.0)), np.float32)
    return mags, floor


@pytest.mark.parametrize("kind", [0, 1, 2])
def test_fuzz_extract_pitches(kind, rng):
    for trial in range(6):
        mags, floor = _spectrum(rng, kind)
        out = pitch.extract_pitches(mags[None], floor[None], BW)
        got = [(float(f), float(s)) for f, s, v in
               zip(np.asarray(out.freqs[0]), np.asarray(out.scores[0]),
                   np.asarray(out.valid[0])) if v]
        want = pitch.extract_pitches_np(mags, floor, BW)
        assert len(got) == len(want), (kind, trial, got, want)
        for g, w in zip(got, want):
            assert abs(g[0] - w[0]) / max(w[0], 1e-9) < 1e-3
            assert abs(g[1] - w[1]) < max(1e-3 * abs(w[1]), 1e-3)


def test_fuzz_onset_with_calibration_hold(rng):
    for trial in range(5):
        n = 60
        mags = (rng.random((n, 129)).astype(np.float32)
                * float(rng.uniform(0.5, 3)))
        for _ in range(rng.integers(1, 5)):
            mags[rng.integers(5, n - 1)] *= float(rng.uniform(5, 40))
        gf = np.full(n, float(rng.uniform(0.001, 0.2)), np.float32)
        ts = rng.random(n) < 0.1
        ch = rng.random(n) < 0.2
        st = onset_ops.init_state()
        _, out = onset_ops.onset_scan(st, mags, gf, ts, ch)
        orc = onset_ops.onset_np(mags, gf, ts, ch)
        np.testing.assert_array_equal(np.asarray(out.fired), orc["fired"])


def test_fuzz_noisefloor(rng):
    for trial in range(4):
        n = 40
        mags = (rng.random((n, H)).astype(np.float32)
                * float(rng.uniform(0.5, 20)))
        gf = rng.random(n).astype(np.float32) * 2.0
        st = noisefloor.init_state(H)
        _, eff = noisefloor.noise_floor_scan(st, mags, gf)
        orc = noisefloor.noise_floor_np(mags, gf)
        np.testing.assert_allclose(np.asarray(eff), orc, rtol=5e-4, atol=1e-5)
