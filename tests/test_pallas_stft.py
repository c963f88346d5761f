"""Fused Pallas STFT kernel fidelity (interpret mode on the CPU backend)."""

import numpy as np
import pytest

from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.ops.pallas_stft import windowed_mags_pallas
from audio_analyzer_rs_tpu.ops.fft import hann_window, rfft_mag_np
from audio_analyzer_rs_tpu.utils.framing import frame_signal_np

SR = 44100.0


def test_pallas_stft_matches_oracle():
    x = gen.tone_with_harmonics(220.0, 0.5, SR, harmonics=8, amplitude=0.5)
    frames = frame_signal_np(x, 2048, 512)
    mags = np.asarray(windowed_mags_pallas(frames, 2048, interpret=True))
    win = hann_window(2048).astype(np.float64)
    oracle = rfft_mag_np(frames * win)
    assert mags.shape == oracle.shape
    mse = np.mean((mags - oracle) ** 2) / np.mean(oracle ** 2)
    assert mse < 1e-6, mse


def test_pallas_stft_ragged_n_padded():
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((10, 2048)).astype(np.float32)  # N not %256
    mags = np.asarray(windowed_mags_pallas(frames, 2048, interpret=True))
    assert mags.shape == (10, 1025)
    win = hann_window(2048).astype(np.float64)
    oracle = rfft_mag_np(frames * win)
    mse = np.mean((mags - oracle) ** 2) / np.mean(oracle ** 2)
    assert mse < 1e-6, mse


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="compiled Mosaic kernel needs a real TPU "
           "(run: AAT_TEST_PLATFORM=tpu pytest tests/test_pallas_stft.py "
           "-k compiled)")
def test_pallas_stft_compiled_on_tpu():
    """Compiled-mode fidelity of the production `backend="pallas"` branch
    (ops/stft.py windowed_mags) — the interpret-mode tests above cannot
    catch a Mosaic lowering regression."""
    x = gen.tone_with_harmonics(220.0, 0.5, SR, harmonics=8, amplitude=0.5)
    frames = frame_signal_np(x, 2048, 512)
    mags = np.asarray(windowed_mags_pallas(frames, 2048, interpret=False))
    win = hann_window(2048).astype(np.float64)
    oracle = rfft_mag_np(frames * win)
    mse = np.mean((mags - oracle) ** 2) / np.mean(oracle ** 2)
    assert mse < 1e-6, mse
