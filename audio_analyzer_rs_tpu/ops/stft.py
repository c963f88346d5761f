"""Batched STFT: frame → Hann window → rDFT magnitude.

The reference computes one 2048-pt FFT per 512-sample hop on a worker thread
(ref src/audio_io/stft.rs:273-318) and one 256-pt FFT per 64-sample hop for
onsets (ref src/analysis/onset.rs:244-272).  Here all frames are computed in
one batched device program; XLA fuses the gather (framing) and the windowing
multiply into the DFT matmul's operand read, so the whole pipeline is a
single HBM pass per frame block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.framing import frame_signal, num_frames
from .fft import DEFAULT_BACKEND, hann_window, rfft_mag

# Pitch-analysis geometry (ref stft.rs:169-171).
PITCH_WINDOW = 2048
PITCH_HOP = 512
# Onset-analysis geometry (ref onset.rs:122-125).
ONSET_WINDOW = 256
ONSET_HOP = 64


@partial(jax.jit, static_argnames=("window", "hop", "backend"))
def stft_mags(x: jax.Array, window: int = PITCH_WINDOW, hop: int = PITCH_HOP,
              backend: str = DEFAULT_BACKEND) -> jax.Array:
    """[n] float32 mono → [num_frames, window//2+1] magnitude spectra."""
    frames = frame_signal(x, window, hop)
    win = jnp.asarray(hann_window(window))
    return rfft_mag(frames * win[None, :], backend=backend)


@partial(jax.jit, static_argnames=("window", "backend"))
def windowed_mags(frames: jax.Array, window: int = PITCH_WINDOW,
                  backend: str = DEFAULT_BACKEND) -> jax.Array:
    """[N, window] pre-framed audio → [N, window//2+1] magnitudes.

    backend: "fft" (jnp.fft — the default, fastest end-to-end on TPU v5e),
    "dft" (MXU matmul via XLA), or "pallas" (fused VMEM-resident kernel,
    ops/pallas_stft.py; TPU only — fastest for *standalone* magnitude
    extraction at window 2048, but slow under segment vmap).
    """
    if backend == "pallas":
        from .pallas_stft import windowed_mags_pallas
        return windowed_mags_pallas(frames, window)
    win = jnp.asarray(hann_window(window))
    return rfft_mag(frames * win[None, :], backend=backend)


def stft_mags_np(x: np.ndarray, window: int = PITCH_WINDOW,
                 hop: int = PITCH_HOP) -> np.ndarray:
    """Float64 NumPy oracle of `stft_mags` (reference-transcribed semantics)."""
    n = num_frames(len(x), window, hop)
    win = hann_window(window).astype(np.float64)
    out = np.empty((n, window // 2 + 1), dtype=np.float64)
    for i in range(n):
        seg = x[i * hop:i * hop + window].astype(np.float64) * win
        out[i] = np.abs(np.fft.rfft(seg))
    return out
