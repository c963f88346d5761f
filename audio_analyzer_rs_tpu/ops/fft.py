"""Real FFT magnitudes, TPU-first.

Replaces the reference's realfft/rustfft wrapper (ref src/dsp/fft.rs:1-102).
Two device backends:

* ``fft``  — `jnp.fft.rfft` (XLA's native FFT lowering).  The general
  default (DEFAULT_BACKEND): fastest full-spectrum magnitudes and ~50x
  faster to compile than the full-width GEMM (3.4s vs 176s for the 2048-pt
  batched program); relative MSE vs a float64 oracle ~2e-14.
* ``dft``  — GEMM-native rDFT: `frames[N, W] @ trig[W, 2H]` on the MXU, then
  a fused square/add/sqrt.  At W=2048 full width this is ~75x the FLOPs of a
  split-radix FFT and loses to ``fft`` (TPU v5e, tools/stft_variants.py:
  3.63 vs 3.38 ms at the bench geometry) — but the `band` parameter makes it
  the *pitch-pipeline* winner: truncated to the ~465-bin candidate band it
  does ~2.2x less work than full width and beats the (monolithic,
  untruncatable) FFT 2.41 vs 3.38 ms, with *better* fidelity (rel MSE
  7.3e-15 vs 1.9e-14 — one HIGHEST-precision f32 dot per bin vs the FFT's
  cascaded rounding).  See ops.stft.PITCH_BACKEND.

Both return magnitude spectra `[..., W//2+1]` (or `[..., band]`) matching
`Complex::norm()`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# Measured on TPU v5e (see module docstring): jnp.fft wins wall-clock and
# compile time for *full-spectrum* magnitudes at both analysis window sizes.
# The pitch pipeline overrides this with the banded rDFT
# (ops.stft.PITCH_BACKEND), which consumes only the candidate band.
DEFAULT_BACKEND = "fft"


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann, exactly the reference's formula (ref stft.rs:641-648)."""
    i = np.arange(n, dtype=np.float32)
    x = i / np.float32(n)
    return (np.float32(0.5) - np.float32(0.5)
            * np.cos(np.float32(2.0) * np.float32(np.pi) * x)).astype(np.float32)


@lru_cache(maxsize=8)
def _rdft_trig(n: int) -> np.ndarray:
    """[W, 2H] matrix with interleaved cos/-sin columns (built in float64)."""
    half = n // 2 + 1
    t = np.arange(n, dtype=np.float64)[:, None]
    k = np.arange(half, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * t * k / n
    trig = np.empty((n, 2 * half), dtype=np.float32)
    trig[:, 0::2] = np.cos(ang)
    trig[:, 1::2] = -np.sin(ang)
    return trig


@partial(jax.jit, static_argnames=("backend", "band"))
def rfft_mag(frames: jax.Array, backend: str = DEFAULT_BACKEND,
             band: int | None = None) -> jax.Array:
    """Magnitude spectrum of real frames: [..., W] → [..., B] float32.

    `band` (static): compute only the first `band` bins (B = band; default
    B = W//2+1).  The pitch pipeline consumes only the candidate band
    (`ops.pitch.candidate_band` + 1 bins; everything above the 10 kHz cap is
    unread — see models/analyzer.py), so a banded rDFT does ~2.2x less MXU
    work and writes ~2.2x fewer bins.  With backend "fft" the full FFT is
    still computed (XLA's FFT is monolithic); only the output write narrows.
    """
    n = frames.shape[-1]
    half = n // 2 + 1
    if band is None or band >= half:
        band = half
    if backend == "fft":
        mags = jnp.abs(jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)).astype(jnp.float32)
        return mags if band == half else mags[..., :band]
    trig = jnp.asarray(_rdft_trig(n)[:, :2 * band])
    re_im = jax.lax.dot_general(
        frames.astype(jnp.float32), trig,
        dimension_numbers=(((frames.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    re_im = re_im.reshape(frames.shape[:-1] + (band, 2))
    return jnp.sqrt(re_im[..., 0] ** 2 + re_im[..., 1] ** 2)


@partial(jax.jit, static_argnames=("backend",))
def rfft_complex(frames: jax.Array, backend: str = DEFAULT_BACKEND):
    """(re, im) of the rDFT — for callers that need phase (e.g. inverse)."""
    n = frames.shape[-1]
    half = n // 2 + 1
    if backend == "fft":
        spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
        return jnp.real(spec).astype(jnp.float32), jnp.imag(spec).astype(jnp.float32)
    trig = jnp.asarray(_rdft_trig(n))
    re_im = jax.lax.dot_general(
        frames.astype(jnp.float32), trig,
        dimension_numbers=(((frames.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(frames.shape[:-1] + (half, 2))
    return re_im[..., 0], re_im[..., 1]


@jax.jit
def irfft(re: jax.Array, im: jax.Array) -> jax.Array:
    """Inverse real FFT (ref FftProcessor::process_inverse, dsp/fft.rs:39-42).

    realfft's inverse is unnormalized (output scaled by N vs the true
    inverse); we match numpy/realfft convention: irfft(rfft(x)) * N == x * N.
    Here we return the *normalized* signal like `jnp.fft.irfft` — the
    reference never consumes the inverse in production paths.
    """
    return jnp.fft.irfft(re + 1j * im, axis=-1).astype(jnp.float32)


# ── NumPy oracle twins (float64) for parity tests ────────────────────────

def rfft_mag_np(frames: np.ndarray) -> np.ndarray:
    return np.abs(np.fft.rfft(frames.astype(np.float64), axis=-1))
