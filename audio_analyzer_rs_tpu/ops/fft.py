"""Real FFT magnitudes, TPU-first.

Replaces the reference's realfft/rustfft wrapper (ref src/dsp/fft.rs:1-102).
Two device backends:

* ``fft``  — `jnp.fft.rfft` (XLA's native FFT lowering).  The default: on
  TPU v5e it wins end-to-end (segmented pitch pipeline 128.8k vs 96.8k
  frames/s over ``dft``) and compiles ~50x faster (3.4s vs 176s for the
  2048-pt batched program); relative MSE vs a float64 oracle is ~3e-14.
* ``dft``  — GEMM-native rDFT: `frames[N, W] @ trig[W, 2H]` on the MXU, then
  a fused square/add/sqrt.  At W=2048 this is ~75x the FLOPs of a split-radix
  FFT; fp32 with HIGHEST precision keeps |X| within ~3e-14 relative MSE of a
  float64 oracle (validated in tests/test_stft.py).  Kept as a
  cross-validation twin and for backends with weak FFT lowering.

Both return magnitude spectra `[..., W//2+1]` matching `Complex::norm()`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# Measured on TPU v5e (see module docstring): jnp.fft wins wall-clock and
# compile time at both analysis window sizes while matching fidelity.
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


@partial(jax.jit, static_argnames=("backend",))
def rfft_mag(frames: jax.Array, backend: str = DEFAULT_BACKEND) -> jax.Array:
    """Magnitude spectrum of real frames: [..., W] → [..., W//2+1] float32."""
    n = frames.shape[-1]
    half = n // 2 + 1
    if backend == "fft":
        return jnp.abs(jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)).astype(jnp.float32)
    trig = jnp.asarray(_rdft_trig(n))
    re_im = jax.lax.dot_general(
        frames.astype(jnp.float32), trig,
        dimension_numbers=(((frames.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    re_im = re_im.reshape(frames.shape[:-1] + (half, 2))
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
