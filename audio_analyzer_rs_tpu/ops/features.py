"""Per-frame spectral feature pack: RMS/energy, centroid, rolloff, flux.

The BASELINE config list ("Per-frame feature pack: RMS, spectral centroid,
rolloff, flux over STFT frames") generalizes the reference's per-frame
aggregates (frame_energy ref onset.rs:261-291, slot RMS ref dynamics.rs:195-199).
All features are elementwise/reduction ops XLA fuses with the STFT matmul.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class FrameFeatures(NamedTuple):
    rms: jax.Array            # [N] time-domain RMS per frame
    energy: jax.Array         # [N] sum of spectral magnitudes (ref onset.rs:276)
    centroid_hz: jax.Array    # [N] spectral centroid
    rolloff_hz: jax.Array     # [N] 85% rolloff frequency
    flux: jax.Array           # [N] positive spectral flux vs previous frame


@partial(jax.jit, static_argnames=("sample_rate", "window"))
def feature_pack(frames: jax.Array, mags: jax.Array, sample_rate: float,
                 window: int, rolloff_pct: float = 0.85) -> FrameFeatures:
    """frames [N, W] (unwindowed), mags [N, H] → per-frame features."""
    half = mags.shape[-1]
    bin_hz = jnp.asarray(sample_rate / window, dtype=jnp.float32)
    freqs = jnp.arange(half, dtype=jnp.float32) * bin_hz

    rms = jnp.sqrt(jnp.mean(frames.astype(jnp.float32) ** 2, axis=-1))
    energy = jnp.sum(mags, axis=-1)
    denom = jnp.maximum(energy, 1e-12)
    centroid = jnp.sum(mags * freqs[None, :], axis=-1) / denom

    cum = jnp.cumsum(mags, axis=-1)
    target = rolloff_pct * cum[:, -1:]
    rolloff_bin = jnp.argmax(cum >= target, axis=-1)
    rolloff = rolloff_bin.astype(jnp.float32) * bin_hz

    prev = jnp.concatenate([jnp.zeros_like(mags[:1]), mags[:-1]], axis=0)
    flux = jnp.sum(jnp.maximum(mags - prev, 0.0), axis=-1)

    return FrameFeatures(rms=rms, energy=energy, centroid_hz=centroid,
                         rolloff_hz=rolloff, flux=flux)


def feature_pack_np(frames: np.ndarray, mags: np.ndarray, sample_rate: float,
                    window: int, rolloff_pct: float = 0.85):
    """Float64 NumPy oracle of `feature_pack`."""
    half = mags.shape[-1]
    freqs = np.arange(half) * (sample_rate / window)
    rms = np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=-1))
    energy = mags.sum(axis=-1)
    centroid = (mags * freqs).sum(axis=-1) / np.maximum(energy, 1e-12)
    cum = np.cumsum(mags, axis=-1)
    rolloff_bin = np.argmax(cum >= rolloff_pct * cum[:, -1:], axis=-1)
    rolloff = rolloff_bin * (sample_rate / window)
    prev = np.vstack([np.zeros_like(mags[:1]), mags[:-1]])
    flux = np.maximum(mags - prev, 0.0).sum(axis=-1)
    return rms, energy, centroid, rolloff, flux


def rms_db(rms_linear: jax.Array) -> jax.Array:
    """Linear→dBFS with the reference's 1e-9 floor (ref dynamics.rs:365-368)."""
    return 20.0 * jnp.log10(jnp.maximum(rms_linear, 1e-9))
