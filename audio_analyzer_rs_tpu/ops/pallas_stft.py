"""Fused Pallas STFT kernel: Hann window x rDFT matmul x magnitude.

The XLA path (ops/fft.py) already fuses the window multiply into the DFT
matmul's operand read; this kernel makes the whole frame->magnitude step one
explicit VMEM-resident pass on the MXU, tiled (BN frames x BH bins) so each
grid step computes

    wf  = frames_tile * hann            (VPU)
    re  = wf @ cos_tile                 (MXU)
    im  = wf @ sin_tile                 (MXU)
    out = sqrt(re^2 + im^2)             (VPU, fused epilogue)

without materializing the complex spectrum in HBM.  Bin axis is padded to a
lane multiple (1025 -> 1152) and sliced by the caller.

Per pallas_guide.md: blocks are (8,128)-aligned, matmuls carry
preferred_element_type=f32, and a CostEstimate informs the scheduler.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft import hann_window

BN = 128   # frames per tile (BN=256 overflows the 16MB VMEM budget)
BH = 128   # bins per tile


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@lru_cache(maxsize=4)
def _trig_split(window: int, half_pad: int):
    """cos [W, Hp] and -sin [W, Hp] rDFT matrices (float64-built, f32)."""
    t = np.arange(window, dtype=np.float64)[:, None]
    k = np.arange(half_pad, dtype=np.float64)[None, :]
    # Padded bins compute k >= half values that get sliced away.
    ang = 2.0 * np.pi * t * k / window
    cos = np.cos(ang).astype(np.float32)
    msin = (-np.sin(ang)).astype(np.float32)
    return cos, msin


def _stft_kernel(frames_ref, hann_ref, cos_ref, sin_ref, out_ref):
    wf = frames_ref[:] * hann_ref[:]
    re = jnp.dot(wf, cos_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(wf, sin_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.sqrt(re * re + im * im)


@partial(jax.jit, static_argnames=("window", "interpret"))
def windowed_mags_pallas(frames: jax.Array, window: int = 2048,
                         interpret: bool = False) -> jax.Array:
    """[N, window] frames → [N, window//2+1] magnitudes via the fused kernel.

    N must be a multiple of BN (the streaming analyzers use fixed chunks);
    callers with ragged N should pad or use the XLA backend.
    """
    n = frames.shape[0]
    half = window // 2 + 1
    half_pad = _round_up(half, BH)
    n_pad = _round_up(n, BN)
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))
    cos, msin = _trig_split(window, half_pad)
    hann = np.broadcast_to(hann_window(window)[None, :], (BN, window))

    grid = (n_pad // BN, half_pad // BH)
    out = pl.pallas_call(
        _stft_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, half_pad), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((BN, window), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, window), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((window, BH), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((window, BH), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BN, BH), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * window * half_pad,
            bytes_accessed=(n_pad * window * 4 * (half_pad // BH)
                            + 2 * window * half_pad * 4
                            + n_pad * half_pad * 4),
            transcendentals=n_pad * half_pad,
        ),
        interpret=interpret,
    )(frames.astype(jnp.float32), jnp.asarray(hann),
      jnp.asarray(cos), jnp.asarray(msin))
    return out[:n, :half]
