"""Fused VMEM-resident harmonic comb (Pallas/Mosaic, TPU).

STATUS — interpret-mode correctness twin only; the compiled path is
BLOCKED on v5e + jax 0.9 (measured 2026-08-17, tools/mosaic_probe.py):
  * stride-n lane slices: Mosaic's `vector.extract_strided_slice`
    verifier requires stride 1, so the natural formulation below fails
    verification on lowering;
  * dynamic lane gathers (`jnp.take_along_axis(x, idx, axis=1)`, the
    `tpu.dynamic_gather` route): every variant (in-tile, cross-tile,
    per-row) crashes the TPU compiler server-side (HTTP 500 from
    tpu_compile_helper);
  * in-kernel reshape (F, K*n) -> (F, K, n): also crashes the compiler.
The motivating measurement instead landed as a pure-XLA fix: per-harmonic
candidate truncation in `_comb_xla` (ops/pitch.py), which removes ~73% of
the comb's slab reads bit-exactly.  This kernel is kept as the validated
fusion blueprint (and regression canary: if a future jax/Mosaic accepts
it, tools/comb_bench.py will time it automatically).

The XLA comb re-reads the peak-magnitude array through strided window
slices per frame, which pins the pitch pipeline at the HBM roof
(docs/PERFORMANCE.md roofline: 123% nominal HBM at 23% of VPU peak).  This
kernel loads each frame's padded peak array into VMEM ONCE (~28 KB) and
runs the identical 13-harmonic / 247-offset first-max scan entirely
on-chip, writing back only the three [kc] outputs.

Math parity: the offset loop is the same ascending-c strict-greater scan
as `_comb_xla` (first maximum wins, matching the Rust ascending walk,
ref src/audio_io/stft.rs:517-528), with the same f32 accumulation order
(score seeded with the fundamental magnitude) — outputs are bit-identical
to the XLA backend (tests/test_pallas_comb.py, interpret mode).

Layout: grid over frame blocks of F=8 (one f32 sublane tile); lanes carry
the kc candidate bins padded to a 128 multiple.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pitch import MAX_HARMONICS

_F = 8           # frames per grid step (f32 sublane tile)
_FRONT = MAX_HARMONICS + 2


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _comb_kernel(pm_ref, frac_ref, fund_ref, score_ref, run_ref, tot_ref,
                 *, kc_pad: int, half: int):
    pm = pm_ref[:]                        # [F, pad_len] (front-padded)
    frac = frac_ref[:]                    # [F, kc_pad]
    k = jax.lax.broadcasted_iota(jnp.int32, (_F, kc_pad), 1)

    score = fund_ref[:]
    last = k
    longest = jnp.zeros((_F, kc_pad), jnp.int32)
    current = jnp.zeros((_F, kc_pad), jnp.int32)
    total = jnp.zeros((_F, kc_pad), jnp.int32)
    for n in range(2, MAX_HARMONICS + 1):
        expected = frac * n
        valid_n = expected < half
        start = jnp.maximum(jnp.floor(expected - 1.0).astype(jnp.int32),
                            last + 1)
        end = jnp.minimum(jnp.ceil(expected + 1.0).astype(jnp.int32),
                          half - 1)
        nk = k * n
        best_mag = jnp.zeros((_F, kc_pad), jnp.float32)
        best_pos = jnp.zeros((_F, kc_pad), jnp.int32)
        for c in range(-n - 1, n + 2):
            # pm[f, n*j + c] for every candidate j: a static stride-n lane
            # slice of the VMEM-resident padded row.
            vals = jax.lax.slice(pm, (0, _FRONT + c),
                                 (_F, _FRONT + c + kc_pad * n), (1, n))
            pos = nk + c
            ok = (pos >= start) & (pos <= end)
            v = jnp.where(ok, vals, 0.0)
            better = v > best_mag            # strict: first (lowest c) wins
            best_mag = jnp.where(better, v, best_mag)
            best_pos = jnp.where(better, pos, best_pos)
        found = best_mag > 0.0
        fe = found & valid_n
        miss = (~found) & valid_n
        score = score + jnp.where(fe, best_mag, 0.0)
        last = jnp.where(fe, best_pos, last)
        longest = jnp.where(miss, jnp.maximum(longest, current), longest)
        current = jnp.where(fe, current + 1, jnp.where(miss, 0, current))
        total = total + fe.astype(jnp.int32)
    longest = jnp.maximum(longest, current)
    score_ref[:] = score
    run_ref[:] = longest
    tot_ref[:] = total


@partial(jax.jit, static_argnames=("half", "interpret"))
def comb_pallas(pm: jax.Array, frac_c: jax.Array, fund_mag: jax.Array,
                half: int, interpret: bool = False):
    """Batched fused comb: pm/frac_c/fund_mag [N, kc] → (score [N, kc],
    longest_run [N, kc] i32, total_harms [N, kc] i32), bit-identical to
    the per-frame `_comb_xla` loop."""
    n, kc = pm.shape
    kc_pad = _round_up(max(kc, 128), 128)
    n_pad = _round_up(max(n, _F), _F)
    pad_len = _FRONT + kc_pad * MAX_HARMONICS + 2 * MAX_HARMONICS + 4

    pm_padded = jnp.zeros((n_pad, pad_len), jnp.float32)
    pm_padded = jax.lax.dynamic_update_slice(pm_padded, pm, (0, _FRONT))
    # Padded lanes must behave like _comb_xla's out-of-band bins: frac = k
    # (delta 0) keeps their masks well-formed; fund 0 keeps scores 0.
    frac_fill = jnp.broadcast_to(
        jnp.arange(kc_pad, dtype=jnp.float32)[None, :], (n_pad, kc_pad))
    frac_p = jax.lax.dynamic_update_slice(frac_fill, frac_c, (0, 0))
    fund_p = jnp.zeros((n_pad, kc_pad), jnp.float32)
    fund_p = jax.lax.dynamic_update_slice(fund_p, fund_mag, (0, 0))

    grid = (n_pad // _F,)
    row = lambda i: (i, 0)
    score, run, tot = pl.pallas_call(
        partial(_comb_kernel, kc_pad=kc_pad, half=half),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_F, pad_len), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_F, kc_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_F, kc_pad), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_F, kc_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_F, kc_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_F, kc_pad), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, kc_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, kc_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, kc_pad), jnp.int32),
        ],
        interpret=interpret,
    )(pm_padded, frac_p, fund_p)
    return score[:n, :kc], run[:n, :kc], tot[:n, :kc]
