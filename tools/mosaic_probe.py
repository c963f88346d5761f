"""Probe Mosaic (jax 0.9) support for dynamic lane gathers on TPU.

The fused Pallas comb (ops/pallas_comb.py) needs pm[n*j + c] for all
candidates j from a VMEM-resident row.  Stride-n lane slices are rejected
by Mosaic (`vector.extract_strided_slice` requires stride 1), but
`tpu.dynamic_gather` is exposed via `jnp.take_along_axis(x, idx, axis=1)`
when idx.shape == x.shape (lowering.py:_gather_lowering_rule).  This
checks whether lane indices may span the full row (cross-tile) or only
their own 128-lane tile, and times a comb-shaped gather.

Usage: python tools/mosaic_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_kernel(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)


def run_gather(tag, f, p, idx_np):
    x_np = np.arange(f * p, dtype=np.float32).reshape(f, p)
    try:
        out = pl.pallas_call(
            gather_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((f, p), jnp.float32),
        )(jnp.asarray(x_np), jnp.asarray(idx_np))
        got = np.asarray(out)
        want = np.take_along_axis(x_np, idx_np, axis=1)
        ok = np.array_equal(got, want)
        print(f"{tag:24s} LOWERS  correct={ok}")
        if not ok:
            bad = np.flatnonzero((got != want).ravel())[:4]
            print(f"    first diffs at flat {bad}: got "
                  f"{got.ravel()[bad]} want {want.ravel()[bad]}")
        return ok
    except Exception as e:
        lines = str(e).splitlines() or ["?"]
        print(f"{tag:24s} FAIL  {lines[0][:120]}")
        return False


def main():
    print(f"jax {jax.__version__}  devices={jax.devices()}", file=sys.stderr)
    f, p = 8, 1024

    # within-tile indices (each lane reads inside its own 128 tile)
    base = (np.arange(p) // 128) * 128
    idx_tile = (base + (np.arange(p) * 7) % 128).astype(np.int32)
    run_gather("lane_gather_intile", f, p,
               np.broadcast_to(idx_tile, (f, p)).copy())

    # cross-tile indices (stride-3 read pattern like the comb's harmonic 3)
    idx_cross = ((np.arange(p) * 3) % p).astype(np.int32)
    run_gather("lane_gather_crosstile", f, p,
               np.broadcast_to(idx_cross, (f, p)).copy())

    # per-row differing indices
    rng = np.random.default_rng(0)
    idx_rand = rng.integers(0, p, size=(f, p)).astype(np.int32)
    run_gather("lane_gather_random", f, p, idx_rand)

    # comb-shaped: row length 7216 padded to 7296 (57 tiles), gather it
    p2 = 7296
    idx2 = ((np.arange(p2) * 13) % p2).astype(np.int32)
    ok = run_gather("lane_gather_7296", f, p2,
                    np.broadcast_to(idx2, (f, p2)).copy())

    if ok:
        # crude timing: 12 gathers (one per harmonic) over [8, 7296]
        def kern(x_ref, i_ref, o_ref):
            x = x_ref[:]
            acc = jnp.zeros_like(x)
            for n in range(12):
                acc = acc + jnp.take_along_axis(
                    x, (i_ref[:] + n) % p2, axis=1)
            o_ref[:] = acc

        x = jnp.asarray(np.zeros((f, p2), np.float32))
        i = jnp.asarray(np.broadcast_to(idx2, (f, p2)).copy())
        call = jax.jit(lambda: pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((f, p2), jnp.float32),
        )(x, i))
        np.asarray(call())
        t0 = time.perf_counter()
        for _ in range(50):
            out = call()
        np.asarray(out)
        dt = (time.perf_counter() - t0) / 50
        print(f"12x gather [8,7296]: {dt*1e6:.1f} us/call")


if __name__ == "__main__":
    main()
