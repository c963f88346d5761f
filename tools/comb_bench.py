"""Measure the fused Pallas comb against the XLA comb on the real TPU.

Three measurements at the bench geometry (window 2048, candidate band
~464 bins):
  1. standalone batched extract_pitches on [N, 1025] spectra;
  2. the full pitch step (STFT + banded floor scan + comb + tracker) under
     64-segment vmap — the headline configuration;
  3. exactness of the compiled kernel vs the XLA comb on the same inputs
     (interpret-mode exactness is covered by tests; this checks Mosaic).

Usage: python tools/comb_bench.py [--frames 2048] [--cpu]
Prints one JSON line; notes on stderr.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend (pallas runs via interpret=False will "
                         "fail; standalone xla numbers only)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_analyzer_rs_tpu.models import generators as gen
    from audio_analyzer_rs_tpu.models.analyzer import pitch_analyze_frames
    from audio_analyzer_rs_tpu.ops import noisefloor, pitch as pitch_ops
    from audio_analyzer_rs_tpu.ops import tracker
    from audio_analyzer_rs_tpu.ops.stft import stft_mags
    from audio_analyzer_rs_tpu.utils.framing import frame_signal

    sr = 44100.0
    window, hop = 2048, 512
    half = window // 2 + 1
    bin_w = float(np.float32(sr) / np.float32(window))
    n = args.frames

    audio = gen.mixed_scene((n * hop + window) / sr + 1.0, sr, seed=2)
    mags = stft_mags(audio[: n * hop + window], window, hop)[:n]
    kc = pitch_ops.candidate_band(bin_w, half)
    nf = jnp.full((n, kc), 1e-4, jnp.float32)

    results = {"frames": n}

    def timeit(tag, fn, iters=10):
        out = fn()
        jax.tree.map(lambda a: np.asarray(a), out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.tree.map(lambda a: np.asarray(a), out)
        dt = (time.perf_counter() - t0) / iters
        fps = n / dt
        results[tag + "_fps"] = round(fps, 0)
        print(f"{tag:28s} {dt*1000:8.2f} ms  {fps:12,.0f} frames/s",
              file=sys.stderr)
        return out

    # 1. standalone comb backends (the Pallas kernel does not compile on
    # v5e/jax-0.9 — Mosaic rejects stride-n lane slices and dynamic lane
    # gathers crash the compiler, see tools/mosaic_probe.py — so its
    # failure is recorded, not fatal)
    out_x = timeit("extract_xla",
                   lambda: pitch_ops.extract_pitches(mags, nf, bin_w,
                                                     comb="xla"))
    try:
        pitch_ops.PALLAS_COMB_UNBLOCKED = True   # canary: re-probe the gate
        out_p = timeit("extract_pallas",
                       lambda: pitch_ops.extract_pitches(mags, nf, bin_w,
                                                         comb="pallas"))
        exact = (np.array_equal(np.asarray(out_x.freqs),
                                np.asarray(out_p.freqs))
                 and np.array_equal(np.asarray(out_x.scores),
                                    np.asarray(out_p.scores))
                 and np.array_equal(np.asarray(out_x.valid),
                                    np.asarray(out_p.valid)))
        results["compiled_exact"] = bool(exact)
        print(f"compiled kernel exactness vs xla: {exact}", file=sys.stderr)
    except Exception as e:
        results["pallas_error"] = str(e).splitlines()[0][:120]
        print(f"pallas comb does not compile: {results['pallas_error']}",
              file=sys.stderr)

    # 2. full pitch step under 64-segment vmap (the headline config)
    segs, cf = 64, 256
    chunk_samples = (cf - 1) * hop + window
    seg_audio = jnp.broadcast_to(
        jnp.asarray(audio[:chunk_samples]), (segs, chunk_samples))

    def rep(s):
        return jax.tree.map(lambda a: jnp.broadcast_to(a, (segs,) + a.shape), s)

    def step(comb):
        nf_s = rep(noisefloor.init_state(half))
        tr_s = rep(tracker.init_state())
        gf = jnp.full((segs, cf), 1e-3, jnp.float32)
        on = jnp.zeros((segs, cf), bool)

        def one(nf1, tr1, a, g, o):
            frames = frame_signal(a, window, hop)
            return pitch_analyze_frames(nf1, tr1, frames, g, o, sr,
                                        window, hop, comb=comb)
        f = jax.jit(lambda: jax.vmap(one)(nf_s, tr_s, seg_audio, gf, on))
        return f

    for comb in ("xla",):
        f = step(comb)
        outs = f()
        np.asarray(outs[2].stable_valid).sum()
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            outs = f()
        np.asarray(outs[2].stable_valid).sum()
        dt = (time.perf_counter() - t0) / iters
        fps = segs * cf / dt
        results[f"step64x256_{comb}_fps"] = round(fps, 0)
        print(f"step 64x256 comb={comb:7s} {dt*1000:8.2f} ms  "
              f"{fps:12,.0f} frames/s", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
