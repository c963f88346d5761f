"""Measure STFT-stage variants at the bench geometry.

The stage ablation (tools/step_ablation.py) shows the Hann x rFFT magnitude
stage at ~30% of the headline step.  The pitch pipeline only ever *reads*
spectrum bins [0, kc+1) (kc = ops.pitch.candidate_band, ~465 of 1025 at
44.1 kHz / 2048): peaks, parabolic interpolation, the banded noise floor, and
the comb's peak-masked slab all live below the 10 kHz candidate cap
(ref src/audio_io/stft.rs:455,463), and harmonic matches must themselves be
peaks (ref stft.rs:517-521).  So a *banded* rDFT — frames @ trig[:, :2*(kc+1)]
on the MXU — computes only what is consumed.

Variants measured (stage-only, vmapped over the segment axis like the bench):
  fft            jnp.fft.rfft full 1025 bins (current default)
  fft_slice      jnp.fft.rfft then slice [:, :kc+1]  (tests output-write cost)
  dft_full       GEMM rDFT, 1025 bins, HIGHEST precision
  dft_band       GEMM rDFT, kc+1 bins, HIGHEST precision
  dft_band_high  GEMM rDFT, kc+1 bins, HIGH precision (3-pass bf16)
  dft_band_def   GEMM rDFT, kc+1 bins, DEFAULT precision (1-pass bf16)

Each row also reports max|rel err| and rel MSE vs a float64 oracle over the
banded bins (the fidelity gate for adoption: rel MSE < 1e-6, and pitch-output
flips measured separately before switching the default).

Usage: python tools/stft_variants.py [--segments 128] [--chunk-frames 64]
       [--iters 24] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=128)
    ap.add_argument("--chunk-frames", type=int, default=64)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_analyzer_rs_tpu.models import generators as gen
    from audio_analyzer_rs_tpu.ops import pitch as pitch_ops
    from audio_analyzer_rs_tpu.ops.fft import _rdft_trig, hann_window
    from audio_analyzer_rs_tpu.utils.framing import frame_signal

    sr = 44100.0
    window, hop = 2048, 512
    half = window // 2 + 1
    bin_w = float(np.float32(sr) / np.float32(window))
    kc = pitch_ops.candidate_band(bin_w, half)
    band = kc + 1
    segs, cf = args.segments, args.chunk_frames
    chunk_samples = (cf - 1) * hop + window

    # Deterministically non-silent chunk (mixed_scene sections can be
    # silent gaps, which makes the relative-error fidelity 0/0): harmonic
    # tone + broadband bed, like the bench chunk.
    rng = np.random.default_rng(3)
    base = gen.tone_with_harmonics(220.0, chunk_samples / sr, sr,
                                   harmonics=8)[:chunk_samples]
    base = (base + rng.standard_normal(chunk_samples) * 1e-3).astype(np.float32)
    assert np.max(np.abs(base)) > 1e-3, "fidelity chunk is silent"
    audio = jnp.broadcast_to(jnp.asarray(base), (segs, chunk_samples))
    win = jnp.asarray(hann_window(window))
    trig_full = jnp.asarray(_rdft_trig(window))
    trig_band = jnp.asarray(_rdft_trig(window)[:, :2 * band])

    def dft(frames, trig, precision):
        re_im = jax.lax.dot_general(
            frames, trig,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        h = trig.shape[1] // 2
        re_im = re_im.reshape(frames.shape[0], h, 2)
        return jnp.sqrt(re_im[..., 0] ** 2 + re_im[..., 1] ** 2)

    P = jax.lax.Precision

    def make(fn):
        def stage(a):
            def one(row):
                return fn(frame_signal(row, window, hop) * win[None, :])
            m = jax.vmap(one)(a)
            return jnp.sum(m[:, :, 0])
        return jax.jit(stage)

    variants = {
        "fft": make(lambda f: jnp.abs(jnp.fft.rfft(f, axis=-1))
                    .astype(jnp.float32)),
        "fft_slice": make(lambda f: jnp.abs(jnp.fft.rfft(f, axis=-1))
                          .astype(jnp.float32)[:, :band]),
        "dft_full": make(lambda f: dft(f, trig_full, P.HIGHEST)),
        "dft_band": make(lambda f: dft(f, trig_band, P.HIGHEST)),
        "dft_band_high": make(lambda f: dft(f, trig_band, P.HIGH)),
        "dft_band_def": make(lambda f: dft(f, trig_band, P.DEFAULT)),
    }

    # Fidelity vs float64 oracle on the banded bins (one segment's frames).
    frames_np = np.asarray(frame_signal(jnp.asarray(base), window, hop))
    wf = frames_np.astype(np.float64) * np.asarray(win, np.float64)[None, :]
    oracle = np.abs(np.fft.rfft(wf, axis=-1))[:, :band]

    def fidelity(fn):
        f32 = (frames_np * np.asarray(win)[None, :]).astype(np.float32)
        m = np.asarray(fn(jnp.asarray(f32)))[:, :band]
        rel_mse = float(np.mean((m - oracle) ** 2) / np.mean(oracle ** 2))
        denom = np.maximum(oracle, np.max(oracle) * 1e-9)
        max_rel = float(np.max(np.abs(m - oracle) / denom))
        return rel_mse, max_rel

    fid_fns = {
        "fft": lambda f: jnp.abs(jnp.fft.rfft(f, axis=-1)),
        "fft_slice": lambda f: jnp.abs(jnp.fft.rfft(f, axis=-1))[:, :band],
        "dft_full": lambda f: dft(f, trig_full, P.HIGHEST),
        "dft_band": lambda f: dft(f, trig_band, P.HIGHEST),
        "dft_band_high": lambda f: dft(f, trig_band, P.HIGH),
        "dft_band_def": lambda f: dft(f, trig_band, P.DEFAULT),
    }

    results = {"segments": segs, "chunk_frames": cf, "band": band}
    for tag, fn in variants.items():
        leaf = fn(audio)
        float(leaf)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            leaf = fn(audio)
        float(leaf)
        ms = (time.perf_counter() - t0) / args.iters * 1000
        rel_mse, max_rel = fidelity(jax.jit(fid_fns[tag]))
        results[tag] = {"ms": round(ms, 3), "rel_mse": f"{rel_mse:.2e}",
                        "max_rel_err": f"{max_rel:.2e}"}
        print(f"{tag:14s} {ms:8.3f} ms   rel_mse {rel_mse:.2e}   "
              f"max_rel {max_rel:.2e}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
