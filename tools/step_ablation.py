"""Stage-level ablation of the headline segment-parallel pitch step.

The roofline (tools/roofline.py) says the step is HBM-bound in aggregate but
XLA's cost analysis can't attribute time to stages.  This measures the step
with stages successively enabled, at the bench geometry, so the difference
between consecutive rows is each stage's marginal cost:

  stft          frame -> Hann x rFFT magnitude only
  +floor        + banded per-bin noise-floor scan
  +precomb      + peak mask / parabolic interpolation (no harmonic loop)
  +comb         + full 13-harmonic comb (= extract_pitches w/o tracker)
  +tracker      + tracker scan  (== the full bench step)

Usage: python tools/step_ablation.py [--segments 128] [--chunk-frames 128]
       [--iters 12] [--cpu]
Prints one JSON line; per-row notes on stderr.
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
    ap.add_argument("--chunk-frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_analyzer_rs_tpu.models import generators as gen
    from audio_analyzer_rs_tpu.ops import noisefloor, pitch as pitch_ops, tracker
    from audio_analyzer_rs_tpu.ops.pitch import _pre_comb
    from audio_analyzer_rs_tpu.ops.stft import windowed_mags
    from audio_analyzer_rs_tpu.utils.framing import frame_signal

    sr = 44100.0
    window, hop = 2048, 512
    half = window // 2 + 1
    bin_w = float(np.float32(sr) / np.float32(window))
    min_bin = max(int(np.ceil(pitch_ops.MIN_FREQ / bin_w)), 1)
    max_bin = min(int(np.floor(pitch_ops.MAX_FREQ / bin_w)), half - 2)
    kc = pitch_ops.candidate_band(bin_w, half)
    segs, cf = args.segments, args.chunk_frames
    chunk_samples = (cf - 1) * hop + window
    frames_per_step = segs * cf

    base = gen.mixed_scene(chunk_samples / sr + 0.5, sr, seed=3)[:chunk_samples]
    audio = jnp.broadcast_to(jnp.asarray(base), (segs, chunk_samples))
    gf = jnp.full((segs, cf), 1e-3, jnp.float32)
    on = jnp.zeros((segs, cf), bool)

    def rep(state):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (segs,) + a.shape), state)
    nf0 = rep(noisefloor.init_state(half))
    tr0 = rep(tracker.init_state())

    # Each variant is a jitted fn of (nf_states, tr_states) -> small readback
    # leaf, so timing includes the same state threading as the bench step.
    def v_stft(nf, tr):
        def one(a):
            return windowed_mags(frame_signal(a, window, hop), window)
        mags = jax.vmap(one)(audio)
        return nf, tr, jnp.sum(mags[:, :, 0])

    def v_floor(nf, tr):
        def one(nf1, a, g):
            mags = windowed_mags(frame_signal(a, window, hop), window)
            nf2, eff = noisefloor.noise_floor_scan(nf1, mags, g, kc)
            return nf2, jnp.sum(eff[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def v_precomb(nf, tr):
        def one(nf1, a, g):
            mags = windowed_mags(frame_signal(a, window, hop), window)
            nf2, eff = noisefloor.noise_floor_scan(nf1, mags, g, kc)
            pm, frac_c, m_c, is_peak, _ = jax.vmap(
                lambda m, f: _pre_comb(m, f, min_bin, max_bin, kc)
            )(mags, eff)
            return nf2, jnp.sum(pm[:, 0]) + jnp.sum(frac_c[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def v_comb(nf, tr):
        def one(nf1, a, g):
            mags = windowed_mags(frame_signal(a, window, hop), window)
            nf2, eff = noisefloor.noise_floor_scan(nf1, mags, g, kc)
            pf = pitch_ops.extract_pitches(mags, eff, bin_w)
            return nf2, jnp.sum(pf.scores[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def v_full(nf, tr):
        def one(nf1, tr1, a, g, o):
            mags = windowed_mags(frame_signal(a, window, hop), window)
            nf2, eff = noisefloor.noise_floor_scan(nf1, mags, g, kc)
            pf = pitch_ops.extract_pitches(mags, eff, bin_w)
            tr2, (sf, ss, sv) = tracker.tracker_scan(
                tr1, pf.freqs, pf.scores, pf.valid, o)
            return nf2, tr2, jnp.sum(sf[:, 0])
        nf2, tr2, leaf = jax.vmap(one)(nf, tr, audio, gf, on)
        return nf2, tr2, jnp.sum(leaf)

    variants = [("stft", v_stft), ("+floor", v_floor), ("+precomb", v_precomb),
                ("+comb", v_comb), ("+tracker", v_full)]
    results = {"segments": segs, "chunk_frames": cf}
    prev_ms = 0.0
    for tag, fn in variants:
        f = jax.jit(fn)
        nf, tr, leaf = f(nf0, tr0)
        float(leaf)                      # force
        t0 = time.perf_counter()
        nf, tr = nf0, tr0
        for _ in range(args.iters):
            nf, tr, leaf = f(nf, tr)
        float(leaf)
        dt = (time.perf_counter() - t0) / args.iters
        ms = dt * 1000
        fps = frames_per_step / dt
        results[tag.lstrip("+") + "_ms"] = round(ms, 2)
        print(f"{tag:10s} {ms:8.2f} ms  (+{ms - prev_ms:7.2f} ms marginal)  "
              f"{fps:12,.0f} frames/s", file=sys.stderr)
        prev_ms = ms
    print(json.dumps(results))


if __name__ == "__main__":
    main()
