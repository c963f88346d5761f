"""Stage-level ablation of the headline segment-parallel pitch step.

The roofline (tools/roofline.py) says the step is HBM-bound in aggregate but
XLA's cost analysis can't attribute time to stages.  This measures the step
with stages successively enabled, at the bench geometry, so the difference
between consecutive rows is each stage's marginal cost:

  stft          frame -> Hann x rFFT magnitude only
  +floor        + banded per-bin noise-floor scan
  +precomb      + peak mask / parabolic interpolation (no harmonic loop)
  +combloop     + the 13-harmonic comb state machine only
  +gates        + score gates (low-fund / structure / log2 / struct mult)
  +topk         + lax.top_k candidate selection (K=32)
  +gather       + payload pickup via take_along_axis — the OLD
                  formulation, kept as the A/B reference for the
                  gather-free pickup (ops/pitch.py item 12; measured
                  2.7 ms of the step, which is why later rows can be
                  CHEAPER than this one)
  +ghost        + harmonic-ghost suppression
  +comb         + greedy dedup, output scatter (= extract_pitches w/o
                  tracker, with the production gather-free pickup)
  +tracker      + tracker scan  (== the full bench step, nested form)

Usage: python tools/step_ablation.py [--segments 128] [--chunk-frames 128]
       [--iters 12] [--cpu] [--backend fft|dft|dft_band]
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
    ap.add_argument("--backend", default=None,
                    help="STFT backend (default ops.stft.DEFAULT_BACKEND; "
                         "'dft_band' measures the production pitch path)")
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

    from audio_analyzer_rs_tpu.ops.stft import DEFAULT_BACKEND
    backend = args.backend or DEFAULT_BACKEND
    if backend.endswith("_band"):
        stft_base, stft_band = backend[:-len("_band")], kc + 1
    else:
        stft_base, stft_band = backend, None

    def mags_of(a):
        return windowed_mags(frame_signal(a, window, hop), window,
                             backend=stft_base, band=stft_band)

    def rep(state):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (segs,) + a.shape), state)
    nf0 = rep(noisefloor.init_state(half))
    tr0 = rep(tracker.init_state())

    # Each variant is a jitted fn of (nf_states, tr_states) -> small readback
    # leaf, so timing includes the same state threading as the bench step.
    from audio_analyzer_rs_tpu.ops.pitch import (MAX_HARMONICS, TOP_K,
                                                 _comb_xla)

    def v_stft(nf, tr):
        mags = jax.vmap(mags_of)(audio)
        return nf, tr, jnp.sum(mags[:, :, 0])

    def v_floor(nf, tr):
        def one(nf1, a, g):
            nf2, eff = noisefloor.noise_floor_scan(nf1, mags_of(a), g, kc)
            return nf2, jnp.sum(eff[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def _to_precomb(nf1, a, g):
        mags = mags_of(a)
        nf2, eff = noisefloor.noise_floor_scan(nf1, mags, g, kc)
        pm, frac_c, m_c, is_peak, degen = jax.vmap(
            lambda m, f: _pre_comb(m, f, min_bin, max_bin, kc))(mags, eff)
        return nf2, eff, pm, frac_c, m_c, is_peak, degen

    def v_precomb(nf, tr):
        def one(nf1, a, g):
            nf2, _, pm, frac_c, _, _, _ = _to_precomb(nf1, a, g)
            return nf2, jnp.sum(pm[:, 0]) + jnp.sum(frac_c[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def _to_combloop(nf1, a, g):
        nf2, eff, pm, frac_c, m_c, is_peak, degen = _to_precomb(nf1, a, g)
        score, lr, th = jax.vmap(
            lambda p, f, m: _comb_xla(p, f, m, half, max_bin))(pm, frac_c,
                                                               m_c)
        return nf2, eff, frac_c, m_c, is_peak, degen, score, lr, th

    def v_combloop(nf, tr):
        def one(nf1, a, g):
            nf2, _, _, _, _, _, score, lr, th = _to_combloop(nf1, a, g)
            return nf2, jnp.sum(score[:, 0]) + jnp.sum(lr[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def _to_gates(nf1, a, g):
        # Mirrors ops/pitch._extract_single's gate block.
        nf2, eff, frac_c, m_c, is_peak, degen, score, lr, th = \
            _to_combloop(nf1, a, g)
        nf_c = eff[:, :kc]
        low_fund = m_c < nf_c * 5.0
        struct_fail = (lr < 3) & (m_c < 15.0 * nf_c)
        log_score = jnp.log2(0.5 + score)
        struct_mult = (1.0 + lr.astype(jnp.float32)
                       + th.astype(jnp.float32) / 2.0) / (1.0 + MAX_HARMONICS)
        scores = jnp.where(is_peak & ~low_fund & ~struct_fail & ~degen,
                           log_score * struct_mult, 0.0)
        peak_scores = jnp.where(is_peak, scores, 0.0)
        max_score = jnp.max(jnp.maximum(peak_scores, 0.0), axis=-1,
                            keepdims=True)
        cand_mask = is_peak & (scores >= max_score * 0.5) & (max_score > 0.0)
        return nf2, frac_c, scores, cand_mask

    def v_gates(nf, tr):
        def one(nf1, a, g):
            nf2, _, scores, cand_mask = _to_gates(nf1, a, g)
            return nf2, jnp.sum(scores[:, 0]) + jnp.sum(cand_mask[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def v_topk(nf, tr):
        def one(nf1, a, g):
            nf2, frac_c, scores, cand_mask = _to_gates(nf1, a, g)
            top_vals, top_idx = jax.lax.top_k(
                jnp.where(cand_mask, scores, -jnp.inf), TOP_K)
            return nf2, jnp.sum(top_vals[:, 0]) + jnp.sum(top_idx[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def _to_cand(nf1, a, g):
        nf2, frac_c, scores, cand_mask = _to_gates(nf1, a, g)
        top_vals, top_idx = jax.lax.top_k(
            jnp.where(cand_mask, scores, -jnp.inf), TOP_K)
        cvalid = top_vals > -jnp.inf
        cfrac = jnp.take_along_axis(frac_c, top_idx, axis=-1)
        cfreq = cfrac * bin_w
        return nf2, top_vals, cvalid, cfrac, cfreq

    def v_gather(nf, tr):
        def one(nf1, a, g):
            nf2, top_vals, cvalid, cfrac, cfreq = _to_cand(nf1, a, g)
            return nf2, jnp.sum(cfrac[:, 0]) + jnp.sum(cfreq[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def v_ghost(nf, tr):
        def one(nf1, a, g):
            nf2, top_vals, cvalid, cfrac, cfreq = _to_cand(nf1, a, g)
            ratio = cfreq[:, :, None] / jnp.maximum(cfreq[:, None, :], 1e-30)
            nearest = jnp.round(ratio)
            eye = jnp.eye(TOP_K, dtype=bool)
            ghost = (cvalid[:, :, None] & cvalid[:, None, :] & ~eye
                     & (nearest >= 2.0) & (nearest <= 5.0)
                     & (jnp.abs(ratio / jnp.maximum(nearest, 1e-30) - 1.0)
                        < 0.03)
                     & (top_vals[:, :, None] < top_vals[:, None, :] * 1.05))
            cvalid2 = cvalid & ~jnp.any(ghost, axis=-1)
            return nf2, jnp.sum(cvalid2[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def v_comb(nf, tr):
        def one(nf1, a, g):
            mags = mags_of(a)
            nf2, eff = noisefloor.noise_floor_scan(nf1, mags, g, kc)
            pf = pitch_ops.extract_pitches(mags, eff, bin_w, true_half=half)
            return nf2, jnp.sum(pf.scores[:, 0])
        nf2, leaf = jax.vmap(one)(nf, audio, gf)
        return nf2, tr, jnp.sum(leaf)

    def v_full(nf, tr):
        def one(nf1, tr1, a, g, o):
            mags = mags_of(a)
            nf2, eff = noisefloor.noise_floor_scan(nf1, mags, g, kc)
            pf = pitch_ops.extract_pitches(mags, eff, bin_w, true_half=half)
            tr2, (sf, ss, sv) = tracker.tracker_scan(
                tr1, pf.freqs, pf.scores, pf.valid, o)
            return nf2, tr2, jnp.sum(sf[:, 0])
        nf2, tr2, leaf = jax.vmap(one)(nf, tr, audio, gf, on)
        return nf2, tr2, jnp.sum(leaf)

    variants = [("stft", v_stft), ("+floor", v_floor), ("+precomb", v_precomb),
                ("+combloop", v_combloop), ("+gates", v_gates),
                ("+topk", v_topk), ("+gather", v_gather), ("+ghost", v_ghost),
                ("+comb", v_comb), ("+tracker", v_full)]
    results = {"segments": segs, "chunk_frames": cf, "backend": backend}
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
