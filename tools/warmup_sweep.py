"""Sweep the segment warmup length for NET throughput, gated on agreement.

`models/segmented.py` discards `warmup_frames` of look-back outputs per
segment so each segment's carried state (per-bin noise floor IIRs, tracker)
converges before its payload starts.  Round 1 set DEFAULT_WARMUP_FRAMES=256
conservatively; the floor IIR time constants are only ~25-50 frames (alphas
0.04/0.35/0.02, ref stft.rs:219-225), so at 128 segments the 256-frame
warmup burns ~10.6% of a 1 h file's frames.  This tool measures, per
candidate warmup length:

* the 1 h mixed-scene frame-agreement vs the exact sequential run (the
  gate: only 100.000% passes — same definition as tools/agreement_1h.py),
* the NET throughput on the 1 h file (payload frames / wall of the
  device-resident segmented run, upload excluded via a shared
  `device_audio`).

The scene renders once, the sequential oracle runs once, and the upload
happens once; each warmup value then costs one compile (the stream shape
changes) plus two timed runs.  The onset analog (DEFAULT_ONSET_WARMUP_
FRAMES=512) sweeps the same way with the onset agreement definition
(identical onset count, every onset within 2 frames).

Usage: python tools/warmup_sweep.py [--minutes 60] [--seed 0] [--cpu]
         [--pitch-warmups 64,96,128,192,256]
         [--onset-warmups 128,256,384,512] [--skip-onset]
Prints one JSON line; notes on stderr.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pitch_agreement_pct(sf, sv, of, ov):
    """Vectorized frame agreement: a frame agrees when its sorted sets of
    stable pitch frequencies match to 0.1 Hz (same definition as
    tools/agreement_1h.py and tests/test_segmented.py)."""
    import numpy as np
    a = np.where(sv, np.round(sf * 10.0).astype(np.int64), -1)
    b = np.where(ov, np.round(of * 10.0).astype(np.int64), -1)
    a = np.sort(a, axis=1)
    b = np.sort(b, axis=1)
    return 100.0 * float((a == b).all(axis=1).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pitch-warmups", default="64,96,128,192,256")
    ap.add_argument("--pitch-modes", default="full",
                    help="comma list of warmup_mode values to A/B per "
                         "warmup length (full,floor — the floor mode "
                         "skips the comb on most look-back frames; "
                         "models/segmented.py)")
    ap.add_argument("--onset-warmups", default="128,256,384,512")
    ap.add_argument("--skip-onset", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from audio_analyzer_rs_tpu.models import generators as gen
    from audio_analyzer_rs_tpu.models.analyzer import (OnsetAnalyzer,
                                                       PitchAnalyzer)
    from audio_analyzer_rs_tpu.models.segmented import (
        segmented_onset_analysis, segmented_pitch_analysis)
    from audio_analyzer_rs_tpu.utils.framing import num_frames

    sr = 44100.0
    t0 = time.time()
    x = gen.mixed_scene(args.minutes * 60.0, sr, seed=args.seed)
    log(f"scene: {args.minutes:g} min ({len(x):,} samples, "
        f"{time.time()-t0:.1f}s to render)")

    t0 = time.time()
    audio_dev = jnp.asarray(x)
    audio_dev.block_until_ready()
    log(f"upload: {len(x)*4/1e6:.0f} MB f32 in {time.time()-t0:.1f}s")

    results = {"minutes": args.minutes, "seed": args.seed,
               "pitch": [], "onset": []}

    # ── pitch ───────────────────────────────────────────────────────────
    n_p = num_frames(len(x), 2048, 512)
    t0 = time.time()
    seq = PitchAnalyzer(sr).process(x)
    log(f"sequential pitch oracle: {n_p:,} frames in {time.time()-t0:.1f}s")
    of = np.asarray(seq.stable_freqs)
    ov = np.asarray(seq.stable_valid)

    modes = [m.strip() for m in args.pitch_modes.split(",") if m.strip()]
    for w in [int(v) for v in args.pitch_warmups.split(",")]:
        for mode in modes:
            t0 = time.time()
            sf, ss, sv = segmented_pitch_analysis(x, sr, warmup_frames=w,
                                                  device_audio=audio_dev,
                                                  warmup_mode=mode)
            first = time.time() - t0
            t0 = time.time()
            sf, ss, sv = segmented_pitch_analysis(x, sr, warmup_frames=w,
                                                  device_audio=audio_dev,
                                                  warmup_mode=mode)
            dt = time.time() - t0
            pct = pitch_agreement_pct(sf, sv, of, ov)
            net = n_p / dt
            results["pitch"].append({
                "warmup": w, "mode": mode, "agreement_pct": round(pct, 4),
                "net_fps": round(net), "wall_s": round(dt, 3),
                "first_s": round(first, 2)})
            log(f"pitch warmup {w:4d} ({mode:5s}): agreement {pct:9.4f}%  "
                f"net {net:10,.0f} frames/s  ({dt:.3f}s; first {first:.2f}s)")

    if not args.skip_onset:
        # ── onset ───────────────────────────────────────────────────────
        n_o = num_frames(len(x), 256, 64)
        t0 = time.time()
        oseq = OnsetAnalyzer(sr).process(x)
        log(f"sequential onset oracle: {n_o:,} frames in "
            f"{time.time()-t0:.1f}s")
        seq_fired = np.asarray(oseq.fired)[:n_o]
        seq_idx = np.flatnonzero(seq_fired)

        for w in [int(v) for v in args.onset_warmups.split(",")]:
            t0 = time.time()
            fired, vel, flux, energy = segmented_onset_analysis(
                x, sr, warmup_frames=w, device_audio=audio_dev)
            first = time.time() - t0
            t0 = time.time()
            fired, vel, flux, energy = segmented_onset_analysis(
                x, sr, warmup_frames=w, device_audio=audio_dev)
            dt = time.time() - t0
            frame_pct = 100.0 * float((fired == seq_fired).mean())
            seg_idx = np.flatnonzero(fired)
            if len(seg_idx) == len(seq_idx) and len(seq_idx):
                max_shift = int(np.abs(seg_idx - seq_idx).max())
            else:
                max_shift = -1
            results["onset"].append({
                "warmup": w, "frame_agreement_pct": round(frame_pct, 4),
                "onsets_seq": len(seq_idx), "onsets_seg": len(seg_idx),
                "max_shift_frames": max_shift,
                "net_fps": round(n_o / dt), "wall_s": round(dt, 3),
                "first_s": round(first, 2)})
            log(f"onset warmup {w:4d}: frame agreement {frame_pct:9.4f}%  "
                f"onsets {len(seg_idx)}/{len(seq_idx)} shift<={max_shift}  "
                f"net {n_o/dt:12,.0f} frames/s  ({dt:.3f}s)")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
