"""End-to-end wall-clock of the segmented bulk paths: resident vs pipelined
transfer, f32 vs int16 input.

The device compute for hour-scale audio is ~1 s; end-to-end is dominated by
the host→device upload (~15-40 MB/s through this environment's tunneled
chip).  This measures what a user actually waits for, per transfer mode —
the number that motivated `transfer="pipelined"` (see
models/segmented.py:_pipelined_blocks) — and records it for
docs/PERFORMANCE.md.

Usage: python tools/e2e_upload_bench.py [--minutes 10] [--pitch-only]
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
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--pitch-only", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from audio_analyzer_rs_tpu.models import generators as gen
    from audio_analyzer_rs_tpu.models.segmented import (
        segmented_onset_analysis, segmented_pitch_analysis)

    sr = 44100.0
    x = gen.mixed_scene(args.minutes * 60.0, sr, seed=1)
    i16 = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
    mb = len(i16) * 2 / 1e6
    print(f"scene: {args.minutes:g} min = {mb:.0f} MB int16 "
          f"({2*mb:.0f} MB f32)", file=sys.stderr)

    results = {"minutes": args.minutes}

    def run(tag, fn, audio, **kw):
        # Two identical runs; report the second.  A short-slice warmup is
        # NOT enough: auto_segments picks a different segment count for a
        # different length, which is a different XLA program — the first
        # full-length run eats that compile (first-run time also reported).
        t0 = time.time()
        fn(audio, sr, **kw)
        cold = time.time() - t0
        t0 = time.time()
        out = fn(audio, sr, **kw)
        dt = time.time() - t0
        results[tag] = round(dt, 2)
        results[tag + "_first"] = round(cold, 2)
        print(f"{tag:36s} {dt:7.2f}s (first run {cold:.2f}s)",
              file=sys.stderr)
        return out

    # transfer= passed explicitly: "auto" would silently resolve by length
    # (pipelined >= 15 min) and mislabel the row.
    run("pitch_resident_i16_s", segmented_pitch_analysis, i16,
        transfer="resident")
    run("pitch_pipelined_i16_s", segmented_pitch_analysis, i16,
        transfer="pipelined")
    run("pitch_resident_f32_s", segmented_pitch_analysis, x,
        transfer="resident")
    run("pitch_pipelined_f32_s", segmented_pitch_analysis, x,
        transfer="pipelined")
    if not args.pitch_only:
        run("onset_resident_i16_s", segmented_onset_analysis, i16,
            transfer="resident")
        run("onset_pipelined_i16_s", segmented_onset_analysis, i16,
            transfer="pipelined")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
