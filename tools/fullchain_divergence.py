"""Measure composed fast-mode divergence of the batched full step on a
multi-minute scene (longer-scene companion to
tests/test_fullchain_divergence.py; see that file for the axis definitions).

Axis 1 (hist AGC vs exact AGC, both on device) isolates the fast mode;
axis 2 (device vs exact NumPy oracle chain) adds fp32-vs-fp64 threshold
sensitivity.  Prints one JSON line.

Usage: python tools/fullchain_divergence.py [--minutes 5] [--cpu] [--seed 3]
(The NumPy oracle is a per-frame Python loop — minutes, not hours.)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=5.0)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_analyzer_rs_tpu.models import generators as gen
    from audio_analyzer_rs_tpu.parallel.sharding import (_single_stream_step,
                                                         full_chain_np,
                                                         init_stream_states)

    sr = 48000.0
    audio = gen.mixed_scene(args.minutes * 60.0, sr, seed=args.seed)
    audio = audio[:(len(audio) // 1024) * 1024]

    def device_chain(dyn_mode):
        states = jax.tree.map(lambda a: a[0], init_stream_states(1))
        single = partial(_single_stream_step, sample_rate=sr, slot_len=1024,
                         pitch_hop=512, onset_hop=64, dyn_mode=dyn_mode)
        _, (sf, sv, fired, vel, level, gf) = jax.jit(
            single, static_argnames=("dyn_mode",))(states, jnp.asarray(audio))
        return np.asarray(sf), np.asarray(sv), np.asarray(fired)

    t0 = time.time()
    sf_h, sv_h, fired_h = device_chain("hist")
    sf_e, sv_e, fired_e = device_chain("exact")
    print(f"device chains: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    oracle = full_chain_np(audio, sr)
    print(f"oracle chain: {time.time()-t0:.1f}s", file=sys.stderr)

    def sets(sf, sv):
        return [sorted(int(round(float(f) * 10)) for f in sf[i][sv[i]])
                for i in range(sf.shape[0])]

    sets_h, sets_e = sets(sf_h, sv_h), sets(sf_e, sv_e)
    sets_o = [sorted(int(round(float(f) * 10)) for f, _ in fr)
              for fr in oracle["stable"]]
    n = len(sets_o)
    mode_agree = float(np.mean([a == b for a, b in zip(sets_h, sets_e)]))
    orac_agree = float(np.mean([a == b for a, b in zip(sets_h, sets_o)]))
    o_fired = oracle["onset_fired"][:len(fired_h)]
    onset_frame_agree = float((fired_h == o_fired).mean())
    print(json.dumps({
        "minutes": args.minutes, "seed": args.seed, "pitch_frames": n,
        "pitch_agree_hist_vs_exact_pct": round(100 * mode_agree, 4),
        "pitch_agree_vs_oracle_pct": round(100 * orac_agree, 4),
        "onset_fired_identical_hist_vs_exact":
            bool((fired_h == fired_e).all()),
        "onset_frame_agree_vs_oracle_pct": round(100 * onset_frame_agree, 4),
        "onsets_device": int(fired_h.sum()), "onsets_oracle": int(o_fired.sum()),
    }))


if __name__ == "__main__":
    main()
