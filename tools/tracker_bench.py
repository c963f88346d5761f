"""Isolate the tracker scan (17% of the flagship step) and measure variants.

The stage ablation (tools/step_ablation.py) shows the tracker scan costs
~7.9 ms marginal per 16,384-frame step.  This times the tracker alone at the
bench geometry and splits scan vs post-scan selection, then measures
reformulations (exactness checked against ops/tracker.tracker_scan):

  current      ops/tracker.tracker_scan as shipped
  scan_only    the lax.scan without the stable-by-seq top-8 selection
  topk         selection via lax.top_k on negated keys instead of argsort
  unrollN      scan unroll sweep (the shipped value is tracker.SCAN_UNROLL)

Usage: python tools/tracker_bench.py [--segments 128] [--chunk-frames 128]
       [--iters 20] [--cpu] [--unrolls 8,16,32,64,128]
Prints one JSON line; per-row notes on stderr.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=128)
    ap.add_argument("--chunk-frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--unrolls", type=str, default="8,16,32,64,128")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_analyzer_rs_tpu.ops import tracker
    from audio_analyzer_rs_tpu.ops.pitch import MAX_NOTES
    from audio_analyzer_rs_tpu.ops.tracker import MAX_TRACKS, _step

    segs, cf = args.segments, args.chunk_frames
    frames = segs * cf
    rng = np.random.default_rng(7)

    # Realistic inputs: ~2.5 valid pitches/frame with frame-to-frame pitch
    # continuity (so tracks actually form and the matching paths are hot),
    # ~5% onset frames.
    n_valid = rng.integers(0, 5, size=(segs, cf))
    valid = (np.arange(MAX_NOTES)[None, None, :] < n_valid[..., None])
    base = rng.uniform(80.0, 900.0, size=(segs, 1, MAX_NOTES))
    drift = np.cumsum(rng.normal(0, 0.002, size=(segs, cf, MAX_NOTES)), axis=1)
    freqs = (base * np.exp(drift)).astype(np.float32)
    scores = rng.uniform(0.1, 4.0, size=(segs, cf, MAX_NOTES)).astype(np.float32)
    onsets = rng.random((segs, cf)) < 0.05

    freqs = jnp.asarray(freqs)
    scores = jnp.asarray(scores)
    valid = jnp.asarray(valid)
    onsets = jnp.asarray(onsets)
    st0 = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (segs,) + a.shape), tracker.init_state())

    def time_fn(f, *a):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        return dt, out

    results = {"segments": segs, "chunk_frames": cf}

    # ── current ──────────────────────────────────────────────────────────
    cur = jax.jit(jax.vmap(tracker.tracker_scan))
    dt, ref_out = time_fn(cur, st0, freqs, scores, valid, onsets)
    results["current_ms"] = round(dt * 1e3, 3)
    print(f"current    {dt*1e3:8.3f} ms   {frames/dt:12,.0f} frames/s",
          file=sys.stderr)
    ref_leaves = jax.tree.map(np.asarray, ref_out)

    # ── scan only (no selection) ─────────────────────────────────────────
    def scan_only(state, rf, rs, rv, on):
        def body(s, inp):
            return _step(s, *inp)
        return jax.lax.scan(body, state, (rf, rs, rv, on),
                            unroll=tracker.SCAN_UNROLL)

    so = jax.jit(jax.vmap(scan_only))
    dt, _ = time_fn(so, st0, freqs, scores, valid, onsets)
    results["scan_only_ms"] = round(dt * 1e3, 3)
    print(f"scan_only  {dt*1e3:8.3f} ms   (selection = current - this)",
          file=sys.stderr)

    # ── topk selection variant ───────────────────────────────────────────
    def with_topk(state, rf, rs, rv, on):
        def body(s, inp):
            return _step(s, *inp)
        state, (freq, score, stable, seq) = jax.lax.scan(
            body, state, (rf, rs, rv, on), unroll=tracker.SCAN_UNROLL)
        int_max = jnp.iinfo(jnp.int32).max
        keys = jnp.where(stable, seq, int_max)
        _, order = jax.lax.top_k(-keys, MAX_NOTES)
        out_freq = jnp.take_along_axis(freq, order, axis=-1)
        out_score = jnp.take_along_axis(score, order, axis=-1)
        out_valid = jnp.take_along_axis(stable, order, axis=-1)
        return state, (out_freq, out_score, out_valid)

    tk = jax.jit(jax.vmap(with_topk))
    dt, out = time_fn(tk, st0, freqs, scores, valid, onsets)
    ok = all(np.array_equal(a, b) for a, b in zip(
        jax.tree.leaves(ref_leaves), jax.tree.leaves(jax.tree.map(np.asarray, out))))
    results["topk_ms"] = round(dt * 1e3, 3)
    results["topk_exact"] = bool(ok)
    print(f"topk       {dt*1e3:8.3f} ms   exact={ok}", file=sys.stderr)

    # ── rank-counting selection (sort-free) ──────────────────────────────
    # rank[i] = #{j : (key_j, j) < (key_i, i)} via a [T, T] comparison count;
    # stable tracks all have seq < int_max so their ranks are the argsort
    # positions; emit by one-hot scatter instead of gather.  No sort lowering
    # at all (XLA sorts are bitonic networks with heavy per-stage overhead).
    def with_rank(state, rf, rs, rv, on):
        def body(s, inp):
            return _step(s, *inp)
        state, (freq, score, stable, seq) = jax.lax.scan(
            body, state, (rf, rs, rv, on), unroll=tracker.SCAN_UNROLL)
        int_max = jnp.iinfo(jnp.int32).max
        keys = jnp.where(stable, seq, int_max)              # [N, T]
        iota = jnp.arange(keys.shape[-1], dtype=jnp.int32)
        kj = keys[..., None, :]
        ki = keys[..., :, None]
        less = (kj < ki) | ((kj == ki) & (iota[None, :] < iota[:, None]))
        rank = jnp.sum(less, axis=-1).astype(jnp.int32)     # [N, T]
        sel = stable & (rank < MAX_NOTES)
        onehot = jnp.where(sel, rank, MAX_NOTES)[..., None] == jnp.arange(
            MAX_NOTES, dtype=jnp.int32)                     # [N, T, 8]
        ohf = onehot.astype(jnp.float32)
        out_freq = jnp.einsum("nt,nts->ns", freq, ohf)
        out_score = jnp.einsum("nt,nts->ns", score, ohf)
        out_valid = jnp.any(onehot, axis=-2)
        return state, (out_freq, out_score, out_valid)

    rk = jax.jit(jax.vmap(with_rank))
    dt, out = time_fn(rk, st0, freqs, scores, valid, onsets)
    ok = all(np.array_equal(a, b) for a, b in zip(
        jax.tree.leaves(ref_leaves), jax.tree.leaves(jax.tree.map(np.asarray, out))))
    results["rank_ms"] = round(dt * 1e3, 3)
    results["rank_exact"] = bool(ok)
    print(f"rank       {dt*1e3:8.3f} ms   exact={ok}", file=sys.stderr)

    # ── re-measure current (first-row timing can be polluted) ────────────
    dt, _ = time_fn(cur, st0, freqs, scores, valid, onsets)
    results["current2_ms"] = round(dt * 1e3, 3)
    print(f"current2   {dt*1e3:8.3f} ms", file=sys.stderr)

    # ── unroll sweep ─────────────────────────────────────────────────────
    for u in [int(x) for x in args.unrolls.split(",") if x]:
        def scan_u(state, rf, rs, rv, on, *, u=u):
            def body(s, inp):
                return _step(s, *inp)
            state, (freq, score, stable, seq) = jax.lax.scan(
                body, state, (rf, rs, rv, on), unroll=u)
            int_max = jnp.iinfo(jnp.int32).max
            order = jnp.argsort(
                jnp.where(stable, seq, int_max), axis=-1)[:, :MAX_NOTES]
            return state, (jnp.take_along_axis(freq, order, axis=-1),
                           jnp.take_along_axis(score, order, axis=-1),
                           jnp.take_along_axis(stable, order, axis=-1))
        f = jax.jit(jax.vmap(scan_u))
        dt, out = time_fn(f, st0, freqs, scores, valid, onsets)
        ok = all(np.array_equal(a, b) for a, b in zip(
            jax.tree.leaves(ref_leaves),
            jax.tree.leaves(jax.tree.map(np.asarray, out))))
        results[f"unroll{u}_ms"] = round(dt * 1e3, 3)
        print(f"unroll{u:<4d}{dt*1e3:8.3f} ms   exact={ok}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
