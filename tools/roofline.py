"""Roofline accounting for the headline pitch-pipeline step.

Lowers the segment-parallel step (the bench configuration) and reads XLA's
own cost analysis (FLOPs + bytes accessed), then combines it with a
measured steady-state step time to report achieved FLOP/s and HBM
bandwidth versus the chip's peaks.  Answers "is 266k frames/s good?" from
first principles instead of ablation.

TPU v5e (1 chip) peaks used for the ratio:
  MXU:  197 TFLOP/s bf16, ~49 TFLOP/s f32  (this pipeline is f32)
  VPU:  ~3.9 TFLOP/s f32 vector ops (8 lanes x 128 x 4 MACs @ ~0.94 GHz)
  HBM:  819 GB/s

Usage: python tools/roofline.py [--segments 64] [--chunk-frames 256] [--cpu]
Prints one JSON line; notes on stderr.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBS = 819.0
V5E_MXU_F32_TFLOPS = 49.0
V5E_VPU_F32_TFLOPS = 3.9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=64)
    ap.add_argument("--chunk-frames", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_analyzer_rs_tpu.models import generators as gen
    from audio_analyzer_rs_tpu.models.segmented import _vmapped_step
    from audio_analyzer_rs_tpu.ops import noisefloor, tracker

    sr = 44100.0
    window, hop = 2048, 512
    segs, cf = args.segments, args.chunk_frames
    chunk_samples = (cf - 1) * hop + window
    frames_per_step = segs * cf

    def rep(state):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (segs,) + a.shape), state)
    nf = rep(noisefloor.init_state(window // 2 + 1))
    tr = rep(tracker.init_state())
    base = gen.tone_with_harmonics(220.0, chunk_samples / sr, sr,
                                   harmonics=10,
                                   amplitude=0.4)[:chunk_samples]
    audio = jnp.broadcast_to(jnp.asarray(base), (segs, chunk_samples))
    gf = jnp.full((segs, cf), 1e-3, jnp.float32)
    on = jnp.zeros((segs, cf), bool)

    lowered = _vmapped_step.lower(nf, tr, audio, gf, on, sr, window, hop)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):   # some jax versions wrap per-device
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    # XLA reports bytes accessed (HBM traffic incl. re-reads of fused
    # operands at their materialization points).
    bytes_acc = float(cost.get("bytes accessed", float("nan")))

    # Measured steady-state step time.
    outs = _vmapped_step(nf, tr, audio, gf, on, sr, window, hop)
    np.asarray(outs[2].stable_valid).sum()
    iters = 12
    t0 = time.perf_counter()
    state = (nf, tr)
    for _ in range(iters):
        n2, t2, out = _vmapped_step(state[0], state[1], audio, gf, on,
                                    sr, window, hop)
        state = (n2, t2)
    np.asarray(out.stable_valid).sum()
    dt = (time.perf_counter() - t0) / iters
    fps = frames_per_step / dt

    flops_frame = flops / frames_per_step
    bytes_frame = bytes_acc / frames_per_step
    achieved_tflops = flops / dt / 1e12
    achieved_gbs = bytes_acc / dt / 1e9
    print(f"step: {segs}x{cf} frames, {dt*1000:.1f} ms -> {fps:,.0f} "
          f"frames/s", file=sys.stderr)
    print(f"XLA cost: {flops/1e9:.2f} GFLOP/step "
          f"({flops_frame/1e6:.2f} MFLOP/frame), "
          f"{bytes_acc/1e9:.2f} GB/step ({bytes_frame/1e6:.2f} MB/frame)",
          file=sys.stderr)
    print(f"achieved: {achieved_tflops:.3f} TFLOP/s "
          f"({100*achieved_tflops/V5E_VPU_F32_TFLOPS:.1f}% of VPU f32 peak, "
          f"{100*achieved_tflops/V5E_MXU_F32_TFLOPS:.2f}% of MXU f32 peak), "
          f"{achieved_gbs:.1f} GB/s "
          f"({100*achieved_gbs/V5E_HBM_GBS:.1f}% of HBM peak)",
          file=sys.stderr)
    print(json.dumps({
        "segments": segs, "chunk_frames": cf,
        "frames_per_sec": round(fps, 1),
        "mflop_per_frame": round(flops_frame / 1e6, 3),
        "mbytes_per_frame": round(bytes_frame / 1e6, 3),
        "achieved_tflops": round(achieved_tflops, 4),
        "achieved_gb_per_s": round(achieved_gbs, 2),
        "pct_hbm_peak": round(100 * achieved_gbs / V5E_HBM_GBS, 2),
        "pct_vpu_f32_peak": round(100 * achieved_tflops
                                  / V5E_VPU_F32_TFLOPS, 2),
    }))


if __name__ == "__main__":
    main()
