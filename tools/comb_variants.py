"""Microbenchmark: slab-build strategies for the harmonic comb.

The step ablation (tools/step_ablation.py) shows the comb's harmonic loop
is ~58% of the headline step, running at ~3% of VPU f32 peak — the cost is
the 2n+3 stride-n lane slices per harmonic (each strided slice relayouts
whole tiles, inflating HBM traffic by ~n).  This measures bit-exact
alternatives at the bench-equivalent geometry:

  current      ops.pitch._comb_xla (chunked stride-n lax.slice stacks)
  patches      lax.conv_general_dilated_patches: one strided patch-extract
               op per harmonic -> [B, 2n+3, kcn], then the same masked max
  transpose    reshape pm_pad to [Ln, n], transpose to [n, Ln]; all window
               values become CONTIGUOUS lane slices (4n rows per harmonic,
               rows ordered so flat order == ascending window offset)
  chain        no stack at all: ascending-c strict-greater select chain
               accumulating (best_mag, best_pos) in [kcn] registers; XLA
               should fuse the 2n+3 slice-reads + selects into one loop
               fusion with no [2n+3, kcn] materialization
  twopass      two tree reductions, no stack: best_mag = max-tree over
               masked slices, then best_pos = min-tree of positions where
               masked == best_mag (first-max == lowest position) — the
               reductions are associative so XLA can fuse freely
  bf16         the current chunked slab with the padded peak array, slab,
               and max-select in bfloat16 (halves the HBM-bound slab
               bytes); score accumulates in f32.  NOT bit-exact by
               construction — divergence stats are reported so it can be
               judged as an opt-in fast mode
  fminor       frames-MINOR layout: transpose the whole batch once to
               pm_T [pad_bins, B] and run the comb with candidates on the
               major axis and frames on lanes.  The stride-n slices then
               stride the MAJOR dim: each read chunk is a full 128-lane
               row (512 B — exactly the HBM/DRAM burst), so the ~n-fold
               lane-amplification of the frames-major slab disappears;
               nominal slab traffic drops from ~470 KB to ~64 KB/frame.
               Same chunked stack + argmax inner step as current.
  fminor_chain same layout, ascending-c strict-greater select chain (no
               stack) — each slice read once, zero slab materialization

Measured v5e 2026-08-17 (16384 frames, flat vmap): current 105.4 ms,
patches 107.6 (NOT bit-exact), transpose 109.8.  Second run (--only
chain,twopass; current re-measured 112.45 the same run): chain 119.55,
twopass 119.56 — both bit-exact, both ~6% slower.  XLA does NOT fuse the
2n+3 strided slice-reads into one pass; each select/max stage re-reads
its slice, so removing the slab buys nothing and loses the slab's tile
reuse.  The chunked-slab comb stands.

Third run (--only bf16, 2026-08-18; current re-measured 116.8 the same
run): bf16 110.1 ms — only 6% faster despite halving the slab bytes,
with score rel err up to 1.1e-1 (mean 2.4e-4) from bf16-rounded
magnitude comparisons.  The slab's HBM bytes are NOT the comb's
bottleneck (consistent with chain/twopass: the cost is the strided
*reads*, which bf16 does not reduce in count), so the precision loss
buys nothing — rejected.

Fourth run (--only fminor,fminor_chain, 2026-08-18; current re-measured
199.1 the same run): fminor 130.4 ms (1.53x faster, bit-exact),
fminor_chain 234.1 ms (slower — re-confirms the no-stack penalty).
STANDALONE the frames-minor layout wins big, but inside the full
production step it is a wash (nested-vmap step 13.73 ms xla vs 13.81 ms
fminor at 128x64/dft_band) — the step's fusion already hides the slab's
lane amplification — and restructuring the step to a flattened [S*N]
batch to feed it regressed the other stages (jnp.fft 3x slower on the
flat batch).  Kept as comb="fminor" in ops/pitch.py for standalone
extraction workloads; DEFAULT_COMB stays "xla".

All variants must produce bit-identical (score, longest_run, total_harms).

Usage: python tools/comb_variants.py [--frames 16384] [--iters 10] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variant names ('current' is always "
                         "run first as the bit-exactness reference)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_analyzer_rs_tpu.models import generators as gen
    from audio_analyzer_rs_tpu.ops import pitch as pitch_ops
    from audio_analyzer_rs_tpu.ops.pitch import (MAX_HARMONICS, _comb_xla,
                                                 _pre_comb)
    from audio_analyzer_rs_tpu.ops.stft import stft_mags

    sr = 44100.0
    window, hop = 2048, 512
    half = window // 2 + 1
    bin_w = float(np.float32(sr) / np.float32(window))
    min_bin = max(int(np.ceil(pitch_ops.MIN_FREQ / bin_w)), 1)
    max_bin = min(int(np.floor(pitch_ops.MAX_FREQ / bin_w)), half - 2)
    kc = pitch_ops.candidate_band(bin_w, half)
    B = args.frames

    # Realistic peak-masked inputs from a mixed scene.
    n_src = min(B, 4096)
    audio = gen.mixed_scene((n_src * hop + window) / sr + 1.0, sr, seed=7)
    mags = stft_mags(audio[: n_src * hop + window], window, hop)[:n_src]
    nf = jnp.full((n_src, kc), 1e-4, jnp.float32)
    pm, frac_c, m_c, _, _ = jax.jit(jax.vmap(
        lambda m, f: _pre_comb(m, f, min_bin, max_bin, kc)))(mags, nf)
    reps = -(-B // n_src)
    pm = jnp.tile(pm, (reps, 1))[:B]
    frac_c = jnp.tile(frac_c, (reps, 1))[:B]
    m_c = jnp.tile(m_c, (reps, 1))[:B]

    kcn_of = {n: min(kc, half // n + 2) for n in range(2, MAX_HARMONICS + 1)}

    # ── shared inner harmonic-state update (identical across variants) ────
    def run_harmonics(vals_of, pm1, frac1, fund1):
        """vals_of(n) -> ([rows, kcn_n] window values, [rows] offsets c) with
        rows in ascending-c flat order; the rest is the exact _comb_xla
        state machine."""
        k_c = jnp.arange(kc, dtype=jnp.int32)
        score, last = fund1, k_c
        longest = jnp.zeros((kc,), jnp.int32)
        current = jnp.zeros((kc,), jnp.int32)
        total = jnp.zeros((kc,), jnp.int32)
        for n in range(2, MAX_HARMONICS + 1):
            kcn = kcn_of[n]
            k_n = k_c[:kcn]
            ef = frac1[:kcn] * n
            valid_n = ef < half
            sb = jnp.floor(ef - 1.0).astype(jnp.int32)
            ss = jnp.maximum(sb, last[:kcn] + 1)
            se = jnp.minimum(jnp.ceil(ef + 1.0).astype(jnp.int32), half - 1)
            vals, cs = vals_of(n, kcn)
            nk = n * k_n
            pos = nk[None, :] + cs[:, None]
            in_band = (pos >= ss[None, :]) & (pos <= se[None, :])
            masked = jnp.where(in_band, vals, 0.0)
            bm = jnp.max(masked, axis=0)
            bc = jnp.argmax(masked, axis=0).astype(jnp.int32)
            bh = nk + jnp.take(cs, bc)
            found = bm > 0.0
            fe = found & valid_n
            miss = (~found) & valid_n

            def spl(new, old):
                return (jnp.concatenate([new, old[kcn:]]) if kcn < kc
                        else new)
            score = spl(score[:kcn] + jnp.where(fe, bm, 0.0), score)
            last = spl(jnp.where(fe, bh, last[:kcn]), last)
            longest = spl(jnp.where(miss, jnp.maximum(longest[:kcn],
                                                      current[:kcn]),
                                    longest[:kcn]), longest)
            current = spl(jnp.where(fe, current[:kcn] + 1,
                                    jnp.where(miss, 0, current[:kcn])),
                          current)
            total = spl(total[:kcn] + fe.astype(jnp.int32), total)
        return score, jnp.maximum(longest, current), total

    FRONT = 32   # front pad; > n+1+ (FRONT % n) for all n<=14

    def pad_front(pm1, pad_len):
        return jnp.zeros((pad_len,), jnp.float32).at[FRONT:FRONT + kc].set(pm1)

    # ── variant: patches ──────────────────────────────────────────────────
    def comb_patches(pm1, frac1, fund1):
        pad_len = FRONT + max(kcn_of[n] * n + 2 * n + 3
                              for n in range(2, MAX_HARMONICS + 1))
        pmp = pad_front(pm1, pad_len)

        def vals_of(n, kcn):
            cs = jnp.arange(-n - 1, n + 2, dtype=jnp.int32)
            lo = FRONT - (n + 1)
            ln = (kcn - 1) * n + 2 * n + 3
            seg = jax.lax.slice(pmp, (lo,), (lo + ln,))
            patches = jax.lax.conv_general_dilated_patches(
                seg[None, None, :], (2 * n + 3,), (n,), "VALID")
            return patches[0], cs   # [2n+3, kcn]
        return run_harmonics(vals_of, pm1, frac1, fund1)

    # ── variant: transpose ────────────────────────────────────────────────
    def comb_transpose(pm1, frac1, fund1):
        pad_len = FRONT + max(kcn_of[n] * n + 2 * n + 3
                              for n in range(2, MAX_HARMONICS + 1)) + MAX_HARMONICS
        pmp = pad_front(pm1, pad_len)

        def vals_of(n, kcn):
            # index i = FRONT + n*j + c, c = q*n + r - s where we choose the
            # row decomposition so i = n*(j + q + k0) + r with
            # FRONT = n*k0 + s, r in [0, n).  Rows (q, r) with c ascending:
            # c = q*n + (r - s) for r in [s, n) then next q... simpler: fold
            # FRONT into the column index directly.
            ln = pad_len // n
            pt = jnp.transpose(pmp[: ln * n].reshape(ln, n))   # [n, Ln]
            k0, s = divmod(FRONT, n)
            rows, cs = [], []
            # ascending c from -(n+1) to n+1: i = FRONT + n*j + c
            #   = n*(j + k0 + (s + c) // n) + (s + c) % n
            for c in range(-n - 1, n + 2):
                q, r = divmod(s + c, n)
                rows.append(jax.lax.slice(
                    pt, (r, k0 + q), (r + 1, k0 + q + kcn))[0])
                cs.append(c)
            return jnp.stack(rows), jnp.asarray(cs, jnp.int32)
        return run_harmonics(vals_of, pm1, frac1, fund1)

    # ── variants: chain / twopass (no slab materialization) ──────────────
    # These mirror _comb_xla exactly (same front pad, same slices, same
    # state updates) but replace the stack+mask+max/argmax inner step.
    def comb_nostack(pm1, frac1, fund1, inner):
        front = MAX_HARMONICS + 2
        pad_len = front + max(kcn_of[n] * n + n + 2
                              for n in range(2, MAX_HARMONICS + 1))
        pmp = jnp.zeros((pad_len,), jnp.float32).at[front:front + kc].set(pm1)
        k_c = jnp.arange(kc, dtype=jnp.int32)
        score, last = fund1, k_c
        longest = jnp.zeros((kc,), jnp.int32)
        current = jnp.zeros((kc,), jnp.int32)
        total = jnp.zeros((kc,), jnp.int32)
        for n in range(2, MAX_HARMONICS + 1):
            kcn = kcn_of[n]
            k_n = k_c[:kcn]
            ef = frac1[:kcn] * n
            valid_n = ef < half
            sb = jnp.floor(ef - 1.0).astype(jnp.int32)
            ss = jnp.maximum(sb, last[:kcn] + 1)
            se = jnp.minimum(jnp.ceil(ef + 1.0).astype(jnp.int32), half - 1)
            nk = n * k_n

            def val_of(c):
                vals = jax.lax.slice(pmp, (front + c,),
                                     (front + c + kcn * n,), (n,))
                pos = nk + c
                return jnp.where((pos >= ss) & (pos <= se), vals, 0.0), pos

            bm, bh = inner(n, kcn, val_of)
            found = bm > 0.0
            fe = found & valid_n
            miss = (~found) & valid_n

            def spl(new, old):
                return (jnp.concatenate([new, old[kcn:]]) if kcn < kc
                        else new)
            score = spl(score[:kcn] + jnp.where(fe, bm, 0.0), score)
            last = spl(jnp.where(fe, bh, last[:kcn]), last)
            longest = spl(jnp.where(miss, jnp.maximum(longest[:kcn],
                                                      current[:kcn]),
                                    longest[:kcn]), longest)
            current = spl(jnp.where(fe, current[:kcn] + 1,
                                    jnp.where(miss, 0, current[:kcn])),
                          current)
            total = spl(total[:kcn] + fe.astype(jnp.int32), total)
        return score, jnp.maximum(longest, current), total

    def inner_chain(n, kcn, val_of):
        bm = jnp.zeros((kcn,), jnp.float32)
        bh = jnp.zeros((kcn,), jnp.int32)
        for c in range(-n - 1, n + 2):
            v, pos = val_of(c)
            better = v > bm                    # strict: first (lowest c) wins
            bm = jnp.where(better, v, bm)
            bh = jnp.where(better, pos, bh)
        return bm, bh

    def inner_twopass(n, kcn, val_of):
        cs = list(range(-n - 1, n + 2))
        bm = jnp.zeros((kcn,), jnp.float32)
        for c in cs:
            v, _ = val_of(c)
            bm = jnp.maximum(bm, v)
        big = jnp.full((kcn,), 2**30, jnp.int32)
        bh = big
        for c in cs:
            v, pos = val_of(c)
            bh = jnp.minimum(bh, jnp.where(v == bm, pos, big))
        # When bm == 0 (not found) bh is garbage but unused (found=false);
        # clamp to 0 to keep dtypes/values tame.
        return bm, jnp.where(bm > 0.0, bh, 0)

    # ── variant: bf16 slab (precision lever, not layout) ──────────────────
    # Mirrors _comb_xla (same chunked stacks) with the padded peak array and
    # the slab/mask/max in bfloat16.  best_mag comparisons and the harmonic
    # position choice happen on bf16-rounded magnitudes; the score
    # accumulates the bf16 winner upcast to f32.
    def comb_bf16(pm1, frac1, fund1):
        from audio_analyzer_rs_tpu.ops.pitch import _COMB_CHUNK
        front = MAX_HARMONICS + 2
        pad_len = front + max(kcn_of[n] * n + n + 2
                              for n in range(2, MAX_HARMONICS + 1))
        pmp = jnp.zeros((pad_len,), jnp.bfloat16).at[front:front + kc].set(
            pm1.astype(jnp.bfloat16))
        k_c = jnp.arange(kc, dtype=jnp.int32)
        score, last = fund1, k_c
        longest = jnp.zeros((kc,), jnp.int32)
        current = jnp.zeros((kc,), jnp.int32)
        total = jnp.zeros((kc,), jnp.int32)
        for n in range(2, MAX_HARMONICS + 1):
            kcn = kcn_of[n]
            k_n = k_c[:kcn]
            ef = frac1[:kcn] * n
            valid_n = ef < half
            sb = jnp.floor(ef - 1.0).astype(jnp.int32)
            ss = jnp.maximum(sb, last[:kcn] + 1)
            se = jnp.minimum(jnp.ceil(ef + 1.0).astype(jnp.int32), half - 1)
            cs_py = list(range(-n - 1, n + 2))
            nk = n * k_n
            best_mag = jnp.zeros((kcn,), jnp.bfloat16)
            best_c = jnp.zeros((kcn,), jnp.int32)
            for lo in range(0, len(cs_py), _COMB_CHUNK):
                chunk = cs_py[lo:lo + _COMB_CHUNK]
                cs = jnp.asarray(chunk, dtype=jnp.int32)
                vals = jnp.stack([
                    jax.lax.slice(pmp, (front + c,),
                                  (front + c + kcn * n,), (n,))
                    for c in chunk], axis=0)
                in_band = ((nk[None, :] + cs[:, None] >= ss[None, :])
                           & (nk[None, :] + cs[:, None] <= se[None, :]))
                masked = jnp.where(in_band, vals, jnp.bfloat16(0))
                cmax = jnp.max(masked, axis=0)
                carg = jnp.argmax(masked, axis=0).astype(jnp.int32)
                better = cmax > best_mag
                best_mag = jnp.where(better, cmax, best_mag)
                best_c = jnp.where(better, carg + lo, best_c)
            best_h = nk + best_c - n - 1
            found = best_mag > jnp.bfloat16(0)
            fe = found & valid_n
            miss = (~found) & valid_n

            def spl(new, old):
                return (jnp.concatenate([new, old[kcn:]]) if kcn < kc
                        else new)
            score = spl(score[:kcn] + jnp.where(
                fe, best_mag.astype(jnp.float32), 0.0), score)
            last = spl(jnp.where(fe, best_h, last[:kcn]), last)
            longest = spl(jnp.where(miss, jnp.maximum(longest[:kcn],
                                                      current[:kcn]),
                                    longest[:kcn]), longest)
            current = spl(jnp.where(fe, current[:kcn] + 1,
                                    jnp.where(miss, 0, current[:kcn])),
                          current)
            total = spl(total[:kcn] + fe.astype(jnp.int32), total)
        return score, jnp.maximum(longest, current), total

    # ── variants: fminor / fminor_chain (frames-minor batched layout) ─────
    # Whole-batch formulation (not per-frame vmapped): one transpose of the
    # peak array to [pad_bins, B], then every stride-n slice strides the
    # MAJOR axis — each read chunk is a full 128-lane row (512 B, one DRAM
    # burst), eliminating the lane-amplification that makes the frames-major
    # slab ~n-fold oversized in real HBM traffic.  Mirrors _comb_xla
    # bit-exactly (matchable-prefix bounds, tail-miss mask, chunked argmax
    # or strict-greater chain).
    def make_fminor(chunked: bool):
        from audio_analyzer_rs_tpu.ops.pitch import _COMB_CHUNK
        kcn_of2 = {n: min(kc, half // n + 2, max_bin // n + 3)
                   for n in range(2, MAX_HARMONICS + 1)}
        front = MAX_HARMONICS + 2
        pad_len = front + max(max(kcn_of2[n] * n + n + 2
                                  for n in range(2, MAX_HARMONICS + 1)),
                              kc + 1)

        def run(pm_b, frac_b, fund_b):          # [B, kc] each
            Bn = pm_b.shape[0]
            pmT = jnp.zeros((pad_len, Bn), jnp.float32
                            ).at[front:front + kc, :].set(pm_b.T)
            fracT = frac_b.T                     # [kc, B]
            k_c = jnp.arange(kc, dtype=jnp.int32)
            score = fund_b.T
            last = jnp.broadcast_to(k_c[:, None], (kc, Bn))
            longest = jnp.zeros((kc, Bn), jnp.int32)
            current = jnp.zeros((kc, Bn), jnp.int32)
            total = jnp.zeros((kc, Bn), jnp.int32)
            for n in range(2, MAX_HARMONICS + 1):
                kcn = kcn_of2[n]
                ef = fracT[:kcn] * n
                valid_n = ef < half
                sb = jnp.floor(ef - 1.0).astype(jnp.int32)
                ss = jnp.maximum(sb, last[:kcn] + 1)
                se = jnp.minimum(jnp.ceil(ef + 1.0).astype(jnp.int32),
                                 half - 1)
                nk = (n * k_c[:kcn])[:, None]    # [kcn, 1]
                cs_py = list(range(-n - 1, n + 2))
                bm = jnp.zeros((kcn, Bn), jnp.float32)
                if chunked:
                    bc = jnp.zeros((kcn, Bn), jnp.int32)
                    for lo in range(0, len(cs_py), _COMB_CHUNK):
                        chunk = cs_py[lo:lo + _COMB_CHUNK]
                        cs = jnp.asarray(chunk, jnp.int32)
                        vals = jnp.stack([
                            jax.lax.slice(pmT, (front + c, 0),
                                          (front + c + kcn * n, Bn), (n, 1))
                            for c in chunk], axis=0)      # [ch, kcn, B]
                        pos = nk[None] + cs[:, None, None]
                        in_band = (pos >= ss[None]) & (pos <= se[None])
                        masked = jnp.where(in_band, vals, 0.0)
                        cmax = jnp.max(masked, axis=0)
                        carg = jnp.argmax(masked, axis=0).astype(jnp.int32)
                        better = cmax > bm
                        bm = jnp.where(better, cmax, bm)
                        bc = jnp.where(better, carg + lo, bc)
                    bh = nk + bc - n - 1
                else:
                    bh = jnp.zeros((kcn, Bn), jnp.int32)
                    for c in cs_py:
                        vals = jax.lax.slice(pmT, (front + c, 0),
                                             (front + c + kcn * n, Bn),
                                             (n, 1))
                        pos = nk + c
                        v = jnp.where((pos >= ss) & (pos <= se), vals, 0.0)
                        better = v > bm          # strict: first (lowest c)
                        bm = jnp.where(better, v, bm)
                        bh = jnp.where(better,
                                       jnp.broadcast_to(pos, (kcn, Bn)), bh)
                found = bm > 0.0
                fe = found & valid_n
                miss = (~found) & valid_n

                def spl(new, old):
                    return (jnp.concatenate([new, old[kcn:]], axis=0)
                            if kcn < kc else new)
                score = spl(score[:kcn] + jnp.where(fe, bm, 0.0), score)
                last = spl(jnp.where(fe, bh, last[:kcn]), last)
                longest = spl(jnp.where(miss,
                                        jnp.maximum(longest[:kcn],
                                                    current[:kcn]),
                                        longest[:kcn]), longest)
                current = spl(jnp.where(fe, current[:kcn] + 1,
                                        jnp.where(miss, 0, current[:kcn])),
                              current)
                total = spl(total[:kcn] + fe.astype(jnp.int32), total)
                if kcn < kc:
                    tail_miss = (k_c[:, None] >= kcn) & (fracT * n < half)
                    longest = jnp.where(tail_miss,
                                        jnp.maximum(longest, current),
                                        longest)
                    current = jnp.where(tail_miss, 0, current)
            longest = jnp.maximum(longest, current)
            return score.T, longest.T, total.T
        return run

    variants = {
        "current": lambda: jax.vmap(
            lambda p, f, m: _comb_xla(p, f, m, half))(pm, frac_c, m_c),
        "fminor": lambda: make_fminor(True)(pm, frac_c, m_c),
        "fminor_chain": lambda: make_fminor(False)(pm, frac_c, m_c),
        "bf16": lambda: jax.vmap(comb_bf16)(pm, frac_c, m_c),
        "patches": lambda: jax.vmap(comb_patches)(pm, frac_c, m_c),
        "transpose": lambda: jax.vmap(comb_transpose)(pm, frac_c, m_c),
        "chain": lambda: jax.vmap(
            lambda p, f, m: comb_nostack(p, f, m, inner_chain))(pm, frac_c, m_c),
        "twopass": lambda: jax.vmap(
            lambda p, f, m: comb_nostack(p, f, m, inner_twopass))(pm, frac_c, m_c),
    }

    if args.only:
        keep = {"current"} | set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    results = {"frames": B}
    ref_out = None
    for tag, fn in variants.items():
        f = jax.jit(fn)
        try:
            out = f()
            jax.tree.map(np.asarray, out)
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            results[tag + "_error"] = msg
            print(f"{tag:10s} FAILED: {msg}", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f()
        np.asarray(out[0]).sum()
        dt = (time.perf_counter() - t0) / args.iters
        results[tag + "_ms"] = round(dt * 1000, 2)
        results[tag + "_fps"] = round(B / dt, 0)
        print(f"{tag:10s} {dt*1000:8.2f} ms  {B/dt:12,.0f} frames/s",
              file=sys.stderr)
        if ref_out is None:
            ref_out = jax.tree.map(np.asarray, out)
        else:
            same = all(np.array_equal(np.asarray(a), b)
                       for a, b in zip(out, ref_out))
            results[tag + "_exact"] = bool(same)
            print(f"{tag:10s} bit-exact vs current: {same}", file=sys.stderr)
            if not same:
                s_new = np.asarray(out[0], np.float64)
                s_ref = np.asarray(ref_out[0], np.float64)
                rel = np.abs(s_new - s_ref) / np.maximum(np.abs(s_ref), 1e-12)
                lr_mis = float(np.mean(np.asarray(out[1]) != ref_out[1]))
                th_mis = float(np.mean(np.asarray(out[2]) != ref_out[2]))
                results[tag + "_score_relmax"] = float(rel.max())
                results[tag + "_score_relmean"] = float(rel.mean())
                results[tag + "_run_mismatch"] = lr_mis
                results[tag + "_harms_mismatch"] = th_mis
                print(f"{tag:10s} score rel err max={rel.max():.3e} "
                      f"mean={rel.mean():.3e}; longest_run mismatch "
                      f"{lr_mis:.2%}, total_harms mismatch {th_mis:.2%}",
                      file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
