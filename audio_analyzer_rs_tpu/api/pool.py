"""EnginePool — K live AudioEngines, ONE device dispatch per slot wave.

The reference runs exactly one realtime engine per process (its engine owns
the cpal device callbacks and global singletons, ref src/audio_io/mod.rs:
960-1129); serving K simultaneous live sessions means K processes and K
independent hosts' worth of compute.  On TPU the fused per-slot program is
tiny next to the chip (and, through a tunneled link, next to the per-call
round trip), so K sessions can share the hardware qualitatively better:
the pool steps its member engines in lockstep, collects each engine's
fused-eligible slot, and dispatches the whole wave as ONE vmapped device
program (models/analyzer.fused_slot_pool_step) — K engines' pitch+onset
flows in a single batched dispatch, with ONE packed deferred readback per
wave.  `aggregate_slots` additionally chains A waves per dispatch (the
single-engine aggregation, models/analyzer.fused_slot_agg_step, under the
same vmap), so the classroom scenario costs ~2 blocking round trips per
K x A engine-slots.

Per-engine semantics are unchanged: between waves every engine still owns
its own device arrays (states unstack at the dispatch boundary), so any
member can leave the pool, checkpoint (checkpoint.save_engine flushes via
engine.flush_analysis -> pool.flush), pause a flow (it falls back to its
own sequential path and simply skips waves), or be driven solo — at any
wave boundary.  Outputs match K independently-driven engines under the
aggregate-mode numeric contract (consumer-visible surfaces bit-equal;
noise-floor IIR leaves allowed ulp-level FMA-contraction drift — the
batched module is a different XLA program; tests/test_pool.py).

Usage:
    pool = EnginePool([e1, e2, ...], pipeline_depth=1, aggregate_slots=4)
    pool.run_realtime(10.0)      # or pool.advance(seconds)
    ...poll each engine's tuner/onset surfaces as usual...
    pool.flush()                 # surface any deferred wave results
"""

from __future__ import annotations

import time
from typing import List, NamedTuple

import numpy as np


class _Entry(NamedTuple):
    engine: object
    slot: np.ndarray
    pc: object
    oc: object
    host_vec: np.ndarray
    meta: tuple       # (n_p, n_o, p_base, o_base, tick_sup, anchor)
    p_len: int
    o_len: int
    hold: bool


class EnginePool:
    """Lockstep scheduler over K AudioEngines sharing one device.

    `pipeline_depth` / `aggregate_slots` mirror the single-engine knobs
    (api/engine.py) but apply per WAVE: depth defers each dispatch's
    packed readback by N dispatches; aggregation chains A waves into one
    dispatch.  Both are forced to synchronous/per-wave while any member
    engine's latency calibration holds (calibration acceptance rewrites
    that engine's onset scan state between slots, ref onset.rs:404-440).
    """

    def __init__(self, engines=(), pipeline_depth: int = 0,
                 aggregate_slots: int = 1):
        self._engines: List = []
        self._collect = None      # non-None while a wave is being collected
        self._queue: List[dict] = []   # deferred packed readbacks (FIFO)
        self._acc = None          # accumulating aggregate of waves
        self.pipeline_depth = max(int(pipeline_depth), 0)
        self.aggregate_slots = max(int(aggregate_slots), 1)
        self.waves = 0            # observability: dispatched wave count
        for e in engines:
            self.add(e)

    # ── membership ───────────────────────────────────────────────────────

    def add(self, engine) -> None:
        if engine._pool is self:
            return
        if engine._pool is not None:
            raise ValueError("engine already belongs to another pool")
        if self._engines:
            e0 = self._engines[0]
            if (engine.sample_rate != e0.sample_rate
                    or engine.buffer_size != e0.buffer_size):
                raise ValueError(
                    "pool engines must share sample_rate and buffer_size")
        engine._pool = self
        self._engines.append(engine)

    def remove(self, engine) -> None:
        """Detach an engine (its deferred results surface first)."""
        if engine not in self._engines:
            return
        self.flush()
        engine._pool = None
        self._engines.remove(engine)

    @property
    def engines(self):
        return tuple(self._engines)

    # ── lockstep stepping ────────────────────────────────────────────────

    def advance(self, seconds: float) -> None:
        """Run virtual time forward on every member engine, one slot wave
        per buffer period (the pool twin of AudioEngine.advance)."""
        e0 = self._engines[0]
        n = int(round(seconds * e0.sample_rate)) // e0.buffer_size
        for _ in range(n):
            self.step_wave()

    def run_realtime(self, seconds: float) -> None:
        """Wall-clock-paced lockstep (the pool twin of run_realtime)."""
        e0 = self._engines[0]
        period = e0.buffer_size / e0.sample_rate
        n = int(round(seconds * e0.sample_rate)) // e0.buffer_size
        next_t = time.monotonic()
        for _ in range(n):
            self.step_wave()
            next_t += period
            sleep = next_t - time.monotonic()
            if sleep > 0:
                time.sleep(sleep)

    def step_wave(self) -> None:
        """Advance every engine one buffer; fused-eligible slots batch into
        one device dispatch (engines whose fused conditions lapsed — a
        paused flow, a debug recorder — consume sequentially inside their
        own device step and simply skip the wave)."""
        self._collect = []
        try:
            for e in self._engines:
                e.device.step()
        finally:
            entries, self._collect = self._collect, None
        if entries:
            self._wave_dispatch(entries)
        for e in self._engines:
            e._practice_ticks()

    # ── wave dispatch ────────────────────────────────────────────────────

    def _wave_dispatch(self, collected) -> None:
        import jax.numpy as jnp

        prepared: List[_Entry] = []
        hold_any = False
        for (e, slot, pc, oc) in collected:
            slot = np.asarray(slot, np.float32)
            res = e._resident
            if res is None:
                # Entering fused mode under the pool: same residency init
                # as the single-engine path (api/engine.py _fused_consume).
                res = e._resident = {
                    "p_tail": jnp.asarray(
                        np.asarray(pc.analyzer._tail, np.float32)),
                    "o_tail": jnp.asarray(
                        np.asarray(oc.analyzer._tail, np.float32)),
                    "pending": jnp.asarray(bool(e.onset_pending)),
                    "queue": [], "pc": pc, "oc": oc,
                }
                e.onset_pending = False
            while res["queue"]:
                # Solo-driven deferred results predate this wave: surface
                # them first so per-engine slot order is preserved.
                e._fused_drain_entry(res["queue"].pop(0), pc, oc)
            hv, n_p, n_o, tick_sup, hold, p_len, o_len = \
                e._fused_inputs(slot, pc, oc)
            meta = (n_p, n_o, pc.analyzer.frames_consumed,
                    oc.analyzer.frames_consumed, tick_sup,
                    e.transport.anchor())
            prepared.append(_Entry(e, slot, pc, oc, hv, meta, p_len, o_len,
                                   hold))
            hold_any = hold_any or hold
        for en in prepared:
            en.engine._fused_slots += 1
            en.engine._fused_advance_host(en.slot, en.pc, en.oc,
                                          en.meta[0], en.meta[1])

        # Lockstep waves share ring-tail geometry; a mixed wave (an engine
        # mid-(re)join with different tails) splits into per-geometry
        # groups, each its own dispatch.
        groups: dict = {}
        for en in prepared:
            groups.setdefault((len(en.slot), en.p_len, en.o_len),
                              []).append(en)
        multi_group = len(groups) > 1
        for key, entries in groups.items():
            slot_len, p_len, o_len = key
            wave = [(en.engine, en.pc, en.oc) for en in entries]
            payload = [(en.host_vec, en.meta) for en in entries]
            agg = self.aggregate_slots
            if hold_any or agg <= 1 or multi_group:
                self._flush_acc()
                self._dispatch_group(wave, [payload], slot_len, p_len,
                                     o_len,
                                     0 if hold_any else self.pipeline_depth)
                continue
            acc = self._acc
            if acc is not None and (acc["wave"] != wave
                                    or acc["next"] != key):
                self._flush_acc()
                acc = None
            if acc is None:
                acc = self._acc = {
                    "wave": wave, "slot_len": slot_len, "p_len0": p_len,
                    "o_len0": o_len, "payloads": [], "next": key,
                }
            acc["payloads"].append(payload)
            # Advance the expected tail geometry for the next wave (the
            # static ramp fused_slot_agg_step chains internally).
            from ..utils.framing import num_frames
            pc0, oc0 = wave[0][1], wave[0][2]
            pa, oa = pc0.analyzer, oc0.analyzer
            n_p = num_frames(p_len + slot_len, pa.window, pa.hop)
            n_o = num_frames(o_len + slot_len, oa.window, oa.hop)
            acc["next"] = (slot_len, p_len + slot_len - n_p * pa.hop,
                           o_len + slot_len - n_o * oa.hop)
            if len(acc["payloads"]) >= agg:
                self._flush_acc()

    def _flush_acc(self) -> None:
        acc, self._acc = self._acc, None
        if acc and acc["payloads"]:
            self._dispatch_group(acc["wave"], acc["payloads"],
                                 acc["slot_len"], acc["p_len0"],
                                 acc["o_len0"], self.pipeline_depth)

    def _dispatch_group(self, wave, payloads, slot_len: int, p_len0: int,
                        o_len0: int, depth: int) -> None:
        """Dispatch one group: `wave` = [(engine, pc, oc)] (K members),
        `payloads` = [per-wave [(host_vec, meta)] aligned with `wave`]
        (A chained sub-slots).  ONE vmapped device program, ONE packed
        deferred readback."""
        import jax.numpy as jnp

        from ..models.analyzer import fused_slot_pool_step

        K, A = len(wave), len(payloads)
        e0, pc0, oc0 = wave[0]
        pa0, oa0 = pc0.analyzer, oc0.analyzer
        for (_, pc, oc) in wave[1:]:
            if ((pc.analyzer.window, pc.analyzer.hop, pc.analyzer.backend,
                 oc.analyzer.window, oc.analyzer.hop, oc.analyzer.backend)
                    != (pa0.window, pa0.hop, pa0.backend, oa0.window,
                        oa0.hop, oa0.backend)):
                raise ValueError("pool engines must share analyzer geometry")
        host_vecs = np.stack([
            np.concatenate([payloads[a][k][0] for a in range(A)])
            for k in range(K)])
        states = []
        for (e, pc, oc) in wave:
            res = e._resident
            states.append((pc.analyzer.nf_state, pc.analyzer.tr_state,
                           oc.analyzer.state, res["pending"],
                           res["p_tail"], res["o_tail"]))
        new_states, packed = fused_slot_pool_step(
            tuple(states), jnp.asarray(host_vecs), e0.sample_rate,
            slot_len, A, p_len0, o_len0, pa0.window, pa0.hop, oa0.window,
            oa0.hop, pa0.backend, oa0.backend, pack=True)
        for (e, pc, oc), st in zip(wave, new_states):
            pc.analyzer.nf_state, pc.analyzer.tr_state = st[0], st[1]
            oc.analyzer.state = st[2]
            res = e._resident
            res["pending"], res["p_tail"], res["o_tail"] = st[3], st[4], st[5]
        packed.copy_to_host_async()
        self.waves += A
        # Per-sub-slot frame counts are geometry-shared across the wave
        # (engine 0's metas); metas stay per-engine for posting.
        self._queue.append({
            "vec": packed, "wave": wave,
            "frame_counts": [(payloads[a][0][1][0], payloads[a][0][1][1])
                             for a in range(A)],
            "metas": [[payloads[a][k][1] for k in range(K)]
                      for a in range(A)],
        })
        while len(self._queue) > depth:
            self._drain_entry(self._queue.pop(0))

    def _drain_entry(self, q: dict) -> None:
        import jax

        from ..models.analyzer import unpack_fused_pool_out

        vec = np.asarray(jax.device_get(q["vec"]), np.float32)
        outs = unpack_fused_pool_out(vec, len(q["wave"]), q["frame_counts"])
        for a, per_engine in enumerate(outs):
            for k, out in enumerate(per_engine):
                e, pc, oc = q["wave"][k]
                e._fused_post((out,) + q["metas"][a][k], pc, oc)

    def flush(self) -> None:
        """Surface every deferred wave result now (engine.flush_analysis /
        checkpoint.save_engine on any member routes here)."""
        self._flush_acc()
        while self._queue:
            self._drain_entry(self._queue.pop(0))

    # ── cold start ───────────────────────────────────────────────────────

    def prepare(self) -> dict:
        """Compile the pool's wave programs up front (the pool twin of
        AudioEngine.prepare): walks the ring-tail ramp with zero audio and
        throwaway states for the member count K, then the steady-state
        aggregate program.  Returns {"variants": [...], "seconds": {...},
        "total_s": float}."""
        import jax
        import jax.numpy as jnp

        from ..models.analyzer import (OnsetAnalyzer, PitchAnalyzer,
                                       fused_slot_pool_step)
        from ..ops import noisefloor, onset as onset_ops, tracker
        from ..utils.framing import num_frames

        e0 = self._engines[0]
        K = len(self._engines)
        pa, oa = PitchAnalyzer(e0.sample_rate), OnsetAnalyzer(e0.sample_rate)
        slot_len = e0.buffer_size

        def fresh_state(p_len, o_len):
            return (noisefloor.init_state(pa.window // 2 + 1),
                    tracker.init_state(),
                    onset_ops.init_state(oa.window // 2 + 1),
                    jnp.asarray(False),
                    jnp.zeros(p_len, jnp.float32),
                    jnp.zeros(o_len, jnp.float32))

        seen: list = []
        seconds: dict = {}
        t_all = time.perf_counter()
        p_len = o_len = 0
        while (p_len, o_len) not in seen:
            seen.append((p_len, o_len))
            n_p = num_frames(p_len + slot_len, pa.window, pa.hop)
            n_o = num_frames(o_len + slot_len, oa.window, oa.hop)
            hv = np.zeros((K, slot_len + 3 + n_o), np.float32)
            states = tuple(fresh_state(p_len, o_len) for _ in range(K))
            t0 = time.perf_counter()
            _, packed = fused_slot_pool_step(
                states, jnp.asarray(hv), e0.sample_rate, slot_len, 1,
                p_len, o_len, pa.window, pa.hop, oa.window, oa.hop,
                pa.backend, oa.backend, pack=True)
            jax.block_until_ready(packed)
            seconds[f"pool{K}_{p_len}_{o_len}"] = time.perf_counter() - t0
            p_len = p_len + slot_len - n_p * pa.hop
            o_len = o_len + slot_len - n_o * oa.hop
        agg = self.aggregate_slots
        if agg > 1:
            pl, ol = p_len, o_len
            hv = []
            for _ in range(agg):
                n_p = num_frames(pl + slot_len, pa.window, pa.hop)
                n_o = num_frames(ol + slot_len, oa.window, oa.hop)
                hv.append(np.zeros(slot_len + 3 + n_o, np.float32))
                pl += slot_len - n_p * pa.hop
                ol += slot_len - n_o * oa.hop
            row = np.concatenate(hv)
            states = tuple(fresh_state(p_len, o_len) for _ in range(K))
            t0 = time.perf_counter()
            _, packed = fused_slot_pool_step(
                states, jnp.asarray(np.stack([row] * K)), e0.sample_rate,
                slot_len, agg, p_len, o_len, pa.window, pa.hop, oa.window,
                oa.hop, pa.backend, oa.backend, pack=True)
            jax.block_until_ready(packed)
            seconds[f"pool{K}_agg{agg}_{p_len}_{o_len}"] = \
                time.perf_counter() - t0
        return {"variants": seen, "seconds": seconds,
                "total_s": time.perf_counter() - t_all}
