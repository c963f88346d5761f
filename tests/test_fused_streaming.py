"""Fused streaming path parity: one-device-program-per-slot vs sequential.

The live engine's fused path (api/engine.py _fused_consume +
models/analyzer.fused_slot_step) must be an exact drop-in for the
sequential per-consumer path it accelerates: same tuner outputs, same
onset events, same analyzer states, slot for slot.  Ref: the realtime
callbacks it rebuilds, src/audio_io/mod.rs:657-938.
"""

import json

import numpy as np
import pytest

from audio_analyzer_rs_tpu.api.device import ArraySource
from audio_analyzer_rs_tpu.api.engine import AudioEngine
from audio_analyzer_rs_tpu.models import generators as gen

SR = 48000.0


def _run_session(fused: bool, seconds: float = 3.0, pause_at: int = -1,
                 depth: int = 0, aggregate: int = 1):
    """Scripted live session (tuner + onset over a mixed scene with loopback
    calibration); returns per-slot polled outputs + the engine."""
    scene = gen.mixed_scene(seconds + 0.5, SR, seed=11)
    e = AudioEngine(input_source=ArraySource(scene), sample_rate=SR,
                    loopback_latency_samples=2048, loopback_gain=1.0)
    e.fused_streaming = fused
    e.pipeline_depth = depth
    e.aggregate_slots = aggregate
    tuner = e.start_tuner()
    onset = e.start_onset_detection()
    slot_s = e.buffer_size / SR
    outs = []
    n_slots = int(seconds / slot_s)
    for i in range(n_slots):
        if pause_at >= 0 and i == pause_at:
            onset.pause()
        if pause_at >= 0 and i == pause_at + 12:
            onset.resume()
        e.advance(slot_s)
        outs.append((tuner.poll_output(), onset.poll_onsets()))
    return e, outs


def _consumers(e):
    from audio_analyzer_rs_tpu.api.engine import _OnsetConsumer, _PitchConsumer
    pc = next(c for c in e._consumers.values() if isinstance(c, _PitchConsumer))
    oc = next(c for c in e._consumers.values() if isinstance(c, _OnsetConsumer))
    return pc, oc


def test_fused_matches_sequential_slot_for_slot():
    ef, outs_f = _run_session(fused=True)
    es, outs_s = _run_session(fused=False)
    # The fused path must actually have engaged (post-calibration).
    assert ef._fused_slots > 0
    assert es._fused_slots == 0
    for i, (a, b) in enumerate(zip(outs_f, outs_s)):
        assert a == b, f"slot {i}: fused {a} != sequential {b}"
    # Onset events must have fired in the fused span (mixed_scene has
    # percussion), or the parity above proves nothing about events.
    fused_span_events = sum(len(json.loads(o)) for _, o in
                            outs_f[len(outs_f) // 2:])
    assert fused_span_events > 0


def test_fused_final_states_match():
    ef, _ = _run_session(fused=True)
    es, _ = _run_session(fused=False)
    pf, of = _consumers(ef)
    ps, os_ = _consumers(es)
    assert pf.analyzer.frames_consumed == ps.analyzer.frames_consumed
    assert of.analyzer.frames_consumed == os_.analyzer.frames_consumed
    np.testing.assert_array_equal(np.asarray(pf.analyzer._tail),
                                  np.asarray(ps.analyzer._tail))
    np.testing.assert_array_equal(np.asarray(of.analyzer._tail),
                                  np.asarray(os_.analyzer._tail))
    for a, b in zip(pf.analyzer.nf_state, ps.analyzer.nf_state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(pf.analyzer.tr_state, ps.analyzer.tr_state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(of.analyzer.state, os_.analyzer.state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_falls_back_on_pause_and_stays_exact():
    """Pausing the onset flow mid-run must drop to the sequential path
    (dropped-samples bookkeeping) and still match a sequential-only run."""
    ef, outs_f = _run_session(fused=True, pause_at=100)
    es, outs_s = _run_session(fused=False, pause_at=100)
    assert ef._fused_slots > 0
    assert outs_f == outs_s


def _assert_states_equal(ea, eb):
    pa, oa = _consumers(ea)
    pb, ob = _consumers(eb)
    assert pa.analyzer.frames_consumed == pb.analyzer.frames_consumed
    assert oa.analyzer.frames_consumed == ob.analyzer.frames_consumed
    np.testing.assert_array_equal(np.asarray(pa.analyzer._tail),
                                  np.asarray(pb.analyzer._tail))
    np.testing.assert_array_equal(np.asarray(oa.analyzer._tail),
                                  np.asarray(ob.analyzer._tail))
    for a, b in zip(pa.analyzer.nf_state, pb.analyzer.nf_state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(pa.analyzer.tr_state, pb.analyzer.tr_state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(oa.analyzer.state, ob.analyzer.state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_depth_matches_synchronous():
    """pipeline_depth=N defers WHEN results surface, never WHAT they are:
    the cumulative onset-event stream (after a final flush) and all final
    analyzer state must be bit-identical to the synchronous fused path.
    Per-slot polls lag by <=N slots — semantically a latency constant
    (ref src/lib.rs:80-82: every consumer surface is poll-based)."""
    e0, outs0 = _run_session(fused=True, depth=0)
    e3, outs3 = _run_session(fused=True, depth=3)
    assert e3._fused_slots > 0
    # Drain the deferred queue, then one last poll for the tail events.
    e3.flush_analysis()
    tail = json.loads(e3.active_onset.poll_onsets())
    ev0 = [ev for _, o in outs0 for ev in json.loads(o)]
    ev3 = [ev for _, o in outs3 for ev in json.loads(o)] + tail
    assert ev0 == ev3 and len(ev0) > 0
    # The last tuner reading catches up after the flush.
    assert e3.active_tuner.poll_output() == outs0[-1][0]
    _assert_states_equal(e0, e3)
    # Calibration must have completed identically (depth forced to 0 while
    # the loopback calibration holds — ref onset.rs:404-440).
    _, oc0 = _consumers(e0)
    _, oc3 = _consumers(e3)
    assert oc0.calibration_done and oc3.calibration_done
    assert (e0.transport.get_calibration_offset()
            == e3.transport.get_calibration_offset())


def test_pipelined_checkpoint_flushes(tmp_path):
    """save_engine mid-stream on a deep-pipelined engine must first surface
    every consumed slot: its snapshot equals the synchronous engine's."""
    import io

    from audio_analyzer_rs_tpu import checkpoint

    e0, _ = _run_session(fused=True, depth=0, seconds=2.0)
    e3, _ = _run_session(fused=True, depth=3, seconds=2.0)
    p0, p3 = str(tmp_path / "sync.npz"), str(tmp_path / "deep.npz")
    checkpoint.save_engine(p0, e0)
    checkpoint.save_engine(p3, e3)
    a, b = np.load(p0, allow_pickle=True), np.load(p3, allow_pickle=True)
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        if k == "meta_json":
            assert str(a[k]) == str(b[k])
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert e3._resident is None  # flush left fused-residency cleanly


def _assert_states_equal_agg(ea, eb):
    """Aggregate-mode state contract: every leaf bit-equal EXCEPT the
    noise-floor IIR leaves (floor, volatility), which may carry bounded
    last-ulp FMA-contraction drift — the chained program is a different
    XLA module and the backend may contract the EMA mul-adds differently
    there (the divergence class mechanically proven precision-only in
    tests/test_divergence_proof.py; optimization barriers in
    fused_slot_agg_step bound but cannot eliminate cross-module codegen
    differences).  The drift is ulp-relative (~1e-7, self-limiting via the
    EMAs' forgetting) and the consumer-visible surfaces — onset events and
    every tuner reading — are asserted bit-equal separately."""
    pa, oa = _consumers(ea)
    pb, ob = _consumers(eb)
    assert pa.analyzer.frames_consumed == pb.analyzer.frames_consumed
    assert oa.analyzer.frames_consumed == ob.analyzer.frames_consumed
    np.testing.assert_array_equal(np.asarray(pa.analyzer._tail),
                                  np.asarray(pb.analyzer._tail))
    np.testing.assert_array_equal(np.asarray(oa.analyzer._tail),
                                  np.asarray(ob.analyzer._tail))
    for name, a, b in zip(pa.analyzer.nf_state._fields,
                          pa.analyzer.nf_state, pb.analyzer.nf_state):
        a, b = np.asarray(a), np.asarray(b)
        if name in ("floor", "volatility"):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-6,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)
    for a, b in zip(pa.analyzer.tr_state, pb.analyzer.tr_state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(oa.analyzer.state, ob.analyzer.state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aggregated_slots_match_synchronous():
    """aggregate_slots=A chains A slots into one device program
    (fused_slot_agg_step): the consumer-visible surfaces — onset events
    and every tuner reading — must be bit-identical to per-slot dispatch
    (results merely surface <=A slots later); analyzer states match under
    the aggregate-mode contract (_assert_states_equal_agg)."""
    e0, outs0 = _run_session(fused=True, depth=0)
    eA, outsA = _run_session(fused=True, depth=1, aggregate=4)
    assert eA._fused_slots > 0
    eA.flush_analysis()
    tail = json.loads(eA.active_onset.poll_onsets())
    ev0 = [ev for _, o in outs0 for ev in json.loads(o)]
    evA = [ev for _, o in outsA for ev in json.loads(o)] + tail
    assert ev0 == evA and len(ev0) > 0
    assert eA.active_tuner.poll_output() == outs0[-1][0]
    _assert_states_equal_agg(e0, eA)
    assert (e0.transport.get_calibration_offset()
            == eA.transport.get_calibration_offset())


def test_aggregate_partial_flush_mid_stream(tmp_path):
    """Checkpointing mid-aggregate must dispatch the partial aggregate and
    surface it: the snapshot equals the synchronous engine's (volatility
    leaf under the aggregate-mode ulp contract) even when the slot count
    is not a multiple of aggregate_slots."""
    from audio_analyzer_rs_tpu import checkpoint

    # 2.0s at 1024/48k = 93 slots = 23 full 4-aggregates + 1 partial.
    e0, _ = _run_session(fused=True, depth=0, seconds=2.0)
    eA, _ = _run_session(fused=True, depth=2, aggregate=4, seconds=2.0)
    p0, pA = str(tmp_path / "sync.npz"), str(tmp_path / "agg.npz")
    checkpoint.save_engine(p0, e0)
    checkpoint.save_engine(pA, eA)
    assert eA._resident is None      # flush left fused-residency cleanly
    a, b = np.load(p0, allow_pickle=True), np.load(pA, allow_pickle=True)
    assert sorted(a.files) == sorted(b.files)
    # tuner_nf_0/tuner_nf_2 are the noise-floor IIR leaves (floor,
    # volatility — NoiseFloorState leaves 0 and 2): the leaves allowed
    # bounded FMA-contraction ulp drift in aggregate mode (see
    # _assert_states_equal_agg).
    for k in a.files:
        if k == "meta_json":
            assert str(a[k]) == str(b[k])
        elif k in ("tuner_nf_0", "tuner_nf_2"):
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=2e-6,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_fused_covers_calibration_slots():
    """r3 folded calibration into the fused program: the fused path must now
    engage from slot 0 (during the loopback-calibration ramp), not only
    post-calibration, halving the compiled program population."""
    e, _ = _run_session(fused=True, seconds=1.0)
    slot_s = e.buffer_size / SR
    n_slots = int(1.0 / slot_s)
    assert e._fused_slots == n_slots


def test_debug_recorder_disables_fusion():
    from audio_analyzer_rs_tpu import devtools
    scene = gen.mixed_scene(1.0, SR, seed=3)
    e = AudioEngine(input_source=ArraySource(scene), sample_rate=SR)
    e.attach_debug_recorder(devtools.DebugRecorder(max_frames=64))
    e.start_tuner()
    e.start_onset_detection()
    e.advance(0.8)
    assert e._fused_slots == 0


def test_prepare_covers_all_slot_programs():
    """AudioEngine.prepare()'s coverage claim, enforced: after prepare(),
    a FULL live session — loopback calibration (per-slot hold dispatches
    over the ring-tail ramp), steady aggregated streaming, and a
    mid-chain flush (partial aggregates decompose to the warm per-slot
    program) — must add ZERO new jit cache entries to the fused slot
    programs.  r4 shipped prepare() citing this test without writing it,
    and the exact regression it exists to catch had already happened:
    the scratch session never left calibration hold, so with
    aggregate_slots>1 the aggregate program was never compiled and the
    live session stalled on the full XLA compile at its first
    post-calibration aggregate dispatch."""
    import jax

    from audio_analyzer_rs_tpu.models import analyzer as an

    for agg in (1, 4):
        # Start from empty jit caches, or programs compiled by EARLIER
        # tests in this module would mask coverage gaps (the check would
        # pass vacuously).
        jax.clear_caches()
        cfg = AudioEngine(sample_rate=SR, buffer_size=1024)
        cfg.aggregate_slots = agg
        cfg.pipeline_depth = 1
        cfg.prepare()
        before = (an.fused_slot_step._cache_size(),
                  an.fused_slot_agg_step._cache_size())
        e, _ = _run_session(fused=True, depth=1, aggregate=agg)
        e.flush_analysis()
        after = (an.fused_slot_step._cache_size(),
                 an.fused_slot_agg_step._cache_size())
        assert after == before, (
            f"agg={agg}: live session compiled programs prepare() missed "
            f"(fused_slot_step {before[0]}->{after[0]}, "
            f"fused_slot_agg_step {before[1]}->{after[1]})")
        # The session must actually have exercised what it claims:
        # calibration completed and the configured dispatch mode ran.
        _, oc = _consumers(e)
        assert oc.calibration_done
        assert e._fused_slots > 0
        if agg > 1:
            assert e._agg_dispatches > 0


def test_solo_speculative_calibration_rolls_back_and_matches():
    """With pipeline_depth >= 1, a solo engine's calibration slots
    dispatch speculatively (next slot in flight before the previous
    result lands) instead of forcing a synchronous round trip per slot;
    the at-most-once transition rolls the in-flight dispatch back and
    rebuilds it (api/engine.py _fused_drain_entry/_respeculate).  Outputs
    must still match the sequential path exactly, and both transition
    kinds must actually exercise the rollback."""
    # Acceptance transition (loopback calibration).
    e, _ = _run_session(fused=True, depth=1, aggregate=4)
    e.flush_analysis()
    assert e._spec_rollbacks == 1, e._spec_rollbacks
    es, _ = _run_session(fused=False)
    _assert_states_equal_agg(e, es)
    # Timeout transition (no loopback: 2 s offset-0 fallback).
    scene = gen.mixed_scene(3.0, SR, seed=5)

    def run(depth):
        e = AudioEngine(input_source=ArraySource(scene), sample_rate=SR)
        e.pipeline_depth = depth
        tuner = e.start_tuner()
        onset = e.start_onset_detection()
        slot_s = e.buffer_size / SR
        events = []
        for _ in range(int(2.5 / slot_s)):
            e.advance(slot_s)
            events.extend(json.loads(onset.poll_onsets()))
        e.flush_analysis()
        events.extend(json.loads(onset.poll_onsets()))
        return e, events

    e1, ev1 = run(1)
    e0, ev0 = run(0)
    assert e1._spec_rollbacks == 1 and e0._spec_rollbacks == 0
    assert ev1 == ev0
    _assert_states_equal(e0, e1)
    _, oc1 = _consumers(e1)
    assert oc1.calibration_done


def test_calibration_transition_predicate_matches_post(monkeypatch):
    """_OnsetConsumer._calibration_transition must agree with _post's
    ACTUAL calibration effect on every single burst — the speculation
    machinery (solo and pooled) decides rollbacks with the predicate, so
    any drift silently diverges speculative state.  Checked live across
    both transition kinds by instrumenting every post."""
    from audio_analyzer_rs_tpu.api.engine import _OnsetConsumer

    records = []
    orig = _OnsetConsumer._post

    def wrapped(self, out, tick_sup, base, anchor=None):
        if anchor is None:
            anchor = self.engine._stamp_anchor()
        pred = self._calibration_transition(out, base, anchor)
        before = self.calibration_done
        orig(self, out, tick_sup, base, anchor=anchor)
        actual = (not before) and self.calibration_done
        records.append((pred, actual))

    monkeypatch.setattr(_OnsetConsumer, "_post", wrapped)

    # Acceptance transition (loopback), speculative depth.
    e, _ = _run_session(fused=True, seconds=2.5, depth=1, aggregate=4)
    e.flush_analysis()
    # Timeout transition (no loopback, 2 s fallback).
    e2 = AudioEngine(input_source=ArraySource(gen.mixed_scene(3.0, SR,
                                                             seed=5)),
                     sample_rate=SR)
    e2.pipeline_depth = 1
    e2.start_tuner()
    e2.start_onset_detection()
    e2.advance(2.5)
    e2.flush_analysis()

    assert len(records) > 100
    transitions = [r for r in records if r[1]]
    assert len(transitions) == 2, len(transitions)   # one per engine
    for i, (pred, actual) in enumerate(records):
        assert pred == actual, f"post {i}: predicate {pred} != {actual}"
