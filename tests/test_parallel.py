"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from audio_analyzer_rs_tpu.parallel.mesh import make_mesh, batch_sharding
from audio_analyzer_rs_tpu.parallel.sharding import (
    init_stream_states, make_batched_full_step)
from jax.sharding import NamedSharding, PartitionSpec as P


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8


def test_batched_full_step_runs_sharded():
    mesh = make_mesh()
    sr = 48000.0
    batch, chunk = 16, 4096
    step = make_batched_full_step(mesh, sr)
    states = init_stream_states(batch)
    sharding = batch_sharding(mesh)
    states = jax.device_put(states, jax.tree.map(lambda _: sharding, states))
    rng = np.random.default_rng(0)
    audio = jax.device_put((rng.standard_normal((batch, chunk)) * 0.1
                            ).astype(np.float32), sharding)
    states, out = step(states, audio)
    states, out = step(states, audio)
    assert out.stable_freqs.shape[0] == batch
    assert np.isfinite(float(out.global_noise_floor_db))
    assert int(out.global_onset_count) >= 0


def test_sharded_matches_single_device():
    """Data-parallel result must equal the unsharded computation."""
    sr = 48000.0
    batch, chunk = 8, 4096
    rng = np.random.default_rng(1)
    audio_np = (rng.standard_normal((batch, chunk)) * 0.05).astype(np.float32)

    mesh8 = make_mesh(jax.devices())
    step8 = make_batched_full_step(mesh8, sr)
    st8 = init_stream_states(batch)
    sh = batch_sharding(mesh8)
    st8 = jax.device_put(st8, jax.tree.map(lambda _: sh, st8))
    _, out8 = step8(st8, jax.device_put(audio_np, sh))

    mesh1 = make_mesh(jax.devices()[:1])
    step1 = make_batched_full_step(mesh1, sr)
    st1 = init_stream_states(batch)
    _, out1 = step1(st1, audio_np)

    np.testing.assert_allclose(np.asarray(out8.stable_freqs),
                               np.asarray(out1.stable_freqs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out8.onset_fired),
                                  np.asarray(out1.onset_fired))
    np.testing.assert_allclose(float(out8.global_noise_floor_db),
                               float(out1.global_noise_floor_db), rtol=1e-5)


def test_batched_streams_detect_their_own_tones():
    """BASELINE config #5: many independent streams per step — each shard
    analyzes its own stream; detected pitches stay per-stream."""
    from audio_analyzer_rs_tpu.models import generators as gen
    sr = 48000.0
    tones = [220.0, 261.63, 329.63, 392.0, 440.0, 523.25, 587.33, 659.26]
    batch = len(tones)
    chunk = 6 * 1024   # enough pitch frames for the tracker to stabilize
    audio = np.stack([
        gen.tone_with_harmonics(f, chunk / sr, sr, harmonics=6,
                                amplitude=0.3)[:chunk]
        for f in tones])
    mesh = make_mesh()
    step = make_batched_full_step(mesh, sr)
    states = init_stream_states(batch)
    sh = batch_sharding(mesh)
    states = jax.device_put(states, jax.tree.map(lambda _: sh, states))
    # Two steps so AGC/noise-floor warm up and the tracker stabilizes.
    states, out = step(states, jax.device_put(audio, sh))
    states, out = step(states, jax.device_put(audio, sh))
    sf = np.asarray(out.stable_freqs)   # [B, Np, 8]
    sv = np.asarray(out.stable_valid)
    for b, f in enumerate(tones):
        got = sf[b, -1][sv[b, -1]]
        assert any(abs(g - f) / f < 0.02 for g in got), (b, f, got)


def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_batched_step_floor_causality_matches_streaming_path():
    """The batched full step must feed each pitch/onset frame the AGC noise
    floor of the slot containing the frame's last sample (ref
    src/audio_io/stft.rs:322-324 causality), exactly like the sequential
    engine path that processes slot-by-slot.  Scene: quiet first half, loud
    second half, so a chunk-final floor broadcast would poison early frames."""
    from functools import partial

    import jax.numpy as jnp

    from audio_analyzer_rs_tpu.models.analyzer import OnsetAnalyzer, PitchAnalyzer
    from audio_analyzer_rs_tpu.ops import dynamics, reducer
    from audio_analyzer_rs_tpu.parallel.sharding import _single_stream_step

    sr = 48000.0
    slot_len = 1024
    n_slots = 40
    rng = np.random.default_rng(7)
    quiet = (rng.standard_normal(n_slots // 2 * slot_len) * 1e-3)
    loud = (rng.standard_normal(n_slots // 2 * slot_len) * 0.2)
    audio = np.concatenate([quiet, loud]).astype(np.float32)

    # Batched (sharded-step) path, unbatched single stream.
    states = jax.tree.map(lambda a: a[0], init_stream_states(1))
    single = partial(_single_stream_step, sample_rate=sr, slot_len=slot_len,
                     pitch_hop=512, onset_hop=64)
    _, (sf, sv, fired, vel, level, gf_db) = jax.jit(single)(
        states, jnp.asarray(audio))

    # Streaming oracle: identical reducer+AGC outputs, then slot-by-slot
    # analyzer feeding with each slot's own floor (the engine cadence).
    _, y = reducer.reduce_signal(reducer.reducer_init(), jnp.asarray(audio), sr)
    slots = jnp.asarray(np.asarray(y)[:n_slots * slot_len]
                        ).reshape(n_slots, slot_len)
    _, douts, gained = dynamics.dynamics_scan(dynamics.init_state(), slots,
                                              sr, slot_len, mode="hist")
    floors_db = np.asarray(douts.noise_floor_db)
    assert floors_db.max() - floors_db.min() > 6.0, "scene must move the floor"
    gained_np = np.asarray(gained)

    pa, oa = PitchAnalyzer(sr), OnsetAnalyzer(sr)
    p_outs, o_outs = [], []
    for k in range(n_slots):
        po = pa.process(gained_np[k], global_floor_db=float(floors_db[k]))
        if po is not None:
            p_outs.append((np.asarray(po.stable_freqs),
                           np.asarray(po.stable_valid)))
        oo = oa.process(gained_np[k], global_floor_db=float(floors_db[k]))
        if oo is not None:
            o_outs.append((np.asarray(oo.fired), np.asarray(oo.velocity)))

    sf_seq = np.concatenate([f for f, _ in p_outs])
    sv_seq = np.concatenate([v for _, v in p_outs])
    fired_seq = np.concatenate([f for f, _ in o_outs])
    vel_seq = np.concatenate([v for _, v in o_outs])
    assert sf_seq.shape == np.asarray(sf).shape
    np.testing.assert_array_equal(np.asarray(sv), sv_seq)
    np.testing.assert_allclose(np.asarray(sf), sf_seq, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fired), fired_seq)
    np.testing.assert_allclose(np.asarray(vel), vel_seq, rtol=1e-5, atol=1e-5)


def test_classroom_batched_analysis_drives_practice_feedback():
    """BASELINE config #5, end to end: one sharded device step analyzes a
    classroom of 8 student streams at once; each stream's pitch outputs
    drive that student's own host practice session, and every student's
    feedback reflects their own playing (correct / wrong note / silent)."""
    from audio_analyzer_rs_tpu.models import generators as gen
    from audio_analyzer_rs_tpu.practice.buffer import MeasureBuffer
    from audio_analyzer_rs_tpu.practice.clock import ClockConfig, ClockManager
    from audio_analyzer_rs_tpu.practice.conditioner import InputConditioner
    from audio_analyzer_rs_tpu.practice.mode import ModeController, TickInputs
    from audio_analyzer_rs_tpu.practice.types import TunerFrame
    from audio_analyzer_rs_tpu.transport import MusicalTransport
    from audio_analyzer_rs_tpu.utils.midi import Measure, SynthNote

    sr = 48000.0
    batch = 8
    chunk = 48 * 1024            # ~1 s per step → ~93 pitch frames
    # Students 0-2 play the expected C4, 3-5 play E4 (wrong note), 6-7 rest.
    freqs = [261.63] * 3 + [329.63] * 3 + [None] * 2

    def perf(f):
        x = np.zeros(chunk, np.float32)
        if f is not None:
            tone = gen.tone_with_harmonics(f, 1.0, sr, harmonics=6,
                                           amplitude=0.35)
            x[:len(tone)] += tone[:chunk]
        return x

    audio = np.stack([perf(f) for f in freqs])
    mesh = make_mesh()
    step = make_batched_full_step(mesh, sr)
    states = init_stream_states(batch)
    sh = batch_sharding(mesh)
    states = jax.device_put(states, jax.tree.map(lambda _: sh, states))
    states, out = step(states, jax.device_put(audio, sh))
    sf = np.asarray(out.stable_freqs)        # [B, Np, 8]
    sv = np.asarray(out.stable_valid)

    ref = Measure(notes=[SynthNote(freq=261.63, start_beat_in_measure=0.0,
                                   duration_beats=1.0, velocity=0.5,
                                   instrument="Piano")],
                  time_signature=(4, 4), bpm=120.0, global_start_beat=0.0)

    def run_session(b):
        transport = MusicalTransport(120.0, sr)
        transport.play()
        mc = ModeController("Performance", "Intermediate", transport,
                            InputConditioner(transport),
                            MeasureBuffer([ref], 0, 0),
                            ClockManager(transport, ClockConfig(), 120.0), 0)
        bps = 120.0 / 60.0
        for i in range(sf.shape[1]):
            beat = (i * 512 + 2048) / sr * bps
            notes = []
            for f, v in zip(sf[b, i], sv[b, i]):
                if v:
                    midi_f = 69.0 + 12.0 * np.log2(f / 440.0)
                    midi = int(round(midi_f))
                    notes.append((midi, (midi_f - midi) * 100.0))
            tf = TunerFrame(notes=notes, tuner_beat=beat) if notes else None
            mc.tick(TickInputs(transport_beat=beat, tuner_frame=tf,
                               new_onsets=[], dynamic_level=-1))
        mc.tick(TickInputs(transport_beat=5.0, tuner_frame=None,
                           new_onsets=[], dynamic_level=-1))   # age measure
        return [fb.error_type for fb in mc.feedback]

    for b in range(batch):
        kinds = run_session(b)
        if b <= 2:       # correct students: matched, no wrong/missing notes
            assert "None" in kinds and "WrongNote" not in kinds, (b, kinds)
            assert "MissingNote" not in kinds, (b, kinds)
        elif b <= 5:     # wrong-note students
            assert "WrongNote" in kinds, (b, kinds)
        else:            # silent students
            assert "MissingNote" in kinds, (b, kinds)


def test_pooled_wave_sharded_matches_single_device():
    """The multi-chip classroom: the stacked pool wave
    (models/analyzer.fused_slot_pool_step_stacked) with the engine axis
    sharded over the 8-device mesh must be BITWISE equal to the
    single-device pool step — states and packed readback — across
    chained waves (state threading included)."""
    import jax.numpy as jnp

    from audio_analyzer_rs_tpu.models.analyzer import fused_slot_pool_step
    from audio_analyzer_rs_tpu.ops import noisefloor, onset as onset_ops
    from audio_analyzer_rs_tpu.ops import tracker
    from audio_analyzer_rs_tpu.ops.stft import (ONSET_HOP, ONSET_WINDOW,
                                                PITCH_HOP, PITCH_WINDOW)
    from audio_analyzer_rs_tpu.parallel.sharding import make_pooled_wave_step
    from audio_analyzer_rs_tpu.utils.framing import num_frames

    sr = 48000.0
    K, slot_len = 8, 1024
    p_len = PITCH_WINDOW - PITCH_HOP        # steady ring-tail geometry
    o_len = 192
    n_o = num_frames(o_len + slot_len, ONSET_WINDOW, ONSET_HOP)
    rng = np.random.default_rng(3)

    def fresh(k):
        return (noisefloor.init_state(PITCH_WINDOW // 2 + 1),
                tracker.init_state(),
                onset_ops.init_state(ONSET_WINDOW // 2 + 1),
                jnp.asarray(False),
                jnp.asarray(rng.standard_normal(p_len).astype(np.float32)
                            * 0.1),
                jnp.asarray(rng.standard_normal(o_len).astype(np.float32)
                            * 0.1))

    states = tuple(fresh(k) for k in range(K))

    def wave_rows():
        rows = []
        for k in range(K):
            slot = (rng.standard_normal(slot_len) * 0.1).astype(np.float32)
            rows.append(np.concatenate([
                slot, np.asarray([1e-3, 1e-3, 0.0], np.float32),
                np.zeros(n_o, np.float32)]))
        return np.stack(rows)

    waves = [wave_rows() for _ in range(3)]

    # Single-device reference: per-engine tuples through the pool step.
    ref_states, ref_packed = states, []
    for w in waves:
        ref_states, packed = fused_slot_pool_step(
            ref_states, jnp.asarray(w), sr, slot_len, 1, p_len, o_len,
            pack=True)
        ref_packed.append(np.asarray(packed))

    # Mesh: stacked carries, engine axis over 8 devices.
    mesh = make_mesh()
    place, step = make_pooled_wave_step(mesh, sr, slot_len=slot_len)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    got_packed = []
    for w in waves:
        stacked, host = place(stacked, jnp.asarray(w))
        stacked, packed = step(stacked, host, p_len, o_len)
        got_packed.append(np.asarray(packed))

    for i, (a, b) in enumerate(zip(ref_packed, got_packed)):
        np.testing.assert_array_equal(a, b, err_msg=f"wave {i}")
    ref_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ref_states)
    for a, b in zip(jax.tree.leaves(ref_stacked), jax.tree.leaves(stacked)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The wave really ran partitioned: the engine axis is sharded.
    shard_devs = {s.device for s in stacked[4].addressable_shards}
    assert len(shard_devs) == 8, shard_devs
