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


def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
