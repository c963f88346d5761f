"""Data-parallel batched analysis over a device mesh.

`batched_full_step` is the framework's "full step": the complete per-stream
analysis chain (reducer conditioning → AGC → pitch STFT pipeline → onset
pipeline) vmapped over a batch of independent streams and sharded over the
mesh's data axis with `shard_map`.  Per-frame features are embarrassingly
parallel across streams, so the only collectives are `psum`-based fleet
statistics (global mean noise floor / onset count) — they ride ICI.

This is the TPU-native reframing of SURVEY §2's "Parallelism" row: the
reference's thread pipeline becomes one SPMD program per shard.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import dynamics, noisefloor, onset as onset_ops, pitch as pitch_ops
from ..ops import reducer, tracker
from ..ops.stft import ONSET_WINDOW, PITCH_WINDOW, windowed_mags
from ..utils.framing import frame_signal
from .mesh import DATA_AXIS


class FullStepOut(NamedTuple):
    stable_freqs: jax.Array    # [B, Np, 8]
    stable_valid: jax.Array    # [B, Np, 8]
    onset_fired: jax.Array     # [B, No]
    onset_velocity: jax.Array  # [B, No]
    dyn_level: jax.Array       # [B, S]
    global_noise_floor_db: jax.Array  # scalar — psum'd fleet statistic
    global_onset_count: jax.Array     # scalar — psum'd fleet statistic


class StreamStates(NamedTuple):
    """Per-stream carried state for the full chain ([B, ...] leaves)."""
    red: reducer.ReducerState
    dyn: dynamics.DynamicsState
    nf: noisefloor.NoiseFloorState
    tr: tracker.TrackerState
    on: onset_ops.OnsetState


def init_stream_states(batch: int, half: int = PITCH_WINDOW // 2 + 1):
    def rep(x):
        return jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), x)
    return StreamStates(
        red=rep(reducer.reducer_init()),
        dyn=rep(dynamics.init_state()),
        nf=rep(noisefloor.init_state(half)),
        tr=rep(tracker.init_state()),
        on=rep(onset_ops.init_state()),
    )


def _single_stream_step(states: StreamStates, audio, sample_rate: float,
                        slot_len: int, pitch_hop: int, onset_hop: int):
    """One stream's full analysis chain on a fixed-length audio chunk."""
    red, y = reducer.reduce_signal(states.red, audio, sample_rate)
    slots = y[: (y.shape[0] // slot_len) * slot_len].reshape(-1, slot_len)
    dyn, douts, gained = dynamics.dynamics_scan(states.dyn, slots, sample_rate,
                                                slot_len, mode="hist")
    cond = gained.reshape(-1)

    # Pitch pipeline.
    pframes = frame_signal(cond, PITCH_WINDOW, pitch_hop)
    pmags = windowed_mags(pframes, PITCH_WINDOW)
    half = PITCH_WINDOW // 2 + 1
    gf_db = douts.noise_floor_db[-1]
    gfp = jnp.broadcast_to(noisefloor.global_floor_linear(gf_db, half),
                           (pframes.shape[0],))
    bin_width = sample_rate / PITCH_WINDOW
    nf, eff = noisefloor.noise_floor_scan(
        states.nf, pmags, gfp, pitch_ops.candidate_band(bin_width, half))
    pf = pitch_ops.extract_pitches(pmags, eff, bin_width)
    tr, (sf, ss, sv) = tracker.tracker_scan(
        states.tr, pf.freqs, pf.scores, pf.valid,
        jnp.zeros(pframes.shape[0], bool))

    # Onset pipeline.
    oframes = frame_signal(cond, ONSET_WINDOW, onset_hop)
    omags = windowed_mags(oframes, ONSET_WINDOW)
    ohalf = ONSET_WINDOW // 2 + 1
    gfo = jnp.broadcast_to(noisefloor.global_floor_linear(gf_db, ohalf),
                           (oframes.shape[0],))
    on, oouts = onset_ops.onset_scan(states.on, omags, gfo,
                                     jnp.zeros(oframes.shape[0], bool))

    new_states = StreamStates(red, dyn, nf, tr, on)
    return new_states, (sf, sv, oouts.fired, oouts.velocity, douts.level, gf_db)


def make_batched_full_step(mesh: Mesh, sample_rate: float,
                           slot_len: int = 1024, pitch_hop: int = 512,
                           onset_hop: int = 64):
    """Build the jitted sharded full step: ([B,...] states, [B, T] audio) →
    (states, FullStepOut).  B must be divisible by the mesh size."""
    single = partial(_single_stream_step, sample_rate=sample_rate,
                     slot_len=slot_len, pitch_hop=pitch_hop,
                     onset_hop=onset_hop)

    def shard_fn(states, audio):
        states, (sf, sv, fired, vel, level, gf_db) = jax.vmap(single)(states, audio)
        # Fleet-wide aggregates: mean noise floor + total onsets (psum on ICI).
        local_b = audio.shape[0]
        total_b = local_b * jax.lax.psum(1, DATA_AXIS)
        global_floor = jax.lax.psum(jnp.sum(gf_db), DATA_AXIS) / total_b
        global_onsets = jax.lax.psum(jnp.sum(fired.astype(jnp.int32)), DATA_AXIS)
        return states, FullStepOut(sf, sv, fired, vel, level,
                                   global_floor, global_onsets)

    spec_b = P(DATA_AXIS)
    states_spec = jax.tree.map(lambda _: spec_b, init_stream_states(1))
    out_spec = FullStepOut(spec_b, spec_b, spec_b, spec_b, spec_b, P(), P())
    mapped = shard_map(shard_fn, mesh=mesh,
                       in_specs=(states_spec, spec_b),
                       out_specs=(states_spec, out_spec),
                       check_vma=False)
    return jax.jit(mapped)
