"""Pallas batched tracker scan vs the XLA scan (interpret mode on CPU).

The kernel (ops/pallas_tracker.py) must make identical DECISIONS to
vmap(tracker_scan): same greedy first-in-creation-order matching, same
rank-matched spawning, same reap/decay — across random polyphonic streams
with onsets, track churn, and slot exhaustion pressure.  Track frequency
VALUES are compared to 1 ulp: the EMA blend `f*0.6 + raw*0.4` is one
mul+mul+add whose FMA contraction XLA chooses independently per program,
so the two compilations may round the last bit differently (scores are
raw copies — exact; all integer/boolean state is exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_analyzer_rs_tpu.ops import tracker


def _assert_outputs_match(out_a, out_b):
    fa, sa, va = (np.asarray(x) for x in out_a)
    fb, sb, vb = (np.asarray(x) for x in out_b)
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(sa, sb)
    np.testing.assert_allclose(fa, fb, rtol=3e-7, atol=0)


def _assert_states_match(st_a, st_b):
    np.testing.assert_allclose(np.asarray(st_a.freq), np.asarray(st_b.freq),
                               rtol=3e-7, atol=0)
    for leaf in ("score", "life", "valid", "seq", "next_seq"):
        np.testing.assert_array_equal(np.asarray(getattr(st_a, leaf)),
                                      np.asarray(getattr(st_b, leaf)),
                                      err_msg=leaf)


def _random_raws(rng, s, n):
    rf = rng.uniform(50.0, 2000.0, (s, n, 8)).astype(np.float32)
    # Make consecutive frames often match (within 3% tolerance) so tracks
    # mature past the display threshold.
    for i in range(1, n):
        keep = rng.random((s, 8)) < 0.7
        rf[:, i] = np.where(keep, rf[:, i - 1] * (1 + rng.normal(
            0, 0.01, (s, 8)).astype(np.float32)), rf[:, i])
    rs = rng.uniform(0.1, 5.0, (s, n, 8)).astype(np.float32)
    rv = rng.random((s, n, 8)) < 0.6
    on = rng.random((s, n)) < 0.08
    return (jnp.asarray(rf), jnp.asarray(rs), jnp.asarray(rv),
            jnp.asarray(on))


def _init_states(s):
    return jax.vmap(lambda _: tracker.init_state())(jnp.arange(s))


@pytest.mark.parametrize("s,n", [(3, 40), (8, 17)])
def test_pallas_tracker_matches_xla(s, n):
    rng = np.random.default_rng(11)
    rf, rs, rv, on = _random_raws(rng, s, n)
    st = _init_states(s)

    st_x, out_x = tracker.tracker_scan_batched(st, rf, rs, rv, on,
                                               impl="xla")
    st_p, out_p = tracker.tracker_scan_batched(st, rf, rs, rv, on,
                                               impl="pallas_interpret")
    _assert_outputs_match(out_p, out_x)
    _assert_states_match(st_p, st_x)


def test_pallas_tracker_state_carry_across_calls():
    """Two chained calls (state threaded) must equal one call over the
    concatenated frames — the kernel's final-state writeback is the scan
    carry."""
    rng = np.random.default_rng(3)
    s, n = 4, 24
    rf, rs, rv, on = _random_raws(rng, s, 2 * n)
    st = _init_states(s)

    st_a, out_a = tracker.tracker_scan_batched(
        st, rf[:, :n], rs[:, :n], rv[:, :n], on[:, :n],
        impl="pallas_interpret")
    st_b, out_b = tracker.tracker_scan_batched(
        st_a, rf[:, n:], rs[:, n:], rv[:, n:], on[:, n:],
        impl="pallas_interpret")
    st_full, out_full = tracker.tracker_scan_batched(
        st, rf, rs, rv, on, impl="pallas_interpret")
    joined = tuple(
        np.concatenate([np.asarray(a), np.asarray(b)], axis=1)
        for a, b in zip(out_a, out_b))
    _assert_outputs_match(joined, tuple(np.asarray(x) for x in out_full))
    _assert_states_match(st_b, st_full)
