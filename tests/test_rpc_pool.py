"""Multi-session RPC: K pooled sessions over one server vs K solo servers.

The reference's embedding surface is one uniffi engine per process (ref
src/audio_io/mod.rs:960-1129); the RPC server goes beyond it with
session.create / pool.join so K live sessions share one chip, each slot
wave running as ONE batched device dispatch (api/pool.py).  Parity bar:
every session's poll surfaces must return exactly what a dedicated
single-session server returns for the same pushed audio and the same
virtual-time schedule.
"""

import base64
import json

import numpy as np

from audio_analyzer_rs_tpu.api.rpc import RpcServer
from audio_analyzer_rs_tpu.models import generators as gen

SR = 48000.0


def call(server, method, *params, session=None):
    req = {"id": 1, "method": method, "params": list(params)}
    if session is not None:
        req["session"] = session
    resp = server.handle(req)
    assert "error" not in resp, resp
    return resp["result"]


def b64(x):
    return base64.b64encode(np.asarray(x, np.float32).astype("<f4")
                            .tobytes()).decode()


def _drive_solo(audio, schedule):
    """One dedicated server (the single-engine reference scenario —
    synchronous: depth 0 / no aggregation, results visible per slot)."""
    s = RpcServer(loopback_latency_samples=2048, loopback_gain=1.0)
    call(s, "push_audio", b64(audio))
    call(s, "start_tuner")
    call(s, "start_onset_detection")
    onsets = []
    for dt in schedule:
        call(s, "advance", dt)
        onsets.extend(call(s, "poll_onsets"))
    call(s, "flush_analysis")
    onsets.extend(call(s, "poll_onsets"))
    return call(s, "poll_output"), onsets


def test_pooled_sessions_match_solo_servers():
    """3 sessions pooled on one server == 3 dedicated servers: same onset
    event streams (stamping is absolute-sample-time, so deferred wave
    readback changes visibility, not content) and same final tuner reading
    after flush."""
    scenes = [gen.mixed_scene(3.5, SR, seed=s) for s in (11, 23, 42)]
    schedule = [0.25] * 12   # 3.0 s in lockstep steps

    hub = RpcServer(loopback_latency_samples=2048, loopback_gain=1.0)
    sids = [0]
    for _ in range(2):
        sids.append(call(hub, "session.create",
                         {"loopback_latency_samples": 2048,
                          "loopback_gain": 1.0}))
    assert call(hub, "session.list") == sorted(sids)
    for sid, scene in zip(sids, scenes):
        call(hub, "push_audio", b64(scene), session=sid)
        call(hub, "start_tuner", session=sid)
        call(hub, "start_onset_detection", session=sid)
    got = call(hub, "pool.join", {"pipeline_depth": 1, "aggregate_slots": 2})
    assert got == {"k": 3}

    pooled_onsets = {sid: [] for sid in sids}
    for dt in schedule:
        call(hub, "advance", dt)   # lockstep: advances every session
        for sid in sids:
            pooled_onsets[sid].extend(call(hub, "poll_onsets", session=sid))
    call(hub, "pool.flush")
    for sid in sids:
        pooled_onsets[sid].extend(call(hub, "poll_onsets", session=sid))
    stats = call(hub, "pool.stats")
    assert stats["k"] == 3 and stats["waves"] > 0

    any_events = False
    for sid, scene in zip(sids, scenes):
        solo_out, solo_onsets = _drive_solo(scene, schedule)
        assert pooled_onsets[sid] == solo_onsets, f"session {sid}"
        assert call(hub, "poll_output", session=sid) == solo_out, \
            f"session {sid}"
        any_events = any_events or len(solo_onsets) > 0
    assert any_events   # the parity above must not be vacuous


def test_session_close_and_errors():
    hub = RpcServer()
    sid = call(hub, "session.create")
    call(hub, "push_audio",
         b64(gen.tone_with_harmonics(220.0, 1.2, SR, harmonics=6,
                                     amplitude=0.3)), session=sid)
    call(hub, "start_tuner", session=sid)
    call(hub, "advance", 1.0, session=sid)   # no pool: per-session time
    assert "A3" in call(hub, "poll_output", session=sid)["notes"]
    # Unknown session and closing session 0 are errors, not crashes.
    assert "unknown session" in hub.handle(
        {"id": 1, "method": "poll_transport", "session": 99})["error"]
    assert "cannot be closed" in hub.handle(
        {"id": 1, "method": "session.close"})["error"]
    call(hub, "session.close", session=sid)
    assert call(hub, "session.list") == [0]
    # configure is a fresh-single-session affair.
    call(hub, "session.create")
    assert "session.create" in hub.handle(
        {"id": 1, "method": "configure", "params": [{}]})["error"]


def test_pool_join_leave_midstream():
    """Sessions can pool and unpool mid-stream; results keep flowing."""
    hub = RpcServer()
    sid = call(hub, "session.create")
    tone = gen.tone_with_harmonics(330.0, 3.0, SR, harmonics=6,
                                   amplitude=0.3)
    for s in (0, sid):
        call(hub, "push_audio", b64(tone), session=s)
        call(hub, "start_tuner", session=s)
    call(hub, "advance", 0.5)            # un-pooled: session 0 alone
    call(hub, "advance", 0.5, session=sid)
    call(hub, "pool.join", {"aggregate_slots": 2})
    call(hub, "advance", 1.0)            # pooled: lockstep
    assert call(hub, "pool.leave") is True
    call(hub, "advance", 0.5)            # back to per-session time
    call(hub, "advance", 0.5, session=sid)
    for s in (0, sid):
        assert "E4" in call(hub, "poll_output", session=s)["notes"]
