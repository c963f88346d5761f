"""JSON-RPC embedding surface tests (the uniffi-analog process boundary)."""

import base64
import io
import json

import numpy as np

from audio_analyzer_rs_tpu.api.rpc import RpcServer
from audio_analyzer_rs_tpu.models import generators as gen

SR = 48000.0


def call(server, method, *params):
    resp = server.handle({"id": 1, "method": method, "params": list(params)})
    assert "error" not in resp, resp
    return resp["result"]


def test_rpc_tuner_flow():
    s = RpcServer()
    tone = gen.tone_with_harmonics(220.0, 1.2, SR, harmonics=6, amplitude=0.3)
    call(s, "push_audio",
         base64.b64encode(tone.astype("<f4").tobytes()).decode())
    call(s, "start_tuner")
    call(s, "tuner.set_base_freq", 440.0)
    call(s, "advance", 1.0)
    out = call(s, "poll_output")
    assert "A3" in out["notes"], out
    dyn = call(s, "poll_dynamics")
    assert dyn["level"] in ("mf", "f", "mp", "p")


def test_rpc_configure_device_format():
    """An embedding host declares its device format before starting streams
    (the cpal-probing analog, ref mod.rs:121-128)."""
    s = RpcServer()
    rate = 22050.0
    got = call(s, "configure", {"sample_rate": rate, "buffer_size": 512})
    assert got == {"sample_rate": rate, "buffer_size": 512}
    tone = gen.tone_with_harmonics(220.0, 1.2, rate, harmonics=6, amplitude=0.3)
    call(s, "push_audio",
         base64.b64encode(tone.astype("<f4").tobytes()).decode())
    call(s, "start_tuner")
    call(s, "advance", 1.0)
    assert "A3" in call(s, "poll_output")["notes"]
    # Reconfiguring after audio has flowed must be refused.
    resp = s.handle({"id": 3, "method": "configure",
                     "params": [{"sample_rate": 48000.0}]})
    assert "must precede" in resp["error"]


def test_rpc_metronome_and_transport():
    s = RpcServer()
    call(s, "create_metronome", 120.0, [3, 1, 1, 1], [], 1.0, False)
    call(s, "metronome.set_volume", 0.5)
    call(s, "advance", 1.0)
    snap = call(s, "poll_transport")
    assert snap["is_playing"] is True
    assert abs(snap["beat_position"] - 2.0) < 0.1


def test_rpc_errors_surface():
    s = RpcServer()
    call(s, "start_tuner")
    resp = s.handle({"id": 7, "method": "start_tuner", "params": []})
    assert "Already active" in resp["error"]
    resp = s.handle({"id": 8, "method": "nope", "params": []})
    assert "unknown method" in resp["error"]


def test_tcp_transport_round_trip():
    """The TCP transport serves the same line protocol as stdio: connect,
    ping, create a metronome, quit — then the server accepts the next
    client (session-per-connection like the uniffi object graph)."""
    import socket
    import threading
    import time

    server = RpcServer()
    t = threading.Thread(target=server.serve_tcp,
                         kwargs=dict(max_clients=2), daemon=True)
    t.start()
    deadline = time.time() + 10
    while not hasattr(server, "tcp_port") and time.time() < deadline:
        time.sleep(0.01)

    def session(reqs):
        out = []
        with socket.create_connection(("127.0.0.1", server.tcp_port),
                                      timeout=10) as s:
            f = s.makefile("rw", encoding="utf-8")
            for r in reqs:
                f.write(json.dumps(r) + "\n")
                f.flush()
                out.append(json.loads(f.readline()))
            f.write("quit\n")
            f.flush()
        return out

    r1 = session([{"id": 1, "method": "ping", "params": []},
                  {"id": 2, "method": "create_metronome",
                   "params": [120.0, [3, 1, 1, 1], [], 1.0, False]}])
    assert r1[0] == {"id": 1, "result": "pong"}
    assert r1[1] == {"id": 2, "result": True}
    # Second client: a fresh connection is accepted; the engine state
    # persists (metronome still active -> double create errors).
    r2 = session([{"id": 1, "method": "create_metronome",
                   "params": [120.0, [3, 1, 1, 1], [], 1.0, False]}])
    assert "Already active" in r2[0]["error"]
    t.join(timeout=10)
    assert not t.is_alive()


def test_c_client_spawn_failure_reported():
    """engine_client_spawn must return NULL when the interpreter can't be
    exec'd (detected via a CLOEXEC status pipe), not a client that fails
    confusingly on first use."""
    import os
    import shutil
    import subprocess
    import tempfile

    if shutil.which("cc") is None:
        pytest.skip("no C compiler")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rt = os.path.join(repo, "runtime")
    src = r'''
#include "engine_client.h"
#include <stdio.h>
int main(void) {
    EngineClient* c = engine_client_spawn("/nonexistent-python-exe", ".");
    if (c) { fprintf(stderr, "spawn unexpectedly succeeded\n"); return 1; }
    puts("spawn correctly failed");
    return 0;
}
'''
    with tempfile.TemporaryDirectory() as td:
        cpath = os.path.join(td, "t.c")
        with open(cpath, "w") as f:
            f.write(src)
        exe = os.path.join(td, "t")
        subprocess.run(["cc", "-I", rt, "-o", exe, cpath,
                        os.path.join(rt, "engine_client.c")],
                       check=True, capture_output=True, timeout=60)
        proc = subprocess.run([exe], capture_output=True, text=True,
                              timeout=30)
        assert proc.returncode == 0, (proc.stdout, proc.stderr)
        assert "spawn correctly failed" in proc.stdout


def test_c_embedding_client():
    """Build and run the C embedding client demo (the uniffi-bindgen
    analog): C synthesizes a tone, pushes it over the RPC boundary, and the
    tuner must hear A3; double-start must surface 'Already active'.  The
    demo then drives the MULTI-SESSION surface from C — session.create,
    per-session pushes/polls, pool.join — and exits 0 only if each pooled
    session heard its own tone through genuinely batched waves
    (pool.stats waves > 0), mirroring
    tests/test_rpc_pool.py::test_pooled_sessions_match_solo_servers
    across the language boundary."""
    import os
    import shutil
    import subprocess

    if shutil.which("cc") is None:
        pytest.skip("no C compiler")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rt = os.path.join(repo, "runtime")
    subprocess.run(["make", "-C", rt, "client"], check=True,
                   capture_output=True, timeout=120)
    env = dict(os.environ)
    # The engine child must run analyzers on CPU inside the test env: drop
    # any site hooks that pin a remote backend and select cpu explicitly.
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([os.path.join(rt, "engine_client_demo"), repo],
                          capture_output=True, text=True, timeout=600,
                          env=env)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert '"pong"' in proc.stdout
    assert "A3" in proc.stdout
    assert "Already active" in proc.stdout
    # Multi-session half: second session pooled with session 0, each
    # hearing its own tone over batched waves.
    assert "session.create -> 1" in proc.stdout
    assert "pool.join -> k=2" in proc.stdout
    assert "E4" in proc.stdout
    assert '"waves": 0' not in proc.stdout


def test_rpc_stdio_roundtrip():
    s = RpcServer()
    stdin = io.StringIO(
        json.dumps({"id": 1, "method": "ping", "params": []}) + "\n"
        + "not json\n"
        + json.dumps({"id": 2, "method": "poll_transport", "params": []}) + "\n"
        + "quit\n")
    stdout = io.StringIO()
    s.serve_stdio(stdin=stdin, stdout=stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert lines[0] == {"id": 1, "result": "pong"}
    assert "bad json" in lines[1]["error"]
    assert lines[2]["result"]["beat_position"] == 0.0
