"""Checkpoint / resume of streaming analyzer state.

The reference has no checkpointing (SURVEY §5: "Sessions are ephemeral") —
only per-component pause/resume.  For a production serving framework,
long-running streaming analyses must survive process restarts, so this
module snapshots the full carried state of the streaming analyzers
(noise-floor scan carry, tracker slots, onset detector state, reducer and
AGC histories, transport position, ring-buffer tails) to a single `.npz`
and restores it bit-exactly.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax
import numpy as np

from .models.analyzer import OnsetAnalyzer, PitchAnalyzer
from .ops import noisefloor, onset as onset_ops, tracker
from .transport import MusicalTransport


def _flatten(prefix: str, tree) -> Dict[str, np.ndarray]:
    leaves = jax.tree.leaves(tree)
    return {f"{prefix}{i}": np.asarray(v) for i, v in enumerate(leaves)}


def _unflatten(prefix: str, template, data) -> Any:
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = [np.asarray(data[f"{prefix}{i}"]) for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)


def save_pitch_analyzer(path: str, analyzer: PitchAnalyzer) -> None:
    arrays = _flatten("nf_", analyzer.nf_state)
    arrays.update(_flatten("tr_", analyzer.tr_state))
    arrays["tail"] = analyzer._tail
    arrays["meta"] = np.frombuffer(json.dumps({
        "sample_rate": analyzer.sample_rate, "window": analyzer.window,
        "hop": analyzer.hop, "backend": analyzer.backend,
        "frames_consumed": analyzer.frames_consumed,
    }).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_pitch_analyzer(path: str) -> PitchAnalyzer:
    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    an = PitchAnalyzer(meta["sample_rate"], window=meta["window"],
                       hop=meta["hop"], backend=meta["backend"])
    an.nf_state = _unflatten(
        "nf_", noisefloor.init_state(meta["window"] // 2 + 1), data)
    an.tr_state = _unflatten("tr_", tracker.init_state(), data)
    an._tail = np.asarray(data["tail"])
    an.frames_consumed = meta["frames_consumed"]
    return an


def save_onset_analyzer(path: str, analyzer: OnsetAnalyzer) -> None:
    arrays = _flatten("on_", analyzer.state)
    arrays["tail"] = analyzer._tail
    arrays["meta"] = np.frombuffer(json.dumps({
        "sample_rate": analyzer.sample_rate, "window": analyzer.window,
        "hop": analyzer.hop, "backend": analyzer.backend,
        "frames_consumed": analyzer.frames_consumed,
    }).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_onset_analyzer(path: str) -> OnsetAnalyzer:
    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    an = OnsetAnalyzer(meta["sample_rate"], window=meta["window"],
                       hop=meta["hop"], backend=meta["backend"])
    an.state = _unflatten(
        "on_", onset_ops.init_state(meta["window"] // 2 + 1), data)
    an._tail = np.asarray(data["tail"])
    an.frames_consumed = meta["frames_consumed"]
    return an


def save_transport(path: str, t: MusicalTransport) -> None:
    state = {
        "output_frames": t.output_frames,
        "input_frames": t.input_frames,
        "last_tick_output_frame": t.last_tick_output_frame,
        "tick_history_beats": t._tick_history_beats,
        "tick_history_count": t._tick_history_count,
        "bpm": t._bpm,
        "accumulated_beats": t._accumulated_beats,
        "is_playing": t._is_playing,
        "output_latency_samples": t._output_latency_samples,
        "input_latency_samples": t._input_latency_samples,
        "calibration_offset_samples": t._calibration_offset_samples,
        "calibration_done": t._calibration_done,
        "ui_latency_s": t._ui_latency_s,
        "sample_rate": t._sample_rate,
    }
    with open(path, "w") as f:
        json.dump(state, f)


def load_transport(path: str) -> MusicalTransport:
    with open(path) as f:
        s = json.load(f)
    t = MusicalTransport(s["bpm"], s["sample_rate"])
    t.output_frames = s["output_frames"]
    t.input_frames = s["input_frames"]
    t.last_tick_output_frame = s["last_tick_output_frame"]
    t._tick_history_beats = [float(x) for x in s["tick_history_beats"]]
    t._tick_history_count = s["tick_history_count"]
    t._accumulated_beats = s["accumulated_beats"]
    t._is_playing = s["is_playing"]
    t._output_latency_samples = s["output_latency_samples"]
    t._input_latency_samples = s["input_latency_samples"]
    t._calibration_offset_samples = s["calibration_offset_samples"]
    t._calibration_done = s["calibration_done"]
    t._ui_latency_s = s["ui_latency_s"]
    return t
