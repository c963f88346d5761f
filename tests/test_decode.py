"""Native multi-format decode (the symphonia analog, runtime/audio_decode.cpp).

Fixtures are fabricated with the module's own encoder so no CLI tools or
binary test assets are needed.
"""

import numpy as np
import pytest

from audio_analyzer_rs_tpu import runtime
from audio_analyzer_rs_tpu.models import generators as gen
from audio_analyzer_rs_tpu.models.player import AudioPlayer

SR = 44100.0

pytestmark = pytest.mark.skipif(not runtime.decode_available(),
                                reason="FFmpeg libs not present")


@pytest.fixture(scope="module")
def tone():
    return gen.tone_with_harmonics(440.0, 1.0, SR, harmonics=4, amplitude=0.4)


def test_flac_roundtrip_lossless(tmp_path, tone):
    path = str(tmp_path / "t.flac")
    runtime.encode_file(path, tone, SR)
    dec, rate = runtime.decode_file(path)
    assert rate == SR
    assert len(dec) == len(tone)
    # FLAC is integer-lossless; the float source survives to within one
    # quantization step of the deepest integer format the encoder offers
    # (s32 preferred, s16 floor).
    np.testing.assert_allclose(dec, tone, atol=2.0 ** -15)


@pytest.mark.parametrize("ext,tol,pad", [("ogg", 0.1, 256), ("mp3", 0.1, 0)])
def test_lossy_roundtrip(tmp_path, tone, ext, tol, pad):
    path = str(tmp_path / f"t.{ext}")
    try:
        runtime.encode_file(path, tone, SR)
    except ValueError as exc:
        pytest.skip(f"no {ext} encoder in this FFmpeg build: {exc}")
    dec, rate = runtime.decode_file(path)
    assert rate == SR
    assert abs(len(dec) - len(tone)) <= pad
    n = min(len(dec), len(tone))
    # Skip codec priming samples; compare the strongly-correlated interior.
    assert np.abs(dec[1024:n - 1024] - tone[1024:n - 1024]).max() < tol


def test_decode_error_message(tmp_path):
    bad = tmp_path / "junk.mp3"
    bad.write_bytes(b"this is not audio" * 100)
    with pytest.raises(ValueError, match="decode failed"):
        runtime.decode_file(str(bad))
    with pytest.raises(ValueError, match="decode failed"):
        runtime.decode_file(str(tmp_path / "missing.flac"))


def test_player_loads_flac(tmp_path, tone):
    path = str(tmp_path / "t.flac")
    runtime.encode_file(path, tone, SR)
    p = AudioPlayer(system_sample_rate=SR)
    p.load_file(path)
    p.send("Play")
    buf = np.zeros(4096 * 2, np.float32)
    p.process(buf, channels=2)
    # Stereo interleave of the mono decode, resample ratio 1.0.
    np.testing.assert_allclose(buf.reshape(-1, 2)[:, 0], tone[:4096],
                               atol=2.0 ** -15)


def test_recording_to_flac(tmp_path, tone):
    """Recording with a non-.wav extension buffers and encodes on stop."""
    from audio_analyzer_rs_tpu.api.device import ArraySource
    from audio_analyzer_rs_tpu.api.engine import AudioEngine, AudioEngineError

    e = AudioEngine(input_source=ArraySource(tone), sample_rate=SR)
    rec = e.start_recording(str(tmp_path / "take.flac"))
    e.advance(0.5)
    e.stop_recording()
    dec, rate = runtime.decode_file(str(tmp_path / "take.flac"))
    assert rate == SR
    # Whole buffers only: advance(0.5) at 44.1k/1024 = 21 slots.
    assert len(dec) == (int(0.5 * SR) // 1024) * 1024
    # The recorder taps the conditioned (reducer+AGC) stream; correlation
    # with the raw source stays near 1 even though the gain differs.
    n = min(len(dec), len(tone))
    assert np.corrcoef(dec[:n], tone[:n])[0, 1] > 0.98

    with pytest.raises(AudioEngineError, match="no encoder"):
        e.start_recording(str(tmp_path / "take.bogusext"))


def test_cli_loader_decodes_flac(tmp_path, tone):
    from audio_analyzer_rs_tpu.cli import _load_mono
    path = str(tmp_path / "t.flac")
    runtime.encode_file(path, tone, SR)
    audio, sr = _load_mono(path)
    assert sr == SR
    np.testing.assert_allclose(audio, tone, atol=2.0 ** -15)
