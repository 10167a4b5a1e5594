"""Streaming identification: confirm-while-listening over a live feed
(BASELINE streaming config: sliding windows + carried vote state)."""

import numpy as np
import pytest

from audio_ident_tpu.cpu_reference.fingerprint import fingerprint_np
from audio_ident_tpu.index.match import DeviceIndex
from audio_ident_tpu.index.store import FingerprintIndex
from audio_ident_tpu.search.streaming import StreamingIdentifier

from tests.conftest import synth_audio

SR = 16000


@pytest.fixture(scope="module")
def library():
    idx = FingerprintIndex(max_tracks=1 << 12)
    audios = []
    for i in range(4):
        x = synth_audio(np.random.default_rng(880 + i), 30.0)
        audios.append(x)
        h, t, v = fingerprint_np(x)
        idx.add_track(f"00000000-0000-0000-0000-{i:012d}", h, t, v)
    idx.merge_delta()
    return DeviceIndex.from_host(idx), audios


def _feed(ident, audio, chunk_sec=0.5, start=0.0):
    """Feed audio in small chunks; return (report, consumed_sec)."""
    chunk = int(chunk_sec * SR)
    pos = int(start * SR)
    while pos < len(audio):
        r = ident.push(audio[pos : pos + chunk])
        pos += chunk
        if r is not None:
            return r, pos / SR
    return None, len(audio) / SR


def test_stream_identifies_track(library):
    di, audios = library
    ident = StreamingIdentifier(di)
    # stream track 2 starting from 7s into it
    report, consumed = _feed(ident, audios[2][7 * SR :])
    assert report is not None
    assert report.track_row == 2
    # confirmed early: well before the whole remaining 23s played
    assert consumed <= 12.0
    # offset = where the stream started inside the track
    assert abs(report.offset_seconds - 7.0) < 1.0
    assert 0 < report.confidence <= 1.0


def test_stream_foreign_audio_never_confirms(library):
    di, _ = library
    ident = StreamingIdentifier(di)
    foreign = synth_audio(np.random.default_rng(9999), 15.0)
    report, _ = _feed(ident, foreign)
    assert report is None


def test_stream_carried_score_decays_on_silence(library):
    di, audios = library
    ident = StreamingIdentifier(di)
    report, _ = _feed(ident, audios[1][: 12 * SR])
    assert report is not None and report.track_row == 1
    # now feed silence: the carried score must decay away
    for _ in range(8):
        ident.push(np.zeros(int(2.5 * SR), np.float32))
    assert ident._scores.get(1, 0) < 4


def test_stream_reset(library):
    di, audios = library
    ident = StreamingIdentifier(di)
    ident.push(audios[0][: 6 * SR])
    assert ident.position_sec > 0
    ident.reset()
    assert ident.position_sec == 0
    assert ident._scores == {}
