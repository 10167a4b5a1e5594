"""Evaluation support: degradations, lossy-codec round-trips, corpora.

The reference builds its eval corpus with ffmpeg (anoisesrc/amix noise
mixing, Opus/MP3 encode round-trips — reference:
scripts/build_eval_corpus.py:153-188) and targets 40-60% noisy top-1 as
the reality check (reference:
docs/research/01-initial-research/09-reality-check.md:173).  This package
provides the same degradations natively: calibrated-SNR noise in NumPy,
real codec round-trips via ffmpeg WHEN it is on PATH, and an MDCT-domain
lossy codec simulator for images without codec binaries — so the eval is
falsifiable everywhere it runs.
"""

from audio_ident_tpu.eval.codecs import codec_sim, ffmpeg_roundtrip, have_ffmpeg
from audio_ident_tpu.eval.degrade import (
    add_noise_snr,
    browser_capture_chain,
    make_noise,
    mic_capture_chain,
)

__all__ = [
    "add_noise_snr",
    "browser_capture_chain",
    "codec_sim",
    "ffmpeg_roundtrip",
    "have_ffmpeg",
    "make_noise",
    "mic_capture_chain",
]
