"""Eval corpus builder: sample clips from a library + apply degradations.

Mirrors the reference corpus builder's outputs (reference:
scripts/build_eval_corpus.py:46-639 — random clips, noise mixing at target
SNR, ground_truth.csv with clip/track_id/offset/type/environment columns)
without its ffmpeg dependency: clips are cut and degraded in NumPy from
the WAV blobs directly.

Degradation environments:
- clean: the raw slice;
- noisy: white noise mixed at a target SNR (default 10 dB; reference used
  anoisesrc+amix);
- browser: 0.7x gain + 16-bit requantization + mild lowpass, simulating
  the browser-capture path (reference recorded via MediaRecorder);
- negative: fresh synthetic audio absent from the library (FPR controls).

Usage:
    python scripts/build_eval_corpus.py --library <dir-with-wavs> \
        --out eval_corpus --clips 50 --clip-seconds 10
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_ident_tpu.service.audio import decode_wav  # noqa: E402
from audio_ident_tpu.utils.audio_synth import synth_audio, wav_bytes  # noqa: E402


def add_noise_snr(x: np.ndarray, snr_db: float, rng) -> np.ndarray:
    sig_pow = float(np.mean(x**2)) or 1e-12
    noise_pow = sig_pow / (10 ** (snr_db / 10))
    noise = rng.standard_normal(len(x)).astype(np.float32) * np.sqrt(noise_pow)
    out = x + noise
    peak = np.max(np.abs(out)) or 1.0
    return (out / max(peak, 1.0)).astype(np.float32)


def browser_degrade(x: np.ndarray) -> np.ndarray:
    y = 0.7 * x
    y = np.round(y * 32767.0) / 32767.0  # 16-bit requantization
    # mild 3-tap lowpass (codec-ish smoothing)
    y = np.convolve(y, np.array([0.25, 0.5, 0.25], np.float32), mode="same")
    return y.astype(np.float32)


def build_corpus(
    library: Path,
    out: Path,
    n_clips: int = 50,
    clip_seconds: float = 10.0,
    snr_db: float = 10.0,
    n_negatives: int = 10,
    seed: int = 0,
) -> Path:
    """Returns the ground-truth CSV path."""
    rng = np.random.default_rng(seed)
    wavs = sorted(library.rglob("*.wav"))
    if not wavs:
        raise SystemExit(f"no .wav files under {library}")
    out.mkdir(parents=True, exist_ok=True)
    rows = []
    sr = 16000

    for i in range(n_clips):
        src = wavs[int(rng.integers(len(wavs)))]
        d = decode_wav(src.read_bytes())
        pcm = d.pcm if d.sample_rate == sr else None
        if pcm is None:
            from audio_ident_tpu.service.state import resample_to_16k

            pcm = resample_to_16k(d.pcm, d.sample_rate)
        n = int(clip_seconds * sr)
        if len(pcm) <= n:
            offset = 0.0
            clip = pcm
        else:
            start = int(rng.integers(len(pcm) - n))
            offset = start / sr
            clip = pcm[start : start + n]
        env = ("clean", "noisy", "browser")[i % 3]
        if env == "noisy":
            clip = add_noise_snr(clip, snr_db, rng)
        elif env == "browser":
            clip = browser_degrade(clip)
        name = f"clip_{i:04d}_{env}.wav"
        (out / name).write_bytes(wav_bytes(clip, sr))
        # track_id column holds the SOURCE FILENAME STEM; eval maps it to
        # catalog ids by title (ingest titles files by stem)
        rows.append((name, src.stem, f"{offset:.3f}", "positive", env))

    for i in range(n_negatives):
        clip = synth_audio(np.random.default_rng(10_000 + seed * 997 + i), clip_seconds, sr)
        name = f"clip_neg_{i:04d}.wav"
        (out / name).write_bytes(wav_bytes(clip, sr))
        rows.append((name, "", "", "negative", "clean"))

    gt = out / "ground_truth.csv"
    with gt.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["clip", "source", "offset_sec", "type", "environment"])
        w.writerows(rows)
    print(f"wrote {len(rows)} clips -> {out}")
    return gt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--library", type=Path, required=True)
    ap.add_argument("--out", type=Path, default=Path("eval_corpus"))
    ap.add_argument("--clips", type=int, default=50)
    ap.add_argument("--clip-seconds", type=float, default=10.0)
    ap.add_argument("--snr-db", type=float, default=10.0)
    ap.add_argument("--negatives", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    build_corpus(
        args.library, args.out, args.clips, args.clip_seconds,
        args.snr_db, args.negatives, args.seed,
    )


if __name__ == "__main__":
    main()
