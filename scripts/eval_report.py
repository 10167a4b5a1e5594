"""Merge eval metric JSONs into a go / conditional-go / no-go report.

Mirrors the reference's report generator (reference:
scripts/eval_report.py:55-602): canonical thresholds per lane, a NO-GO
floor below which shipping is blocked, and a markdown summary.

Usage:
    python scripts/eval_report.py --exact exact.json [--vibe vibe.json]
        [--latency latency.json] [--out EVAL_REPORT.md]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

# canonical FROZEN thresholds — name-for-name the reference's set
# (reference: eval_report.py:55-63); mic is scored on mic clips only
EXACT_TARGETS = {
    "top1_clean": (0.98, "min"),
    "top1_mic": (0.75, "min"),
    "top1_browser": (0.70, "min"),
    "top5_mic": (0.85, "min"),
    "median_offset_error_sec": (0.5, "max"),
    "false_positive_rate": (0.02, "max"),
}
# our additional (harder) targets: the corpus sweeps SNR 20->0 dB over
# three noise kinds where the reference mixed white noise at 20 dB only
EXACT_EXTRA_TARGETS = {
    "top1_noisy": (0.75, "min"),
    "top5_overall": (0.85, "min"),
}
VIBE_TARGETS = {"mrr": (0.5, "min"), "ndcg_at_5": (0.6, "min")}
LATENCY_TARGETS = {
    "p50_ms": (3000.0, "max"),
    "p95_ms": (5000.0, "max"),
    "p99_ms": (8000.0, "max"),
}
# NO-GO floor (reference: eval_report.py:77-80)
NO_GO = {"top1_clean": 0.90, "false_positive_rate": 0.10}


def _eval_section(name: str, metrics: dict | None, targets: dict) -> tuple[list[str], int, int]:
    lines = [f"## {name}", ""]
    if metrics is None:
        lines += ["_not run_", ""]
        return lines, 0, 0
    passed = failed = 0
    lines.append("| metric | value | target | status |")
    lines.append("|---|---|---|---|")
    for key, (target, kind) in targets.items():
        got = metrics.get(key)
        if got is None:
            lines.append(f"| {key} | — | {target} | skipped |")
            continue
        ok = got >= target if kind == "min" else got <= target
        passed += ok
        failed += not ok
        sign = ">=" if kind == "min" else "<="
        lines.append(
            f"| {key} | {got:.3f} | {sign} {target} | {'PASS' if ok else 'FAIL'} |"
        )
    lines.append("")
    return lines, passed, failed


def build_report(exact: dict | None, vibe: dict | None, latency: dict | None) -> str:
    lines = ["# Evaluation Report", ""]
    if exact:
        lines += [
            f"Library: **{exact.get('num_tracks', '?')} tracks**; "
            f"corpus: **{exact.get('num_queries', '?')} clips** "
            "(clean / SNR sweep 20-0 dB over white-pink-babble noise / codec "
            "round-trips / browser + mic capture chains / degraded negatives).",
            "",
        ]
    total_pass = total_fail = 0
    for name, metrics, targets in [
        ("Exact lane (frozen targets)", exact, EXACT_TARGETS),
        ("Exact lane (our harder additions)", exact, EXACT_EXTRA_TARGETS),
        ("Vibe lane", vibe, VIBE_TARGETS),
        ("Latency (HTTP)", latency, LATENCY_TARGETS),
    ]:
        sec, p, f = _eval_section(name, metrics, targets)
        lines += sec
        if name == "Exact lane (our harder additions)" and metrics:
            if metrics.get("snr_curve"):
                lines += ["Accuracy vs SNR (top-1, pooled noise kinds):", ""]
                curve = metrics["snr_curve"]
                lines.append("| " + " | ".join(curve) + " |")
                lines.append("|" + "---|" * len(curve))
                lines.append(
                    "| " + " | ".join(f"{v:.3f}" for v in curve.values()) + " |"
                )
                lines.append("")
            if metrics.get("per_environment"):
                lines += ["Top-1 by environment:", ""]
                lines.append("| environment | top-1 |")
                lines.append("|---|---|")
                for env, v in metrics["per_environment"].items():
                    lines.append(f"| {env} | {v:.3f} |")
                if metrics.get("top1_noisy_hard") is not None:
                    lines.append(
                        f"| top1_noisy_hard (diagnostic, <10 dB SNR) | "
                        f"{metrics['top1_noisy_hard']:.3f} |"
                    )
                lines.append("")
        if name == "Vibe lane" and metrics and metrics.get("provenance"):
            lines += [f"Provenance: {metrics['provenance']}", ""]
        total_pass += p
        total_fail += f

    no_go = False
    if exact:
        for key, floor in NO_GO.items():
            got = exact.get(key)
            if got is None:
                continue
            if key == "false_positive_rate":
                no_go |= got > floor
            else:
                no_go |= got < floor

    if no_go:
        verdict = "NO-GO"
    elif total_fail == 0:
        verdict = "GO"
    else:
        verdict = "CONDITIONAL-GO"
    lines += [f"## Verdict: **{verdict}**", "",
              f"{total_pass} targets passed, {total_fail} failed."]
    return "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exact", type=Path, default=None)
    ap.add_argument("--vibe", type=Path, default=None)
    ap.add_argument("--latency", type=Path, default=None)
    ap.add_argument("--out", type=Path, default=Path("EVAL_REPORT.md"))
    args = ap.parse_args()

    def load(p):
        return json.loads(p.read_text()) if p and p.exists() else None

    report = build_report(load(args.exact), load(args.vibe), load(args.latency))
    args.out.write_text(report)
    print(report)
    if "NO-GO" in report.splitlines()[-3]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
