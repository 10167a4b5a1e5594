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
            if metrics.get("snr_curve_ci"):
                lines += [
                    "Accuracy vs SNR (top-1, pooled noise kinds, "
                    "Wilson 95% CI):", "",
                ]
                lines.append("| SNR | top-1 | n | 95% CI |")
                lines.append("|---|---|---|---|")
                for db, c in metrics["snr_curve_ci"].items():
                    lines.append(
                        f"| {db} | {c['rate']:.3f} | {c['n']} | "
                        f"[{c['ci95'][0]:.3f}, {c['ci95'][1]:.3f}] |"
                    )
                lines.append("")
            elif metrics.get("snr_curve"):
                lines += ["Accuracy vs SNR (top-1, pooled noise kinds):", ""]
                curve = metrics["snr_curve"]
                lines.append("| " + " | ".join(curve) + " |")
                lines.append("|" + "---|" * len(curve))
                lines.append(
                    "| " + " | ".join(f"{v:.3f}" for v in curve.values()) + " |"
                )
                lines.append("")
            env_ci = metrics.get("per_environment_ci")
            if env_ci:
                lines += ["Top-1 by environment (Wilson 95% CI):", ""]
                lines.append("| environment | top-1 | n | 95% CI |")
                lines.append("|---|---|---|---|")
                for env, c in env_ci.items():
                    lines.append(
                        f"| {env} | {c['rate']:.3f} | {c['n']} | "
                        f"[{c['ci95'][0]:.3f}, {c['ci95'][1]:.3f}] |"
                    )
                if metrics.get("top1_noisy_hard") is not None:
                    lines.append(
                        f"| top1_noisy_hard (diagnostic, <10 dB SNR) | "
                        f"{metrics['top1_noisy_hard']:.3f} | | |"
                    )
                lines.append("")
                # a cell whose CI UPPER bound sits below its category's
                # frozen target is a statistically-confirmed failure, not
                # sampling noise (r3 verdict item 2)
                cell_targets = {
                    "clean": 0.98, "mic": 0.75, "browser": 0.70,
                    "snr": 0.75,  # >=10 dB cells score the noisy target
                }
                confirmed_fails = []
                for env, c in env_ci.items():
                    if env.startswith("snr"):
                        db = int(env[3:].split("-")[0])
                        if db < 10:
                            continue  # noisy_hard is diagnostic-only
                        tgt = cell_targets["snr"]
                    else:
                        tgt = cell_targets.get(env.split("-")[0].split("@")[0])
                        if tgt is None:
                            tgt = cell_targets["browser"]  # codec cells
                    if c["ci95"][1] < tgt:
                        confirmed_fails.append((env, c, tgt))
                if confirmed_fails:
                    lines += ["**Cells failing with statistical confidence "
                              "(CI upper < target):**", ""]
                    for env, c, tgt in confirmed_fails:
                        lines.append(
                            f"- {env}: {c['rate']:.3f} "
                            f"(CI [{c['ci95'][0]:.3f}, {c['ci95'][1]:.3f}], "
                            f"n={c['n']}) vs target {tgt}"
                        )
                    lines.append("")
                else:
                    lines += ["No cell fails its target with statistical "
                              "confidence (every cell's CI upper bound "
                              "clears the target).", ""]
            elif metrics.get("per_environment"):
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
            if metrics.get("false_positive_rate_floor_list") is not None:
                lines += [
                    "Score-gap gate operating points (r3 verdict item 5): "
                    f"asserted-match FPR "
                    f"{metrics['false_positive_rate']:.4f} / top-5 "
                    f"{metrics.get('top5_overall', 0):.3f} with flagged "
                    "candidates counted (reference floor semantics); the "
                    "pre-r4 hard gate would have scored top-5 "
                    f"{metrics.get('top5_overall_asserted', 0):.3f} and the "
                    "reference's ungated floor list an FPR of "
                    f"{metrics['false_positive_rate_floor_list']:.4f} "
                    f"(n={metrics.get('num_negatives', '?')} negatives).",
                    "",
                ]
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
