#!/usr/bin/env python
"""Regenerate results/README.md: one table row per committed artifact.

Keeps the measurement story auditable — every number cited in
README/PARITY/PERF should trace to a JSON this index lists.

`--check` regenerates nothing: it exits non-zero if the committed
results/README.md differs from what this script would write (doc-artifact
drift gate, wired into the fast test tier via tests/test_cli.py).
"""

from __future__ import annotations

import json
import os
import sys

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results")


def _fmt(v: object) -> str:
    if isinstance(v, float):
        return f"{v:,.4g}"
    return str(v)


def _count_errors(obj: object) -> tuple[int, int]:
    """Count (error, null) entries anywhere in a result artifact. An
    {'error': ...} record means a measurement FAILED (infra/crash) — the
    artifact is broken and must not be indexed as 'N measurements'
    (round-3 batch_sweep.json lesson). A None is a deliberately recorded
    not-applicable/didn't-fit datapoint (e.g. a tuning sweep's OOM block
    size) — informative, marked but not broken."""
    n_err = n_null = 0
    if isinstance(obj, dict):
        for k, v in obj.items():
            # an error record carries a message string; numeric *_error keys
            # are metrics (e.g. max_roundtrip_error)
            if (k == "error" or k.endswith("_error")) and isinstance(v, str) and v:
                n_err += 1
            else:
                e, u = _count_errors(v)
                n_err += e
                n_null += u
    elif isinstance(obj, list):
        for v in obj:
            e, u = _count_errors(v)
            n_err += e
            n_null += u
    elif obj is None:
        n_null += 1
    return n_err, n_null


def render() -> tuple[str, dict]:
    """Build the README.md content; returns (text, stats)."""
    lines = [
        "# Results index",
        "",
        "Every committed measurement artifact, with its headline numbers.",
        "Regenerate with `python scripts/summarize_results.py`.",
        "",
    ]

    parity, evals, benches, hpo = [], [], [], []
    for name in sorted(os.listdir(RESULTS)):
        path = os.path.join(RESULTS, name)
        if os.path.isdir(path):
            rp = os.path.join(path, "report.json")
            hp = os.path.join(path, "best.json")
            if os.path.exists(rp):
                evals.append((name, json.load(open(rp))))
            elif os.path.exists(hp):
                hpo.append((name, json.load(open(hp))))
            continue
        if not name.endswith(".json"):
            continue
        data = json.load(open(path))
        if name.startswith("parity_"):
            parity.append((name, data))
        else:
            benches.append((name, data))

    if parity:
        lines += ["## Parity runs (`scripts/parity_run.py`, `scripts/video_parity.py`)", "",
                  "| artifact | test NLL | reference test NLL | stop | epochs |",
                  "|---|---|---|---|---|"]
        for name, d in parity:
            ref = d.get("reference_train_val_test")
            lines.append(
                f"| `{name}` | {_fmt(d.get('test_nll'))} | "
                f"{_fmt(ref[2]) if ref else '—'} | {d.get('stop_reason', '—')} | "
                f"{d.get('epochs', '—')} |"
            )
        lines.append("")

    if evals:
        lines += ["## Evaluation reports (`bcnf-tpu eval`)", "",
                  "| artifact | test NLL | max scaled CDF residual (non-degenerate) | "
                  "resim median MSE | impact median dist |",
                  "|---|---|---|---|---|"]
        for name, d in evals:
            lines.append(
                f"| `{name}/` | {_fmt(d.get('test_nll'))} | "
                f"{_fmt(d.get('max_scaled_cdf_residual'))} | "
                f"{_fmt(d.get('resim_median_mse_mean', '—'))} | "
                f"{_fmt(d.get('impact_median_dist', '—'))} |"
            )
        lines.append("")

    if hpo:
        lines += ["## Hyperparameter searches (`bcnf-tpu hpo`)", "",
                  "| artifact | evaluations | best CV val loss | best point |",
                  "|---|---|---|---|"]
        for name, d in hpo:
            best = d.get("best_params", {})
            best_str = ", ".join(f"{k}={_fmt(v)}" for k, v in best.items())
            lines.append(
                f"| `{name}/` | {d.get('n_evaluations', '—')} | "
                f"{_fmt(d.get('best_val_loss'))} | {best_str} |"
            )
        lines.append("")

    broken = []
    if benches:
        lines += ["## Benchmarks & measurements", "",
                  "| artifact | summary |", "|---|---|"]
        for name, d in benches:
            keys = [k for k in ("train_samples_per_sec", "results", "samples_per_s",
                                "rows_per_s", "what") if k in d]
            if "train_samples_per_sec" in d:
                summary = f"{_fmt(d['train_samples_per_sec'])} train samples/s"
            elif keys and isinstance(d.get(keys[0]), dict):
                inner = d[keys[0]]
                n_err, n_null = _count_errors(inner)
                n_ok = len(inner) - n_err - n_null
                summary = f"{n_ok} measurements ({', '.join(list(inner)[:4])}, ...)"
                if n_null:
                    summary += f" + {n_null} recorded as not-run/didn't-fit"
                if n_err:
                    summary += f" — **{n_err} ERROR entries**"
                    broken.append(name)
            else:
                summary = d.get("what", f"{len(d)} fields")[:90]
                n_err, _ = _count_errors(d)
                if n_err:
                    summary += f" — **{n_err} ERROR entries**"
                    broken.append(name)
            lines.append(f"| `{name}` | {summary} |")
        lines.append("")
        if broken:
            lines += [f"**BROKEN ARTIFACTS (re-measure before citing):** "
                      f"{', '.join(f'`{b}`' for b in broken)}", ""]

    stats = {"parity": len(parity), "evals": len(evals), "benches": len(benches),
             "hpo": len(hpo), "broken": broken}
    return "\n".join(lines), stats


def main() -> int:
    text, stats = render()
    out = os.path.join(RESULTS, "README.md")

    if "--check" in sys.argv:
        committed = open(out).read() if os.path.exists(out) else ""
        if committed != text:
            import difflib
            diff = list(difflib.unified_diff(
                committed.splitlines(), text.splitlines(),
                fromfile="results/README.md (committed)",
                tofile="results/README.md (regenerated)", lineterm=""))
            print("\n".join(diff[:60]), file=sys.stderr)
            print("ERROR: results/README.md is stale vs the committed artifacts — "
                  "run `python scripts/summarize_results.py`", file=sys.stderr)
            return 1
        print(f"results/README.md is current ({stats['parity']} parity, "
              f"{stats['evals']} evals, {stats['benches']} benches)")
        if stats["broken"]:
            print(f"ERROR: broken artifacts present: {', '.join(stats['broken'])}",
                  file=sys.stderr)
            return 2
        return 0

    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out} ({stats['parity']} parity, {stats['evals']} evals, "
          f"{stats['benches']} benches)")
    if stats["broken"]:
        print(f"ERROR: {len(stats['broken'])} artifact(s) contain error entries: "
              f"{', '.join(stats['broken'])}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
