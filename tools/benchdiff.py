#!/usr/bin/env python3
"""Per-query bench regression diff.

Compares two benchmark artifacts and flags queries whose warm-rep
minimum moved by more than a threshold (default 1.5x either way) —
the check the round judge otherwise does by hand from truncated tails.

Accepts either artifact shape:
  - graft.Bench stdout (one JSON object with "queries"/"iterations"),
    optionally prefixed with sbt's "[info] ";
  - the driver's BENCH_rN.json wrapper, whose "tail" holds the last
    2000 chars of that line (per-query iteration arrays are recovered
    with a regex; queries that fell off the front are skipped).

Warm minimum: iterations[1:] when 3+ reps ran (rep 1 carries cold
codegen), else min of what exists. Mirrors Bench.scala's noise audit.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [--threshold 1.5]
       [--out DIFF.md]
Exit code 0 always (informational; the table is the artifact).
"""
import json, re, sys


def load_queries(path):
    """-> {query: warm_min_seconds} from either artifact shape."""
    raw = open(path).read().strip()
    if raw.startswith("[info] "):
        raw = raw[len("[info] "):]
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        obj = None
    if obj is not None and "iterations" in obj:
        return {k: warm_min(v) for k, v in obj["iterations"].items()
                if warm_min(v) is not None}, obj.get("value")
    if obj is not None and "tail" in obj:  # driver wrapper
        out = {}
        for m in re.finditer(r'"(\w+)":\[([0-9.,\-eE]+)\]', obj["tail"]):
            ts = [float(x) for x in m.group(2).split(",")]
            w = warm_min(ts)
            if w is not None:
                out[m.group(1)] = w
        total = None
        t = re.search(r'"metric":"total","value":([0-9.]+)', obj["tail"])
        if t:
            total = float(t.group(1))
        return out, total
    if obj is not None and "queries" in obj:  # minima only, no iterations
        return {k: v for k, v in obj["queries"].items() if v and v > 0}, \
            obj.get("value")
    raise SystemExit(f"{path}: unrecognized bench artifact")


def warm_min(ts):
    ts = [t for t in ts if t is not None and t > 0]
    if not ts:
        return None
    warm = ts[1:] if len(ts) >= 3 else ts
    return min(warm)


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old_path")
    ap.add_argument("new_path")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--out")
    ns = ap.parse_args()
    thr, out = ns.threshold, ns.out
    old_path, new_path = ns.old_path, ns.new_path
    old, old_total = load_queries(old_path)
    new, new_total = load_queries(new_path)
    shared = sorted(set(old) & set(new))
    rows = []
    for q in shared:
        ratio = new[q] / old[q] if old[q] > 0 else float("inf")
        flag = "SLOWER" if ratio > thr else ("faster" if ratio < 1 / thr
                                             else "")
        rows.append((ratio, q, old[q], new[q], flag))
    rows.sort(reverse=True)
    lines = [
        f"# Bench diff: {old_path} -> {new_path}",
        "",
        f"- totals: {old_total} -> {new_total} s",
        f"- shared queries: {len(shared)}; only-old: "
        f"{sorted(set(old) - set(new))}; only-new: "
        f"{sorted(set(new) - set(old))}",
        f"- flagged (> {thr}x either way, warm-rep minima): "
        f"{sum(1 for r in rows if r[4])}",
        "",
        "| query | old s | new s | ratio | flag |",
        "|---|---|---|---|---|",
    ]
    for ratio, q, a, b, flag in rows:
        if flag:
            lines.append(f"| {q} | {a:.3f} | {b:.3f} | {ratio:.2f}x | "
                         f"**{flag}** |")
    lines.append("")
    lines.append("<details><summary>all shared queries</summary>")
    lines.append("")
    lines.append("| query | old s | new s | ratio |")
    lines.append("|---|---|---|---|")
    for ratio, q, a, b, _ in sorted(rows, key=lambda r: r[1]):
        lines.append(f"| {q} | {a:.3f} | {b:.3f} | {ratio:.2f}x |")
    lines.append("")
    lines.append("</details>")
    text = "\n".join(lines) + "\n"
    if out:
        open(out, "w").write(text)
        print(f"wrote {out}")
    # console: flagged rows only
    for ratio, q, a, b, flag in rows:
        if flag:
            print(f"{flag:>6} {q}: {a:.3f}s -> {b:.3f}s ({ratio:.2f}x)")
    if not any(r[4] for r in rows):
        print(f"no movers beyond {thr}x across {len(shared)} shared queries")


if __name__ == "__main__":
    main()
