#!/usr/bin/env python3
"""Diff two bench records line by line.

Usage: bench_diff.py <old> <new> [threshold]

Each argument is either a driver archive (BENCH_r*.json: {"tail": ...,
"parsed": ...}) or a raw bench stdout capture (a preview .out). The
per-query numbers come from the LAST parseable {"metric": ...} object
found — i.e. the compact summary line the bench prints last precisely
so it survives the driver's ~2 KB tail window (see SCALE.md's
bench-trust section; BENCH_r11/r12 predate it and carry parsed: null,
so point this at a preview .out for those rounds).

Lines flagged `contaminated` in EITHER record are marked [CONTAM] and
excluded from the attention list: their number is the sensor's min
sample under a disclosed external burst, and the same-day A/B — not a
cross-round diff — is the adjudicator for them. `threshold` (default
1.5) bounds the ratio that earns attention; new/removed lines are
always listed.
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    # driver archive? use its tail (the stdout capture) as the haystack
    try:
        d = json.loads(text)
        if isinstance(d, dict) and "tail" in d:
            text = d["tail"]
            if isinstance(d.get("parsed"), dict):
                # a parseable archive is already the full JSON line
                p = d["parsed"]
                if "queries" in p:
                    return p
    except json.JSONDecodeError:
        pass
    best = None
    for m in re.finditer(r'\{"metric":.*?\}(?=\s*$|\s*\n)', text, re.M):
        try:
            cand = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if isinstance(cand.get("queries"), dict):
            best = cand  # keep the LAST one: the summary line
    if best is None:
        sys.exit(f"{path}: no parseable bench line with a queries object")
    return best


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qo, qn = old["queries"], new["queries"]
    contam = set(old.get("contaminated", [])) | set(new.get("contaminated", []))
    rows, attention = [], []
    for q in sorted(set(qo) | set(qn)):
        a, b = qo.get(q), qn.get(q)
        tag = " [CONTAM]" if q in contam else ""
        if a is None:
            rows.append(f"{q}: NEW {b:.3f}s{tag}")
            attention.append(q)
        elif b is None:
            rows.append(f"{q}: REMOVED (was {a:.3f}s){tag}")
            attention.append(q)
        else:
            r = b / a if a else float("inf")
            rows.append(f"{q}: {a:.3f} -> {b:.3f}s  x{r:.2f}{tag}")
            if (r >= thresh or r <= 1 / thresh) and q not in contam:
                attention.append(q)
    print("\n".join(rows))
    to, tn = old.get("value"), new.get("value")
    if to is not None and tn is not None:
        print(f"total: {to:.2f} -> {tn:.2f}s  x{tn / to:.2f}")
    if contam:
        print(f"contaminated (excluded from attention): {sorted(contam)}")
    print(f"needs attention (ratio beyond x{thresh}, or new/removed): "
          f"{attention if attention else 'none'}")


if __name__ == "__main__":
    main()
