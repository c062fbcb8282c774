#!/usr/bin/env python3
"""Diff two bench records line by line.

Usage: bench_diff.py <old> <new> [threshold]

Each argument is either a driver archive (BENCH_r*.json: {"tail": ...,
"parsed": ...}) or a raw bench stdout capture (a preview .out). The
per-query numbers come from the LAST parseable {"metric": ...} object
found — i.e. the compact summary line the bench prints last precisely
so it survives the driver's ~2 KB tail window (see SCALE.md's
bench-trust section; BENCH_r11/r12 predate it and carry parsed: null,
so point this at a preview .out for those rounds). An archive whose
parsed.queries values are not plain numbers (a future per-sample-array
format) is ignored in favor of the tail scan.

Two classes of line are EXCLUDED from the attention list (but still
printed, tagged):
- [CONTAM]: flagged `contaminated` in either record — the number is
  the sensor's min sample under a disclosed external burst; the
  same-day A/B, not a cross-round diff, adjudicates those. This
  applies to ratio lines AND new/removed lines alike.
- [FIRST-TOUCH]: listed in either record's `first_touch` — the line
  has a build-once guard, so short sample streams read the one-time
  build as a phantom 1.3-1.7x swing (three r13 adjudications). They
  get their own secondary list when beyond threshold: re-check those
  with a multi-sample A/B before believing the ratio.

`threshold` (default 1.5) bounds the ratio that earns attention;
non-contaminated new/removed lines are always attention-worthy.

`--canary qxx[,qyy]` de-drifts cross-day comparisons (r14 verdict #7:
uniform host drift of 1.1-1.4x across untouched lines defeated the
same-run sensors twice; the adjudication was manual both times).
Every ratio is divided by the canaries' geometric-mean ratio before
thresholding — the canaries should be stable, pure-CPU lines whose
code the diff does not touch (q01/q18/q24-class). Both raw and
normalized ratios print; canaries are excluded from the attention
list (they define the baseline) and a contaminated or missing canary
is dropped with a warning (all dropped -> raw thresholding).
"""
import json
import math
import re
import sys


def _numeric_queries(obj):
    q = obj.get("queries")
    return isinstance(q, dict) and q and all(
        isinstance(v, (int, float)) and not isinstance(v, bool)
        for v in q.values())


def load(path):
    text = open(path).read()
    # driver archive? use its tail (the stdout capture) as the haystack
    try:
        d = json.loads(text)
        if isinstance(d, dict) and "tail" in d:
            text = d["tail"]
            if isinstance(d.get("parsed"), dict):
                p = d["parsed"]
                # only trust parsed when its queries are scalars — a
                # future archive storing full records (per-sample
                # arrays) must fall through to the tail's summary line
                # instead of crashing the float formatting
                if _numeric_queries(p):
                    return p
    except json.JSONDecodeError:
        pass
    best = None
    for m in re.finditer(r'\{"metric":.*?\}(?=\s*$|\s*\n)', text, re.M):
        try:
            cand = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if _numeric_queries(cand):
            best = cand  # keep the LAST one: the summary line
    if best is None:
        sys.exit(f"{path}: no parseable bench line with a numeric queries object")
    return best


def main():
    args = []
    canaries = []
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--canary="):
            canaries = [c for c in a.split("=", 1)[1].split(",") if c]
        elif a == "--canary":
            canaries = [c for c in next(it, "").split(",") if c]
        else:
            args.append(a)
    if len(args) < 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    thresh = float(args[2]) if len(args) > 2 else 1.5
    qo, qn = old["queries"], new["queries"]
    contam = set(old.get("contaminated", [])) | set(new.get("contaminated", []))
    first = set(old.get("first_touch", [])) | set(new.get("first_touch", []))
    # the drift factor: geometric mean of the usable canaries' ratios
    drift = 1.0
    if canaries:
        usable = []
        for c in canaries:
            if c in contam:
                print(f"canary {c}: contaminated in one record — dropped")
            elif not (isinstance(qo.get(c), (int, float)) and
                      isinstance(qn.get(c), (int, float)) and qo[c]):
                print(f"canary {c}: missing from a record — dropped")
            else:
                usable.append(qn[c] / qo[c])
        if usable:
            drift = math.exp(sum(math.log(r) for r in usable) / len(usable))
            print(f"canary drift factor: x{drift:.3f} "
                  f"({len(usable)}/{len(canaries)} canaries usable) — "
                  "ratios below show raw and [norm] drift-normalized; "
                  "thresholding uses [norm]")
        else:
            print("no usable canary — falling back to raw thresholding")
    rows, attention, ft_attention = [], [], []
    for q in sorted(set(qo) | set(qn)):
        a, b = qo.get(q), qn.get(q)
        tag = ("" if q not in contam else " [CONTAM]") + \
            ("" if q not in first else " [FIRST-TOUCH]") + \
            ("" if q not in canaries else " [CANARY]")
        if a is None:
            rows.append(f"{q}: NEW {b:.3f}s{tag}")
            if q not in contam:
                attention.append(q)
        elif b is None:
            rows.append(f"{q}: REMOVED (was {a:.3f}s){tag}")
            if q not in contam:
                attention.append(q)
        else:
            r = b / a if a else float("inf")
            rn = r / drift
            norm = f" [norm x{rn:.2f}]" if drift != 1.0 else ""
            rows.append(f"{q}: {a:.3f} -> {b:.3f}s  x{r:.2f}{norm}{tag}")
            if ((rn >= thresh or rn <= 1 / thresh) and q not in contam
                    and q not in canaries):
                (ft_attention if q in first else attention).append(q)
    print("\n".join(rows))
    to, tn = old.get("value"), new.get("value")
    if to is not None and tn is not None:
        print(f"total: {to:.2f} -> {tn:.2f}s  x{tn / to:.2f}")
    if contam:
        print(f"contaminated (excluded from attention): {sorted(contam)}")
    if ft_attention:
        print("first-touch lines beyond threshold (build-once guard — "
              f"adjudicate with a multi-sample A/B, not this diff): {ft_attention}")
    print(f"needs attention (ratio beyond x{thresh}, or new/removed): "
          f"{attention if attention else 'none'}")


if __name__ == "__main__":
    main()
