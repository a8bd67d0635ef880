#!/usr/bin/env python3
"""Seeded differential-fuzz goldens for the resample lattice.

Generates N random (rule, closed, label, origin, offset, fixture) cases
across every rule family the engine supports — fixed (s/min/h/D with
multiples and the full origin/offset surface), weekly anchors (nW-XXX),
calendar periods (ME/MS/QE/QS/YE/YS with multiples), business grids
(B/BME/SME/BQE) — runs pandas 2.2.2 `resample(...).sum()` on each, and
writes one JSONL golden per case for ResampleSpec's
"seeded differential fuzz vs pandas" property.

The engine's kwarg constraints are respected by construction (calendar
rules: BOTH closeds but no origin/offset; weekly/business: no
origin/offset — the engine REFUSES those instead of silently
diverging/no-op'ing, and the refusal is spec-pinned separately).
Calendar fixtures plant period-edge midnight stamps so the
non-default-closed edge shift is exercised densely.

Values are integer-valued floats so sums compare exactly; weights are
all 1 on the Scala side, making the weighted sum pandas' plain sum.

Run: python3 tools/resample_fuzz_goldens.py [n_cases] [out_path]
Deterministic for a given seed — regenerating must be a no-op diff.
"""
import json
import random
import sys

import pandas as pd

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300
OUT = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/resample_fuzz_goldens.jsonl"
SEED = 20260815
MAX_BINS = 400

rnd = random.Random(SEED)

WEEKDAYS = ["MON", "TUE", "WED", "THU", "FRI", "SAT", "SUN"]


def pick_case():
    family = rnd.choice(["fixed", "fixed", "fixed", "weekly", "calendar", "calendar", "business"])
    closed = rnd.choice([None, "left", "right"])
    label = rnd.choice([None, "left", "right"])
    origin, offset = None, None
    if family == "fixed":
        unit = rnd.choice(["s", "min", "h", "D"])
        n = rnd.choice({"s": [1, 7, 30, 90], "min": [1, 5, 15, 45],
                        "h": [1, 2, 6, 12], "D": [1, 2, 3, 7]}[unit])
        rule = f"{n}{unit}" if n > 1 else unit
        origin = rnd.choice([None, "epoch", "start", "start_day", "end", "end_day"])
        offset = rnd.choice([None, None, "30min", "1h", "90min"])
        span_s = {"s": 3600, "min": 86400, "h": 86400 * 12, "D": 86400 * 150}[unit]
    elif family == "weekly":
        n = rnd.choice([1, 1, 2, 3])
        rule = (f"{n}W-" if n > 1 else "W-") + rnd.choice(WEEKDAYS)
        span_s = 86400 * 250
    elif family == "calendar":
        unit = rnd.choice(["ME", "MS", "QE", "QS", "YE", "YS"])
        n = rnd.choice([1, 1, 2, 3])
        rule = f"{n}{unit}" if n > 1 else unit
        # BOTH closeds: the non-default one shifts period-edge rows (the
        # engine reproduces pandas' midnight bin edges — end-anchored
        # closed='left' moves every row on a period's last DAY forward,
        # start-anchored closed='right' moves exact-anchor-midnight rows
        # back); make_rows plants period-edge stamps so the shift is
        # exercised, not just possible
        span_s = 86400 * (700 if unit[0] in "MQ" else 2500)
    else:
        rule = rnd.choice(["B", "BME", "SME", "BQE"])
        span_s = 86400 * (150 if rule == "B" else 600)
    return family, rule, closed, label, origin, offset, span_s


def make_rows(span_s, calendar=False):
    base = pd.Timestamp("2023-01-01") + pd.Timedelta(seconds=rnd.randrange(86400 * 365))
    n_rows = rnd.randrange(8, 25)
    stamps = []
    for _ in range(n_rows):
        off = rnd.randrange(span_s + 1)
        if rnd.random() < 0.25:  # snap to a midnight / round edge
            off -= off % 86400
        t = base + pd.Timedelta(seconds=off)
        if calendar:
            # plant period-edge stamps: month-start / month-end midnights
            # (± a second) are exactly the rows the non-default closed
            # shifts — without them the edge cases are possible but rare
            r = rnd.random()
            if r < 0.15:
                t = t.normalize().replace(day=1)
            elif r < 0.30:
                t = (t.normalize().replace(day=1) + pd.offsets.MonthEnd(1)).normalize()
            if r < 0.30 and rnd.random() < 0.4:
                t += pd.Timedelta(seconds=rnd.choice([-1, 1]))
        stamps.append(t)
    if rnd.random() < 0.3 and len(stamps) > 2:  # planted duplicate timestamps
        stamps[1] = stamps[0]
    return sorted((ts, float(rnd.randrange(1, 100))) for ts in stamps)


cases, tried = [], 0
while len(cases) < N and tried < N * 10:
    tried += 1
    family, rule, closed, label, origin, offset, span_s = pick_case()
    rows = make_rows(span_s, calendar=(family == "calendar"))
    s = pd.Series([v for _, v in rows], index=pd.DatetimeIndex([t for t, _ in rows]))
    kw = {}
    if closed:
        kw["closed"] = closed
    if label:
        kw["label"] = label
    if origin:
        kw["origin"] = origin
    if offset:
        kw["offset"] = offset
    try:
        r = s.resample(rule, **kw).sum()
    except Exception:
        continue
    if not (0 < len(r) <= MAX_BINS):
        continue
    cases.append({
        "id": len(cases),
        "rule": rule,
        "closed": closed,
        "label": label,
        "origin": origin,
        "offset": offset,
        "ts": [str(t) for t, _ in rows],
        "v": [v for _, v in rows],
        "ets": [str(t) for t in r.index],
        "ev": [float(x) for x in r.values],
    })

assert len(cases) == N, f"only {len(cases)} cases generated"
with open(OUT, "w") as f:
    for c in cases:
        f.write(json.dumps(c) + "\n")
fams = {}
for c in cases:
    fams[c["rule"]] = fams.get(c["rule"], 0) + 1
print(f"wrote {len(cases)} cases to {OUT} (pandas {pd.__version__})")
print("rule histogram:", dict(sorted(fams.items())))
