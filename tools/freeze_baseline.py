#!/usr/bin/env python3
"""Regenerate BASELINE-LOCAL.md from the committed quiet-machine bench runs.

Usage: python3 tools/freeze_baseline.py <this_round_run.json> [more.json ...]

Reads bench/r10.json and bench/r11.json (the previous quiet-run records,
same testdata epoch) plus the runs given on the command line (this
round's quiet min-of-two Bench outputs), min-merges per query, and
rewrites BASELINE-LOCAL.md with a per-query epoch tag naming the run
that produced each frozen minimum. Queries absent from the historical
records adopt at this round's epoch.
"""
import json, sys, os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def load(path):
    with open(path) as f:
        return json.load(f)["queries"]

sources = [("r10", load(os.path.join(ROOT, "bench/r10.json"))),
           ("r11", load(os.path.join(ROOT, "bench/r11.json")))]
for p in sys.argv[1:]:
    tag = os.path.basename(p).split(".")[0]  # bench/r14.json -> "r14"
    sources.append((tag, load(p)))

mins = {}
for tag, qs in sources:
    for q, t in qs.items():
        if q not in mins or t < mins[q][0]:
            mins[q] = (t, tag)

total = sum(t for t, _ in mins.values())
lines = []
lines.append("# BASELINE-LOCAL — frozen per-query bench minimums (re-frozen r13)")
lines.append("")
lines.append("""The reference (`nachomaiz/pandas-weights`) publishes **no performance
numbers** — performance is explicitly a non-goal of the reference
(`/root/reference/README.md:11`) — so `BASELINE.md`'s "within 2x of
BASELINE at the same SF" gate had nothing numeric to be within 2x OF.
This file makes the gate concrete: per-query minimums over every
committed QUIET-machine bench record of the current testdata epoch
(`bench/r10.json`, `bench/r11.json`, `bench/r13.json` — each itself
min-of-two back-to-back runs per query, sf0.1, local[32], 128 GiB JVM).

**Gate:** in every later round, a query whose min-of-two time exceeds
**2x its frozen minimum below** (and is above a 1.0 s absolute floor, to
ignore sub-second timer noise) must be flagged in the round records
(`PROGRESS.md`) with either a fix or a written diagnosis.
New queries enter the gate at the first round that benches them (the
`epoch` column names the run that produced each frozen min).

**Epoch:** testdata epoch r10 (the driver's `events.ts` NANOS→MICROS
regeneration). Numbers from r1–r9 artifacts are NOT comparable. If the
driver regenerates data again, re-freeze and bump the epoch here rather
than comparing across epochs.

**Contended-run adjudication (r12):** the driver's BENCH_r12 carried 7
apparent 2x-gate flags (q32, q37b, q49, q73, q87, q88, q99); the judge
re-benched all seven on a quiet machine and adjudicated **all seven as
machine-contention phantoms** (VERDICT r12 — the bench ran minutes after
a 15,770 s build session). None is a real regression; their frozen mins
below reflect quiet-machine behavior. This re-freeze (r13) exists so
later gates compare against coherent quiet-run minimums instead of
mixed-epoch ad-hoc adoption notes.""")
lines.append("")
lines.append("""**Contention sentinel (r16 — three probe classes).** The single
codegen-only calibration read "quiet" (1.06–1.09) on machine epochs
where code-unchanged queries ran 1.5–2x their frozen minimums (r15):
the suite's cost is mostly parquet scan/decode and exchange traffic,
which a loaded box degrades long before a register-resident loop. The
bench now times THREE min-of-two probes before the suite — `codegen`
(400M-row range sum), `scan` (a self-generated 10M-row parquet read
back through long/double/string aggregates; written untimed, so the
probe is SF-independent), `shuffle` (12M rows through a 1M-key hash
exchange with no map-side reduction) — each against a frozen
per-core-count quiet baseline (`Bench.calibrationQuietSec`), and emits
per-class `{sec, quiet, ratio}` plus:

- `contention_ratio` = MAX class ratio — **> ~1.4 ⇒ the run is
  non-gating**: per-query flags from it are suspect and must not
  re-freeze minimums;
- `env_factor` = geometric mean of the class ratios — the normalizer
  for flag evaluation on a non-quiet run: a query flags only if
  `min_observed > 2 x frozen x env_factor` (and the 1.0 s floor).
  On a quiet run env_factor ≈ 1 and the rule reduces to the plain gate.

A fourth, DIAGNOSTIC-ONLY class `single` (added late r16 after the q93
adjudication) times one thread through a 400M-step dependent-op chain —
the single-core clock that driver-side model builds (eager bloom
construction, collect-assembled matrices) are bound by; a box can read
quiet on every parallel probe and still run those 2x slower. Its ratio
is excluded from contention_ratio/env_factor (the suite is
parallel-bound) and read directly when adjudicating driver-bound
flags. Its quiet baseline starts at the r16 box epoch.

Separation measured r16 (local[4], same box): quiet run ratios
codegen/scan/shuffle = 0.81/0.83/0.96 (contention_ratio 0.96,
env_factor 0.87); under a deliberate load of 24 CPU burners + fsync'd
1 GiB/s writes: 1.56/1.24/1.44 (contention_ratio 1.56, env_factor
1.41). The r15 blind spot is closed: a loaded epoch now reads loaded
on the resources the suite actually uses.

**Epoch note (r16 adoptions):** two r16 runs were min-merged. The first
(bench/r16.json) ran on transiently degraded machine state — sentinel
1.35/1.22/1.29, env_factor 1.28 — and its 12 new-query adoptions were
inflated accordingly; the second (bench/r16b.json, hours later, same
box) read QUIET (1.01/1.07/0.99, env_factor 1.02) and pulled every new
minimum down 10–30% (q148 29.0→21.9, q142 19.7→15.6). The sentinel's
value is exactly this: the first run's ratios said "don't trust these
numbers as a quiet floor", and the second run proved them right.""")
lines.append("")
lines.append(f"Total (sum of per-query mins): **{total:.1f} s / {len(mins)} queries** at sf0.1.")
lines.append("")
lines.append("| query | min (s) | 2x gate (s) | epoch |")
lines.append("|---|---|---|---|")
for q in sorted(mins):
    t, tag = mins[q]
    lines.append(f"| {q} | {t:.3f} | {2*t:.3f} | {tag} |")
lines.append("")

with open(os.path.join(ROOT, "BASELINE-LOCAL.md"), "w") as f:
    f.write("\n".join(lines))
print(f"BASELINE-LOCAL.md: {len(mins)} queries, total {total:.1f} s")
