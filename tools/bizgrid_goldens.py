#!/usr/bin/env python3
"""Generate pandas goldens for the business-calendar resample grids
(B, BME, SME, BQE) on a fixed fixture, for transcription into
ResampleSpec. Run: python3 tools/bizgrid_goldens.py
"""
import pandas as pd

# Fixture: midnight edges, weekend timestamps, a month-end, a quarter-end,
# a 15th, sub-day times. Spans Dec 2023 - Apr 2024 (crosses a quarter end).
ROWS = [
    ("2023-12-29 00:00:00", 1.0),   # Fri, BME/BQE day of Dec, midnight
    ("2023-12-31 15:00:00", 2.0),   # Sun (weekend), month/quarter end day
    ("2024-01-02 10:30:00", 3.0),   # Tue
    ("2024-01-15 00:00:00", 4.0),   # Mon the 15th, midnight (SME edge)
    ("2024-01-20 08:00:00", 5.0),   # Sat (weekend)
    ("2024-01-31 23:59:59", 6.0),   # Wed month-end, end of day
    ("2024-02-15 12:00:00", 7.0),   # Thu the 15th
    ("2024-02-29 00:00:00", 8.0),   # leap-day Thu, BME day, midnight
    ("2024-03-29 17:45:00", 9.0),   # Fri, BME/BQE day of Mar
    ("2024-04-01 00:00:00", 10.0),  # Mon, quarter start midnight
]

s = pd.Series([v for _, v in ROWS],
              index=pd.to_datetime([t for t, _ in ROWS]))

for rule in ["B", "BME", "SME", "BQE"]:
    for closed in [None, "left", "right"]:
        for label in [None, "left", "right"]:
            kw = {}
            if closed: kw["closed"] = closed
            if label: kw["label"] = label
            try:
                r = s.resample(rule, **kw).sum()
            except Exception as e:
                print(f"{rule} closed={closed} label={label}: ERROR {e}")
                continue
            items = ", ".join(f'"{ts.date()}" -> Some({v})'
                              for ts, v in r.items())
            print(f'{rule} closed={closed} label={label}:')
            print(f'  Map({items})')
