#!/usr/bin/env python3
"""Cross-check graft.Verify parquet dumps against DuckDB oracle SQL.

Usage: python3 tools/crosscheck.py <verify_out_dir> <sf_dir> [--rowhash=q50,q55]
(the = form is required; bare --rowhash fingerprints every query)

Driver-side diagnostic only (duckdb/pandas are NOT dependencies of the
library). Two checks beyond the tolerant value compare:

1. DTYPE KIND check (always on): the driver's row hash renders values
   dtype-exactly, so an int64 Spark column vs a float64 oracle column fails
   its hash even when every value compares equal under rtol. DuckDB's
   sum(BIGINT/INTEGER) silently promotes to HUGEINT, which pandas fetches as
   float64 — every oracle output column must therefore be CAST back. This
   check fails any query whose Spark/oracle column kinds (int vs float vs
   str ...) disagree. (Root cause of the round-6/7 q50_pack_sequences red.)

2. --rowhash (on demand): compute the driver-convention SHA-256 fingerprint
   (sort columns by name, canonical dtype-tagged cells, sort rows) over the
   DuckDB oracle result — the exact twin of graft.tools.RowHash, which
   computes it over the Spark parquet. Equal fingerprints ⇒ the driver's
   hash_match must pass.
"""
import sys, os, json, glob, hashlib, datetime, struct
import duckdb
import pandas as pd
import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
out_dir, sf_dir = args[0], args[1]
rowhash_queries = []
for a in sys.argv[1:]:
    if a.startswith("--rowhash"):
        rowhash_queries = a.split("=", 1)[1].split(",") if "=" in a else ["*"]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))


def kind(dtype):
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "ts"
    return "str"


def canonical_cell(v):
    """Twin of graft.tools.RowHash.canonicalCell — keep in sync.

    NaN renders as null ("n:") BY CONVENTION on both sides: pandas stores
    SQL NULL as NaN in float64 columns, so Python cannot tell them apart;
    the Scala twin normalizes identically.
    """
    if v is None or (isinstance(v, (float, np.floating)) and np.isnan(v)) or v is pd.NaT:
        return "n:"  # np.floating covers float32 NaN (not a Python-float subclass)
    if isinstance(v, (bool, np.bool_)):
        return f"b:{str(bool(v)).lower()}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        # signed IEEE-754 bit pattern: %.17e is NOT portable (Java pads the
        # shortest repr with zeros instead of correctly rounding)
        return f"f:{struct.unpack('<q', struct.pack('<d', float(v)))[0]}"
    if isinstance(v, pd.Timestamp):
        return f"t:{v.value // 1_000_000}"
    if isinstance(v, datetime.date):  # java.sql.Date.toString is ISO too
        return f"d:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):  # JVM bytes are signed
        return "a:[" + ",".join(f"i:{b - 256 if b >= 128 else b}" for b in v) + "]"
    if isinstance(v, (list, np.ndarray)):
        return "a:[" + ",".join(canonical_cell(x) for x in v) + "]"
    return f"s:{v}"


def fingerprint(df):
    df = df[sorted(df.columns)]
    rows = ["|".join(canonical_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return hashlib.sha256("\n".join(sorted(rows)).encode("utf-8")).hexdigest()


def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


fails, skips = [], []
for name in sorted(oracle):
    sql = oracle[name]
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        fails.append((name, "no spark output"))
        continue
    s = pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True)
    try:
        o = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    if sorted(s.columns) != sorted(o.columns):
        fails.append((name, f"schema: spark={sorted(s.columns)} oracle={sorted(o.columns)}"))
        continue
    if len(s) != len(o):
        fails.append((name, f"rows: spark={len(s)} oracle={len(o)}"))
        continue
    # dtype-kind check: the driver hash is dtype-exact
    dtype_bad = [
        f"{c}: spark={kind(s[c].dtype)}({s[c].dtype}) oracle={kind(o[c].dtype)}({o[c].dtype})"
        for c in s.columns
        if kind(s[c].dtype) != kind(o[c].dtype)
        # a nullable int landing as float64 on BOTH sides is fine; only
        # cross-side kind disagreement breaks the driver hash
    ]
    if dtype_bad:
        fails.append((name, "DTYPE " + "; ".join(dtype_bad)))
        continue
    s, o = norm(s), norm(o)
    bad = None
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_numeric_dtype(sv) and pd.api.types.is_numeric_dtype(ov):
            a = sv.astype(float).to_numpy()
            b = ov.astype(float).to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            close = np.isclose(a, b, rtol=1e-9, atol=1e-12) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                bad = f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r}"
                break
        else:
            eq = (sv.astype(str) == ov.astype(str)) | (sv.isna() & ov.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                bad = f"col {c} row {i}: spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}"
                break
    if bad:
        fails.append((name, bad))
        continue
    print(f"OK    {name}  ({len(s)} rows)")
    if rowhash_queries and (rowhash_queries == ["*"] or name in rowhash_queries
                            or any(name.startswith(q) for q in rowhash_queries)):
        print(f"ORACLEHASH {name} {fingerprint(o)}")
        print(f"SPARKHASH  {name} {fingerprint(s)}")

no_oracle = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
for d in no_oracle:
    print(f"SKIP  {d}  (no oracle)")

if fails:
    print("\nFAILS:")
    for n, why in fails:
        print(f"  {n}: {why}")
    sys.exit(1)
print("\nFAILS: none")
