#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables and compare row-for-row.

The driver hashes values WITH their representation, so a DuckDB HUGEINT
(un-cast sum(BIGINT) -> pandas float64 via .df()) hash-mismatches a Spark
BIGINT even when every value is equal. To predict that gate locally we read
the oracle result exactly the way the driver does (`con.execute(sql).df()`)
and REQUIRE a canonical-dtype match between the two frames in addition to
the value match. The canonicalization folds width-only differences (int32 vs
int64, float32 vs float64) that the driver's comparator also tolerates, but
keeps int-vs-float distinct — the class of slip that actually flips the
driver's hash. An un-cast oracle therefore fails here (float64 vs int64)
before it fails in the driver; `CAST(sum(...) AS BIGINT)` makes both gates
green.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canonical_dtypes(df: pd.DataFrame):
    """Dtype signature folded the way the driver's comparator folds it:
    integer widths together, float widths together, tz-less datetimes
    together, all string representations to `object`. int vs float stays
    distinct on purpose — that is the hash-breaking case."""
    sig = []
    for c in df.columns:
        s = str(df[c].dtype).lower()
        if s in ("int64", "int32", "int16", "int8",
                 "uint64", "uint32", "uint16", "uint8"):
            s = "int"
        elif s in ("float32", "float64"):
            s = "float"
        elif s.startswith("datetime64"):
            s = "datetime"
        elif s in ("string", "large_string"):
            s = "object"
        sig.append((c, s))
    return sig

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    passed, failed, rows_only = [], [], []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            status = "rows_only" if len(got) > 0 else "rows_only_EMPTY"
            rows_only.append((name, status, len(got)))
            continue
        try:
            exp = con.execute(oracle[name]).df()  # driver-style read
        except Exception as e:
            failed.append((name, f"oracle SQL error: {e}"))
            continue
        g, e = normalize(got.copy()), normalize(exp.copy())
        if list(g.columns) != list(e.columns):
            failed.append((name, f"schema mismatch: got {list(g.columns)} want {list(e.columns)}"))
            continue
        if len(g) != len(e):
            failed.append((name, f"row count: got {len(g)} want {len(e)}"))
            continue
        gd, ed = canonical_dtypes(g), canonical_dtypes(e)
        if gd != ed:
            diff = [(a, b) for a, b in zip(gd, ed) if a != b]
            failed.append((name, f"dtype mismatch (driver hash gate would flag): spark-vs-oracle {diff}"))
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            passed.append(name)
        except AssertionError as ex:
            # retry with tolerance to show whether it's a float-noise issue
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              check_exact=False, rtol=1e-9)
                failed.append((name, "EXACT mismatch but matches at rtol=1e-9"))
            except AssertionError:
                failed.append((name, str(ex).split("\n")[0][:300]))
    print(f"PASS {len(passed)}: {passed}")
    for n, s, c in rows_only:
        print(f"ROWS_ONLY {n}: {s} ({c} rows)")
    for n, msg in failed:
        print(f"FAIL {n}: {msg}")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
