#!/usr/bin/env python3
"""Local correctness pre-check: replay the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

For each query dir under <verifyOutDir> (written by graft.Verify):
  - load the Spark result parquet
  - run the matching SQL from oracle_sql.json in DuckDB with views named
    after the base tables in <sfDir>
  - sort columns by name, sort rows by all columns, compare cell-by-cell
    (exact for non-floats; floats exact-or-report-max-abs-diff)

This is a strictly harsher check than any reasonable hash compare: if we
pass here (exact), we pass the driver.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    rr.append("NaN")
                else:
                    rr.append(v)
            elif hasattr(v, "isoformat"):
                rr.append(v.isoformat())
            elif isinstance(v, (list, tuple)):
                rr.append(tuple(v))
            elif hasattr(v, "tolist"):  # numpy array cell (array-typed column)
                rr.append(tuple(v.tolist()))
            else:
                rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=repr)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_noresult = 0
    queries = sorted(d.name for d in Path(out_dir).iterdir() if d.is_dir())
    for name in queries:
        if only and name not in only:
            continue
        spark_glob = str(Path(out_dir, name, "*.parquet"))
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_glob}')").fetch_df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only check), rows={len(sdf)}")
            n_noresult += 1
            continue
        try:
            odf = con.execute(oracle[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        srows = normalize(sdf[scols].itertuples(index=False, name=None))
        orows = normalize(odf[scols].itertuples(index=False, name=None))
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = 0
        maxdiff = 0.0
        first = None
        for sr, orr in zip(srows, orows):
            if sr == orr:
                continue
            # allow float wiggle reporting
            ok = True
            for a, b in zip(sr, orr):
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    d = abs(a - b)
                    maxdiff = max(maxdiff, d)
                    if d > 0:
                        ok = False
                else:
                    ok = False
            if not ok:
                bad += 1
                if first is None:
                    first = (sr, orr)
        if bad:
            print(f"FAIL {name}: {bad}/{len(srows)} rows differ, maxfloatdiff={maxdiff:.3e}")
            print(f"   spark : {first[0]}")
            print(f"   oracle: {first[1]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noresult} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
