#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tool only — not
part of the shipped library). Runs after `graft.Verify` has dumped query
results: compares each <out>/<name> parquet against the DuckDB oracle in
<out>/oracle_sql.json, as a sorted multiset of rows with exact values.

Usage: verify_local.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
            exp = con.execute(sql)
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # The driver hashes pandas values, where dtype matters: a DuckDB
        # HUGEINT (uncast SUM of BIGINTs) converts to float64 while Spark
        # writes int64 — identical values, different hashes (bit us in
        # round 3: q97/q98). Compare numeric KIND per column so that
        # divergence fails loudly here too. Datetime flavors (tz-aware vs
        # naive) are normalized away — the driver accepts both.
        def kind(dt):
            s = str(dt)
            if s.startswith("datetime64"):
                return "datetime"
            return dt.kind  # i/u=int f=float b=bool O=object
        try:
            # LIMIT-0 probes: DuckDB's pandas dtype mapping is driven by
            # the DECLARED column types (HUGEINT→float64, BIGINT→int64),
            # so a zero-row fetch carries the exact signal this check
            # wants without re-executing the full oracle SQL / re-reading
            # the result parquet a second time.
            gdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").df()
            edf = con.execute(
                f"SELECT * FROM ({sql.rstrip().rstrip(';')}) __dt LIMIT 0").df()
            bad = [c for c in gdf.columns
                   if kind(gdf[c].dtype) != kind(edf[c].dtype)]
            if bad:
                print(f"FAIL {name}: dtype kind mismatch on {bad}: "
                      f"got {[str(gdf[c].dtype) for c in bad]} vs "
                      f"exp {[str(edf[c].dtype) for c in bad]}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: dtype check exception {e}")
            n_fail += 1
            continue
        gk, ek = rows_key(got_rows, got_cols), rows_key(exp_rows, exp_cols)
        if len(gk) != len(ek):
            print(f"FAIL {name}: rowcount {len(gk)} != {len(ek)}")
            n_fail += 1
            continue
        diff = [i for i, (a, b) in enumerate(zip(gk, ek)) if a != b]
        if diff:
            i = diff[0]
            print(f"FAIL {name}: {len(diff)} differing rows; first at {i}:")
            print(f"  got: {gk[i]}")
            print(f"  exp: {ek[i]}")
            print(f"  col order: {sorted(got_cols)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gk)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
