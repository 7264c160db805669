#!/usr/bin/env python3
"""Dev-only mimic of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs every oracle_sql.json query in DuckDB over <sfDir>/*.parquet, loads the
Spark result parquet from <verifyOutDir>/<name>/, sorts columns by name,
sorts rows, and compares values exactly. Reports per-query PASS/FAIL with a
diff sample, plus float near-miss diagnostics (bit-level differences that an
exact hash would flag).
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if v is None: return (0, None)
    if isinstance(v, float):
        if math.isnan(v): return (1, "NaN")
        return (1, v)
    if isinstance(v, (int,)): return (1, float(v)) if False else (2, v)
    return (3, str(v))

def norm_table(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    snames = [names[i] for i in order]
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: str(t))
    return snames, out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            cur = con.execute(sql)
            dnames = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1; continue
        try:
            tbl = ds.dataset(f"{out_dir}/{name}").to_table()
            snames = tbl.column_names
            srows = [tuple(r[c] for c in snames) for r in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1; continue
        dn, dr = norm_table(dnames, drows)
        sn, sr = norm_table(snames, srows)
        if dn != sn:
            print(f"FAIL {name}: columns differ duck={dn} spark={sn}")
            n_fail += 1; continue
        if len(dr) != len(sr):
            print(f"FAIL {name}: rowcount duck={len(dr)} spark={len(sr)}")
            n_fail += 1; continue
        if dr == sr:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1; continue
        # find first diff
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(dr, sr)) if a != b][:3]
        print(f"FAIL {name}: {len([1 for a,b in zip(dr,sr) if a!=b])} differing rows; first: ")
        for i, a, b in bad:
            print(f"   row {i}: duck={a}")
            print(f"   row {i}: sprk={b}")
        n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracle)} total ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
