#!/usr/bin/env python3
"""Dev-only mimic of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--lax-types]

Runs every oracle_sql.json query in DuckDB over <sfDir>/*.parquet, loads the
Spark result parquet from <verifyOutDir>/<name>/, sorts columns by name,
sorts rows, and compares values exactly. Reports per-query PASS/FAIL with a
diff sample.

TYPE-STRICT (round 10): both sides are fetched as Arrow tables and the
per-column Arrow types are compared after a minimal benign normalization
(large_string==string, large_binary==binary, large_list==list, dictionary
unwrapped). This catches the q163 class of bug — DuckDB widening
SUM(...) OVER to HUGEINT/decimal128 while Spark emits int64 — which the
driver's typed hash flags but a python-int value compare cannot see.
Pass --lax-types to restore the old values-only behavior.
"""
import json, math, sys
import duckdb
import pyarrow as pa
import pyarrow.dataset as ds

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if v is None: return (0, None)
    if isinstance(v, float):
        if math.isnan(v): return (1, "NaN")
        return (1, v)
    if isinstance(v, bool): return (4, v)
    if isinstance(v, int): return (2, v)
    if isinstance(v, list): return (5, tuple(canon(x) for x in v))
    if isinstance(v, dict):
        return (6, tuple(sorted((k, canon(x)) for k, x in v.items())))
    return (3, str(v))

def norm_type(t):
    """Canonical type label; benign width/offset variants collapse."""
    if pa.types.is_dictionary(t):
        return norm_type(t.value_type)
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t) or \
       pa.types.is_fixed_size_binary(t):
        return "binary"
    if pa.types.is_large_list(t) or pa.types.is_list(t) or \
       pa.types.is_fixed_size_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{norm_type(t.field(i).type)}"
                         for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{norm_type(t.key_type)},{norm_type(t.item_type)}>"
    if pa.types.is_timestamp(t):
        return "timestamp"   # unit/tz handled by value compare; driver reads parquet logical type
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    return str(t)

def arrow_rows(tbl, names):
    cols = {n: tbl.column(n).to_pylist() for n in names}
    return [tuple(cols[n][i] for n in names) for i in range(tbl.num_rows)]

def norm_rows(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: str(t))
    return out

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    strict = "--lax-types" not in sys.argv
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:]) or None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        unknown = only - set(oracle)
        if unknown:
            # a typo'd filter must not read as a green gate
            print(f"ERROR: no such oracle queries: {sorted(unknown)}")
            sys.exit(2)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            dtbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1; continue
        try:
            stbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1; continue
        dnames, snames = sorted(dtbl.column_names), sorted(stbl.column_names)
        if dnames != snames:
            print(f"FAIL {name}: columns differ duck={dnames} spark={snames}")
            n_fail += 1; continue
        if strict:
            mism = []
            for c in dnames:
                dt = norm_type(dtbl.schema.field(c).type)
                st = norm_type(stbl.schema.field(c).type)
                if dt != st:
                    mism.append((c, dt, st))
            if mism:
                det = "; ".join(f"{c}: duck={d} spark={s}" for c, d, s in mism)
                print(f"FAIL {name}: TYPE mismatch — {det}")
                n_fail += 1; continue
        if dtbl.num_rows != stbl.num_rows:
            print(f"FAIL {name}: rowcount duck={dtbl.num_rows} spark={stbl.num_rows}")
            n_fail += 1; continue
        dr = norm_rows(dnames, arrow_rows(dtbl, dnames))
        sr = norm_rows(snames, arrow_rows(stbl, snames))
        if dr == sr:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(dr, sr)) if a != b][:3]
        print(f"FAIL {name}: {len([1 for a,b in zip(dr,sr) if a!=b])} differing rows; first: ")
        for i, a, b in bad:
            print(f"   row {i}: duck={a}")
            print(f"   row {i}: sprk={b}")
        n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracle) if not only else len(only)} total ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
