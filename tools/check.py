#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each SparkEntry query,
compare the Verify parquet dump against the oracle SQL run in DuckDB.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pathlib

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if v is None:
        return None
    if type(v).__module__ == "numpy":  # unwrap numpy scalars from the pandas path
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value hash: repr of float is fine, both sides are doubles
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v

def frame_rows(cols, rows):
    """columns sorted by name, then row-sort for order-insensitive compare"""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if pathlib.Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            # go through pandas like the driver does: DuckDB HUGEINT (SUM of
            # ints) becomes float64 here, so un-cast sums fail the hash gate
            odf = res.df()
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        pdir = pathlib.Path(f"{out_dir}/{name}")
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(str(pdir))
        scols = tbl.column_names
        srows = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        oc, orws = frame_rows(ocols, orows)
        sc, srws = frame_rows(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: schema mismatch spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(orws) != len(srws):
            print(f"FAIL {name}: rowcount spark={len(srws)} oracle={len(orws)}")
            n_fail += 1
            continue
        # driver hashes str(value): int 42 vs float 42.0 MISMATCH there even
        # though Python == says equal — compare types too (the r03
        # text_pack_bins escape: un-cast DuckDB HUGEINT -> float via pandas)
        def strict_ne(a, b):
            return a != b or any(type(x) is not type(y) for x, y in zip(a, b))
        bad = [(a, b) for a, b in zip(srws, orws) if strict_ne(a, b)]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srws)} differing rows; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srws)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
