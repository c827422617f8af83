#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL from
oracle_sql.json in DuckDB over the sf tables, and compare against the
Spark-written parquet under outDir/<name>/. Exact value compare after
sorting columns by name (rows compared in emitted order AND as sorted
multisets, so we see which discipline holds).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # normalize python values for comparison
    import decimal, datetime, math
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, decimal.Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, list) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    if type(v).__module__ == "numpy":
        return norm(v.item())
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        got = con.execute(
            "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
        ).fetchdf() if files else None
        if name not in oracles:
            nrows = 0 if got is None else len(got)
            print(f"{name:32s} NO-ORACLE rows={nrows}")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:32s} ORACLE-ERROR {e}")
            n_fail += 1
            continue
        # sort columns by name (driver semantics)
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"{name:32s} SCHEMA-MISMATCH got={gcols} exp={ecols}")
            n_fail += 1
            continue
        g = got[gcols]; e = exp[ecols]
        if len(g) != len(e):
            print(f"{name:32s} ROWCOUNT got={len(g)} exp={len(e)}")
            n_fail += 1
            continue
        grows = [tuple(norm(v) for v in r) for r in g.itertuples(index=False)]
        erows = [tuple(norm(v) for v in r) for r in e.itertuples(index=False)]
        ordered = grows == erows
        multiset = sorted(map(repr, grows)) == sorted(map(repr, erows))
        if ordered:
            print(f"{name:32s} PASS rows={len(g)}")
            n_pass += 1
        elif multiset:
            print(f"{name:32s} PASS-UNORDERED rows={len(g)}")
            n_pass += 1
        else:
            n_fail += 1
            diff = [i for i, (a, b) in enumerate(zip(grows, erows)) if a != b][:3]
            print(f"{name:32s} VALUE-MISMATCH rows={len(g)} first_diffs={diff}")
            for i in diff[:2]:
                print(f"    got[{i}]={grows[i]}")
                print(f"    exp[{i}]={erows[i]}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
