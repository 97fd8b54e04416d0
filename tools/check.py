#!/usr/bin/env python3
"""Local oracle checker mirroring the driver's compare (Verify output vs
DuckDB). Usage: check.py <sfDir> <verifyOutDir> [query ...]

For each query dir under outDir: read the Spark-written parquet (order
preserved — Verify coalesces to 1 file), run the oracle SQL from
oracle_sql.json in DuckDB against the same sf tables, sort columns by
name, compare cell-by-cell. Exact match expected; floats reported with
the max abs diff when unequal."""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    no_oracle = []
    for name in sorted(os.listdir(outdir)):
        resdir = os.path.join(outdir, name)
        if not os.path.isdir(resdir):
            continue
        if only and name not in only:
            continue
        if name not in oracle:
            no_oracle.append(name)
            continue
        try:
            got = con.sql(f"SELECT * FROM '{resdir}/*.parquet'")
            gcols = got.columns
            grows = got.fetchall()
            want = con.sql(oracle[name])
            wcols = want.columns
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(wcols)}")
            n_fail += 1
            continue
        gidx = [gcols.index(c) for c in sorted(gcols)]
        widx = [wcols.index(c) for c in sorted(wcols)]
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}")
            n_fail += 1
            continue
        bad = None
        maxfd = 0.0
        for i, (gr, wr) in enumerate(zip(grows, wrows)):
            for j, (gi, wi) in enumerate(zip(gidx, widx)):
                a, b = gr[gi], wr[wi]
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    maxfd = max(maxfd, abs(a - b))
                if bad is None:
                    bad = (i, sorted(gcols)[j], a, b)
        if bad:
            i, c, a, b = bad
            extra = f" maxFloatDiff={maxfd:.3e}" if maxfd else ""
            print(f"FAIL {name}: first diff row {i} col {c}: spark={a!r} oracle={b!r}{extra}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    if no_oracle:
        print(f"no-oracle (rows-only): {', '.join(no_oracle)}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
