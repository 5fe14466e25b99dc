#!/usr/bin/env python3
"""Row-level diff of one query's Verify dump against its DuckDB oracle.

Usage: python3 tools/diffq.py <sfDir> <verifyOutDir> <queryName>

Unlike tools/check.py (pass/fail), this prints WHICH rows differ,
column by column — the tool the q281 hash-only reds need.
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v

def main(sf_dir, out_dir, name):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    sql = oracles[name]
    oracle = con.execute(sql)
    ocols = [d[0] for d in oracle.description]
    orows = oracle.fetchall()
    spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
    got = con.execute(f"SELECT * FROM read_parquet({spark_glob!r})")
    gcols = [d[0] for d in got.description]
    grows = got.fetchall()
    oidx = [i for _, i in sorted((c, i) for i, c in enumerate(ocols))]
    gidx = [i for _, i in sorted((c, i) for i, c in enumerate(gcols))]
    cols = sorted(ocols)
    if sorted(ocols) != sorted(gcols):
        print(f"SCHEMA: oracle={sorted(ocols)} spark={sorted(gcols)}")
        return 1
    print(f"rows: oracle={len(orows)} spark={len(grows)}")
    ndiff = 0
    for i in range(max(len(orows), len(grows))):
        o = tuple(norm(orows[i][j]) for j in oidx) if i < len(orows) else None
        g = tuple(norm(grows[i][j]) for j in gidx) if i < len(grows) else None
        if o != g:
            ndiff += 1
            if ndiff <= 20:
                print(f"row {i}:")
                for c, ov, gv in zip(cols, o or [], g or []):
                    mark = "  " if norm(ov) == norm(gv) else "!="
                    print(f"  {mark} {c}: oracle={ov} spark={gv}")
    print(f"{'DIFF' if ndiff else 'MATCH'} {name}: {ndiff} differing rows")
    return 1 if ndiff else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
