#!/usr/bin/env python3
"""Dev-loop pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet dir with an entry in
oracle_sql.json: run the SQL in DuckDB over views on <sfDir>/*.parquet,
sort columns by name, and compare cell-by-cell (exact; floats must be
bit-identical — that is the bar the engine targets).
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        duck = con.execute(sql).fetch_arrow_table()
        mine = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        fails += 1
        continue
    dcols, mcols = sorted(duck.column_names), sorted(mine.column_names)
    if dcols != mcols:
        print(f"FAIL {name}: columns duck={dcols} mine={mcols}")
        fails += 1
        continue
    if duck.num_rows != mine.num_rows:
        print(f"FAIL {name}: rows duck={duck.num_rows} mine={mine.num_rows}")
        fails += 1
        continue
    # Type-aware gate (VERDICT r9 #2): the driver's hash is type-sensitive,
    # so int64 vs decimal128(38,0) (DuckDB widening SUM(BIGINT) to HUGEINT)
    # must fail HERE, before the driver sees it. to_pylist() erases that
    # distinction, so compare the arrow schema types explicitly first.
    # Equivalence classes mirroring the driver's observed hash behavior:
    # integer WIDTHS are interchangeable (q12's int64-vs-int32 is green on
    # the driver board) but int-vs-decimal128 is NOT (the kmeans HUGEINT
    # red rows), and neither is int-vs-float or anything-vs-string.
    ints = {"int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"}
    def tclass(t):
        s = str(t)
        if s in ints: return "int"
        if s in ("string", "large_string"): return "string"
        return s
    tbad = []
    for c in dcols:
        dt = duck.schema.field(c).type
        mt = mine.schema.field(c).type
        if tclass(dt) != tclass(mt):
            tbad.append((c, dt, mt))
    if tbad:
        c, dt, mt = tbad[0]
        print(f"FAIL {name}: TYPE col={c} duck={dt} mine={mt} (+{len(tbad)-1} more)")
        fails += 1
        continue
    bad = []
    for c in dcols:
        dv = duck.column(c).to_pylist()
        mv = mine.column(c).to_pylist()
        for i, (a, b) in enumerate(zip(dv, mv)):
            eq = (a == b) or (a is None and b is None) or \
                 (isinstance(a, float) and isinstance(b, float)
                  and math.isnan(a) and math.isnan(b))
            if not eq:
                bad.append((c, i, a, b))
                break
    if bad:
        c, i, a, b = bad[0]
        print(f"FAIL {name}: col={c} row={i} duck={a!r} mine={b!r} (+{len(bad)-1} more cols)")
        fails += 1
    else:
        print(f"ok   {name}: {duck.num_rows} rows x {len(dcols)} cols")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
