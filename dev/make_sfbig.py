#!/usr/bin/env python3
"""Builds the 20x probe dataset at /tmp/sfbig (SCALE.md protocol).

documents / embeddings / lineitem / orders / events are replicated 20x
with SHIFTED primary keys (doc_id, vec_id, l_orderkey, o_orderkey,
event_id), so every document/vector becomes a member of an exact-
duplicate group of 20 — deliberately adversarial for dedup (each
original row contributes C(20,2)=190 true duplicate pairs; output grows
~400x, not 20x). Foreign keys into the DIMENSION tables (l_partkey,
l_suppkey, o_custkey, user_id) are NOT shifted, so dimension joins stay
valid and the derived co-purchase graph keeps |V| while its fact-side
pair volume grows 20x. Dimensions are symlinked unchanged.

Usage: python3 dev/make_sfbig.py [srcDir] [outDir] [reps]

reps=100 builds the 100x probe (/tmp/sfbig100: 60 M lineitem rows,
500 k docs, 200 k vectors) — same shifted-block protocol, one decade
past the standing 20x probe.
"""
import os, sys, shutil
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20

shutil.rmtree(out, ignore_errors=True)
os.makedirs(out)

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

# (table, shifted key columns). The shift is rep * (max(key)+1) per key,
# keeping each replica's keys a disjoint block — group-bys and joins on
# the shifted key behave like 20 independent copies of the original.
replicated = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
}

for tbl, keys in replicated.items():
    path = f"{src}/{tbl}.parquet"
    shifts = {k: con.execute(
        f"SELECT max({k})+1 FROM read_parquet('{path}')").fetchone()[0]
        for k in keys}
    cols = con.execute(f"SELECT * FROM read_parquet('{path}') LIMIT 0").description
    names = [c[0] for c in cols]
    sel = ", ".join(
        f"{n} + r.rep * {shifts[n]} AS {n}" if n in shifts else n
        for n in names)
    con.execute(f"""
        COPY (SELECT {sel}
              FROM read_parquet('{path}'),
                   (SELECT unnest(range({REPS})) AS rep) r)
        TO '{out}/{tbl}.parquet' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{tbl}.parquet')").fetchone()[0]
    print(f"{tbl}: {n} rows (x{REPS}, shifted {keys})")

for tbl in ["customer", "nation", "part", "region", "supplier"]:
    os.symlink(f"{src}/{tbl}.parquet", f"{out}/{tbl}.parquet")
    print(f"{tbl}: symlinked")
