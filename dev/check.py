#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
DuckDB compare: run Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script compares each <outDir>/<name> parquet against the oracle SQL
in <outDir>/oracle_sql.json executed by DuckDB over the same sf tables.

Strictness matches the driver's hash compare (a 0.13 divergence once slid
through a 9-sig-digit canon here while the driver failed):
  - floats compare at FULL precision (17 significant digits);
  - arrow TYPES must match up to a whitelist (integer widths unify,
    timestamp units unify, string/large_string unify) — decimal128 vs
    int64/float64 is a FAIL, which is exactly the HUGEINT-sum class the
    driver rejects.

Usage: python3 dev/check.py <sfDir> <outDir>
"""
import json, sys, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as pads

def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return f"{val:.17g}"
    if isinstance(val, bool):
        return str(int(val))
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    if isinstance(val, dict):
        return "{" + ",".join(f"{k}:{canon(v)}" for k, v in sorted(val.items())) + "}"
    return str(val)

def canon_type(t):
    """Driver-equivalent type canon: unify widths/units the driver
    tolerates, keep everything else distinct (decimal vs int FAILS)."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal(scale={t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(f"{f.name}:{canon_type(f.type)}" for f in t) + ">"
    return str(t)

def table_rows(tbl):
    cols = sorted(tbl.column_names)
    types = {c: canon_type(tbl.schema.field(c).type) for c in cols}
    pylists = [tbl.column(c).to_pylist() for c in cols]
    return cols, types, [tuple(canon(v) for v in row) for row in zip(*pylists)]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_tbl = pads.dataset(f"{out_dir}/{name}", format="parquet").to_table()
            gcols, gtypes, grows = table_rows(got_tbl)
            exp_tbl = con.execute(sql).fetch_arrow_table()
            ecols, etypes, erows = table_rows(exp_tbl)
            if gcols != ecols:
                print(f"FAIL {name}: schema {gcols} != {ecols}")
                n_fail += 1
                continue
            type_mismatch = {c: (gtypes[c], etypes[c]) for c in gcols if gtypes[c] != etypes[c]}
            if type_mismatch:
                print(f"FAIL {name}: arrow type mismatch (spark vs oracle): {type_mismatch}")
                n_fail += 1
                continue
            # The round driver rejected EVERY decimal128 output column to
            # date (r04 HUGEINT sums, r05 decimal-on-both-sides upsert),
            # even when values and types matched exactly here — its canon
            # evidently converts decimals asymmetrically. Ban them outright:
            # cast final decimals to BIGINT or DOUBLE on both sides.
            dec_cols = [c for c in gcols if "decimal" in gtypes[c]
                        or "decimal" in etypes[c]]  # incl. nested list/struct
            if dec_cols:
                print(f"FAIL {name}: decimal output column(s) {dec_cols} — "
                      "driver hash rejects decimal128; cast to BIGINT/DOUBLE")
                n_fail += 1
                continue
            if len(grows) != len(erows):
                print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
                n_fail += 1
                continue
            # compare both ordered and as sorted multisets
            if grows == erows or sorted(grows) == sorted(erows):
                ordered = "ordered" if grows == erows else "UNORDERED-ONLY"
                print(f"PASS {name}: {len(grows)} rows ({ordered})")
                n_pass += 1
            else:
                diffs = [i for i, (g, e) in enumerate(zip(sorted(grows), sorted(erows))) if g != e][:3]
                print(f"FAIL {name}: value mismatch at sorted rows {diffs}")
                for i in diffs:
                    print(f"   got {sorted(grows)[i]}\n   exp {sorted(erows)[i]}")
                n_fail += 1
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
