#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB against views
over the sfDir tables, then compare row count, schema (column names),
a hash over column-name-sorted, row-sorted values, AND the Arrow-level
column types of both sides.

The type check exists because of q169 (rounds 11-12): DuckDB types a
windowed sum(BIGINT) as HUGEINT, which reaches Arrow as decimal128 —
the values matched row-for-row but the driver's (Arrow-typed) hasher
failed while this tool's old repr(fetchall()) canonicalization
flattened HUGEINT to a plain int and passed. Two rules now:
  1. Any DECIMAL-family Arrow column on EITHER side is an outright
     FAIL (`TYPE` line) — Spark never emits decimal in this suite, so
     a decimal oracle column is always the DuckDB HUGEINT trap and
     needs a CAST(... AS BIGINT) in the oracle SQL.
  2. Coarse type families (int / float / str / bool / date /
     timestamp / binary / list<...> / struct) must agree per column
     between the Spark parquet schema and the oracle's Arrow schema.
     Families are coarse on purpose: int32-vs-int64 width differences
     are value-identical under both hashers and would only add noise.
     Empirical proof (round 13): exactly six queries carry an
     int32(Spark)-vs-int64(DuckDB) output column (q54 yr, q59 day,
     q60 dist, q121 bucket, q136 dim, q137 yr) and ALL six passed the
     driver's round-12 hash gate — the driver canonicalizes integer
     widths; only the decimal class is hash-visible.
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["lineitem", "orders", "customer", "supplier", "part",
          "nation", "region", "events", "documents", "embeddings"]


def canon(rows, cols):
    # sort columns by name, then rows lexicographically (stringified)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(repr(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def arrow_family(t):
    """Coarse, hash-relevant canonical family for an Arrow type.
    Structs recurse per field (a decimal INSIDE a struct column is
    just as hash-visible as a top-level one and must surface as a
    DECIMAL-bearing family, not be flattened to an opaque 'struct')."""
    if pa.types.is_decimal(t):
        return "DECIMAL"  # always a finding — see module docstring
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return "list<" + arrow_family(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(
            f"{t.field(i).name}:{arrow_family(t.field(i).type)}"
            for i in range(t.num_fields)) + ">"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def type_problems(spark_schema, oracle_schema):
    """TYPE findings between a Spark parquet schema and an oracle
    Arrow schema. Compared by column NAME (the hashers sort by name).
    Returns a list of problem strings (empty = clean)."""
    probs = []
    # multidict, not dict: a {name: family} dict would silently keep
    # only the LAST instance of a duplicate-named column — the exact
    # pitfall the rows path's zip-of-arrays comment warns about — and
    # a dup whose second instance has a divergent type would be
    # type-checked against the wrong family. Dup names are also a
    # finding in their own right: the hashers sort columns by name, so
    # two same-named columns have no stable cross-engine pairing.
    def families(schema):
        fams = {}
        for f in schema:
            fams.setdefault(f.name, []).append(arrow_family(f.type))
        return fams
    sfam = families(spark_schema)
    ofam = families(oracle_schema)
    for name in sorted(set(sfam) | set(ofam)):
        ss, oo = sfam.get(name, []), ofam.get(name, [])
        if len(ss) > 1 or len(oo) > 1:
            probs.append(
                f"TYPE {name}: duplicate column name "
                f"(spark×{len(ss)}={ss} duck×{len(oo)}={oo}) — "
                "name-sorted hashing cannot pair these; alias them apart")
            continue
        s, o = (ss[0] if ss else None), (oo[0] if oo else None)
        if (s and "DECIMAL" in s) or (o and "DECIMAL" in o):
            probs.append(
                f"TYPE {name}: spark={s} duck={o} — decimal/hugeint "
                "reaches Arrow as decimal128; CAST the oracle column "
                "to BIGINT/DOUBLE")
        elif s is not None and o is not None and s != o \
                and "null" not in (s, o):
            # a pure-null column (all-NULL at this sf) has no family
            probs.append(f"TYPE {name}: spark={s} duck={o}")
    return probs


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for q in qdirs:
        files = glob.glob(os.path.join(out_dir, q, "*.parquet"))
        if not files:
            print(f"FAIL  {q}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{files[0]}'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if q not in oracle:
            status = "ROWS " if grows else "EMPTY"
            if not grows: n_fail += 1
            else: n_rowsonly += 1
            print(f"{status} {q}: rows-only check, {len(grows)} rows")
            continue
        try:
            oracle_tbl = con.execute(oracle[q]).arrow()
            ecols = oracle_tbl.column_names
            # per-column arrays zipped into rows — NOT to_pylist(),
            # whose dict rows silently collapse duplicate-named output
            # columns and then crash canon() on the arity mismatch
            earrs = [oracle_tbl.column(i).to_pylist()
                     for i in range(oracle_tbl.num_columns)]
            erows = list(zip(*earrs)) if earrs else []
        except Exception as e:
            print(f"FAIL  {q}: oracle SQL error: {e}"); n_fail += 1; continue
        problems = []
        if sorted(gcols) != sorted(ecols):
            problems.append(f"schema {sorted(gcols)} != {sorted(ecols)}")
        if len(grows) != len(erows):
            problems.append(f"rowcount {len(grows)} != {len(erows)}")
        # Arrow-level type fidelity (the driver's hasher is Arrow-typed)
        try:
            spark_schema = pq.read_table(os.path.join(out_dir, q)).schema
            problems.extend(type_problems(spark_schema, oracle_tbl.schema))
        except Exception as e:
            problems.append(f"TYPE check unreadable: {e}")
        if not problems:
            cg, ce = canon(grows, gcols), canon(erows, ecols)
            if cg != ce:
                diffs = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:3]
                problems.append("values differ, first diffs: " + "; ".join(
                    f"spark={cg[i]} duck={ce[i]}" for i in diffs))
        if problems:
            print(f"FAIL  {q}: " + " | ".join(problems)); n_fail += 1
        else:
            print(f"PASS  {q}: {len(grows)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
