#!/usr/bin/env python3
"""Static oracle-type guard — the q169 class, made a build-time error.

Usage: oracle_type_guard.py <sfDir> <oracle_sql.json>

Runs every declared oracle SQL through DuckDB's Arrow interface over
the sfDir tables and FAILS on any DECIMAL-family output column.
DuckDB silently promotes sum(BIGINT) (and windowed sums, and
BIGINT*BIGINT products in some shapes) to HUGEINT, which reaches
Arrow as decimal128(38,0); Spark emits int64 for the same plan, so
the driver's Arrow-typed hasher mismatches even when every value is
equal. That exact artifact cost rounds 11 AND 12 a red q169 row while
the repr()-based local gate kept passing. An oracle column that trips
this guard needs CAST(... AS BIGINT) (or AS DOUBLE) in the SQL — the
suite already carries 69 such CAST sites; this guard makes the
discipline mechanical.

Runs in seconds at sf0.001 — cheap enough for every gate run and for
the suite's OracleTypeGuardSpec.
"""
import sys, json
import duckdb
import pyarrow as pa

TABLES = ["lineitem", "orders", "customer", "supplier", "part",
          "nation", "region", "events", "documents", "embeddings"]


def has_decimal(t):
    """True if a decimal lurks ANYWHERE in the type tree — structs and
    nested lists included (a HUGEINT inside a struct output column is
    just as hash-visible to the driver as a top-level one)."""
    if pa.types.is_decimal(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return has_decimal(t.value_type)
    if pa.types.is_struct(t):
        return any(has_decimal(t.field(i).type) for i in range(t.num_fields))
    if pa.types.is_map(t):
        return has_decimal(t.key_type) or has_decimal(t.item_type)
    return False


def decimal_columns(schema):
    return [f"{f.name}:{f.type}" for f in schema if has_decimal(f.type)]


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    bad = {}
    errors = {}
    for q in sorted(oracle):
        try:
            schema = con.execute(oracle[q]).arrow().schema
        except Exception as e:
            errors[q] = str(e).splitlines()[0]
            continue
        decs = decimal_columns(schema)
        if decs:
            bad[q] = decs
    for q, decs in bad.items():
        print(f"DECIMAL {q}: {', '.join(decs)} — CAST to BIGINT/DOUBLE "
              "in the oracle SQL")
    for q, e in errors.items():
        print(f"ERROR   {q}: {e}")
    n = len(oracle)
    print(f"\n{n - len(bad) - len(errors)}/{n} clean, "
          f"{len(bad)} decimal-typed, {len(errors)} errored")
    return 1 if (bad or errors) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
