"""Cross-engine type-parity audit: Spark output dtypes vs DuckDB oracle
output types for every oracled query.

The round-6 hash failures were a TYPE mismatch (DuckDB HUGEINT vs Spark
BIGINT) that value-level comparison masked — Python ``int == float``
equality passes while the driver's hasher, which renders typed values,
fails. This audit compares the two engines' output schemas by
hash-compatibility class (int / int128 / float / decimal / str / bool /
ts / date / bin / list) and exits 1 on any cross-class pair, catching
the next latent mismatch before a driver round does. The HUGEINT case
specifically is also guarded per-commit by tests/test_oracle_types.py;
this tool is the broader, slower sweep (constructs every Spark plan).

Usage::

    python tools/type_parity_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from churn_model_evaluation_platform_spark.session import get_spark  # noqa: E402
from churn_model_evaluation_platform_spark.sources.testdata import TABLES  # noqa: E402

_INT_NAMES = {"INT", "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "LONG"}


def bucket(t: str) -> str:
    """Hash-compatibility class of a type name (either engine's)."""
    t = t.upper()
    if "HUGEINT" in t or "INT128" in t:
        return "int128"
    if t in _INT_NAMES or any(
        x in t for x in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")
    ):
        return "int"
    if any(x in t for x in ("DOUBLE", "FLOAT", "REAL")):
        return "float"
    if "DECIMAL" in t:
        return "decimal"
    if any(x in t for x in ("VARCHAR", "STRING", "CHAR")):
        return "str"
    if "BOOL" in t:
        return "bool"
    if "TIMESTAMP" in t:
        return "ts"
    if "DATE" in t:
        return "date"
    if "BLOB" in t or "BINARY" in t:
        return "bin"
    if t.startswith(("LIST", "ARRAY")) or "[]" in t:
        return "list"
    return t


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = err = 0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        try:
            stypes = dict(qs[name](spark, sf_dir).dtypes)
            rel = con.sql(sql)
            otypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:
            print(f"ERR  {name}: {str(e).splitlines()[0][:100]}")
            err += 1
            continue
        for col, st in stypes.items():
            if col not in otypes:
                continue  # column-name mismatches are diffcheck's job
            if bucket(st) != bucket(otypes[col]):
                bad += 1
                print(
                    f"MISMATCH {name}.{col}: "
                    f"spark={st} duckdb={otypes[col]}"
                )
    print(f"\n{bad} type-class mismatches, {err} construction errors")
    return 1 if (bad or err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
