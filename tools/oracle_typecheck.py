#!/usr/bin/env python3
"""Static type audit of every oracle SQL — the HUGEINT tripwire.

The driver's correctness gate hashes VALUES AND TYPES. DuckDB widens
window/filtered sums over BIGINT to HUGEINT (int128), a type Spark
cannot emit — so an oracle that lets a window-sum column reach its
final SELECT uncast reads hash-red even when every value matches
bitwise (the round-6 x_corpus_curriculum/_pack/budget incident). The
repo's contract (SURVEY.md determinism rules) is CAST(... AS BIGINT)
at every such boundary; this script enforces it without running Spark:

    sbt -batch "runMain graft.tools.DumpOracle /tmp/oracle_sql.json"
    python3 tools/oracle_typecheck.py /tmp/oracle_sql.json [sfDir]

For each oracle entry it PREPAREs the query in DuckDB against the sf
parquet views and fails (exit 1) if any output column is HUGEINT /
UHUGEINT, or if the SQL no longer parses. INTEGER columns are fine —
they match Spark's IntegerType in the driver's hash.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BAD_TYPES = {"HUGEINT", "UHUGEINT"}


def main():
    oracle_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle_sql.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
        except Exception as e:
            bad += 1
            print(f"FAIL {name}: does not parse/bind: {str(e)[:160]}")
            continue
        hits = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                if str(t) in BAD_TYPES]
        if hits:
            bad += 1
            print(f"FAIL {name}: un-Sparkable output types {hits} — "
                  "wrap in CAST(... AS BIGINT)")
    print(f"{len(oracle) - bad}/{len(oracle)} oracle queries type-clean")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
