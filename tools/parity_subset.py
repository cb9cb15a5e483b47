"""Subset oracle-parity check: drive_entry's exact compare, named queries only.

    cd /tmp && python /root/repo/tools/parity_subset.py q1 q2 ... [--sf DIR]

Used when a round changes a handful of registered forms: re-verify just
those against DuckDB with the SAME typed hash the round driver uses,
without paying the ~35 min full drive.  Exit 0 = all named queries
match (rows-only queries must execute).
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import duckdb
from pyspark.sql import SparkSession

from drive_entry import TABLES, check_query


def main(argv: list[str]) -> int:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    names = argv
    if not names:
        print("usage: parity_subset.py <query> [<query> ...] [--sf DIR]")
        return 2

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("parity_subset")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_fail = 0
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            rows = df.collect()
            # shared verdict: drive_entry's exact compare, so subset
            # parity can never drift from the full drive
            line = check_query(name, df, rows, oracles, con)
            print(line, flush=True)
            if line.startswith("MISMATCH"):
                n_fail += 1
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc!r}"[:500], flush=True)
            n_fail += 1
    print(f"done: {n_fail} failures / {len(names)} queries", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
