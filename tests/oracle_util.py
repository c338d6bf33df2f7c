"""ONE DuckDB oracle-runner for fixture-based adversarial tests
(round-5 and round-6 files both use it — duplicated copies had
already diverged on directory-vs-file parquet handling, the exact
drift CLAUDE.md's shared-fragment rule exists to prevent)."""
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings".split()
)


def oracle_df(sf, oracle_sql):
    """Run an oracle SQL string against the parquet tables under sf
    (handles both Spark-written directories and bare files)."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con.execute(oracle_sql).df()
