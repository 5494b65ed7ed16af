"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, then compares
row count, column set, and order-insensitive values (exact for
ints/strings, 4 dp for floats — stricter than a hash mismatch report
because it prints the first differing rows).

Usage: python scripts/check_contract.py [sf_dir] [q1,q2,...]
(the optional second arg restricts to a comma-separated query subset)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # unify int widths (incl. DuckDB HUGEINT arriving as object/float)
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from word_sketch_lucene_spark.session import get_spark

    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"  {name:28} rows={len(sdf):7}  (rows-only check: no oracle)")
            continue
        odf = con.execute(oracles[name]).df()
        status = []
        if len(sdf) != len(odf):
            status.append(f"ROWS {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            status.append(f"COLS {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not status:
            a, b = normalize(sdf), normalize(odf)
            try:
                # exact — the driver hashes raw values, so a 1-ulp float
                # disagreement is a real failure, not noise
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                status.append("VALUES differ")
                print(f"FAIL {name}: {str(e)[:300]}")
                merged = a.compare(b) if a.shape == b.shape else None
                if merged is not None and not merged.empty:
                    print(merged.head(5))
        if status:
            failures += 1
            print(f"FAIL {name:26} {'; '.join(status)}")
        else:
            print(f"  ok {name:28} rows={len(sdf):7}")
    spark.stop()
    print(f"\n{len(qs) - failures}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None))
