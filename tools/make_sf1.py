"""Derive an sf1.0 dataset from the driver's sf0.1 parquet.

The driver generates testdata only at sf ∈ {0.001, 0.01, 0.1}
(TESTDATA.md); VERDICT r7 missing-#2 asks for ONE order-of-magnitude
scale point so "scales linearly" claims become measured numbers. This
script builds it honestly and reproducibly: each table becomes 10
DISJOINT replicas of its sf0.1 rows, with every entity-key column
offset by ``replica × (max_key + 1)`` so

- volume and entity count both grow 10× (no artificial cross-replica
  duplicate structure: dedup/self-join entries scale on real
  within-replica structure, 10 independent shards of it),
- intra-replica FK joins stay consistent (o_custkey tracks c_custkey,
  l_orderkey tracks o_orderkey, ...),
- tiny dimension tables (region, nation) are copied as-is and FK
  columns into them are NOT offset — they stay valid dimensions.

Run: ``python tools/make_sf1.py [out_dir]`` (default /tmp/sf1).
DuckDB does the rewrite — one statement per table, no Spark session.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: key columns to offset, per table (columns referencing region/nation
#: deliberately absent)
OFFSETS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_AS_IS = ["region", "nation"]
REPLICAS = 10


def main(out_dir: str = "/tmp/sf1") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT range AS r FROM range({REPLICAS})")
    for t in COPY_AS_IS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")
        print(f"{t}: copied")
    for t, keys in OFFSETS.items():
        src = f"{SRC}/{t}.parquet"
        cols = con.sql(f"SELECT * FROM read_parquet('{src}') LIMIT 0").columns
        spans = {
            k: con.sql(
                f"SELECT max({k}) + 1 FROM read_parquet('{src}')"
            ).fetchone()[0]
            for k in keys
        }
        sel = ", ".join(
            f"CAST(t.{c} + reps.r * {spans[c]} AS BIGINT) AS {c}"
            if c in keys
            else f"t.{c}"
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}') t CROSS JOIN reps"
            f" ORDER BY reps.r) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows (keys offset: {keys})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
