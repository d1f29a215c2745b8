"""Embeddings-only sf10: 200k vectors = 10 outer replicas of the sf1
embeddings (ids shifted, vectors cyclically rotated per replica —
norms preserved, cross-replica cosine structure decorrelated) for the
ANN decade probe recorded in BASELINE.md. Measurement rig only — not
checked in (.gitignore /.scale/)."""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/repo/.scale/sf1/embeddings.parquet"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/vecs_sf10"
    os.makedirs(out, exist_ok=True)
    parts = [
        f"SELECT vec_id + {r} * 10000000 AS vec_id,"
        f" list_concat(embedding[{r + 1}:], embedding[1:{r}]) AS embedding,"
        f" label FROM read_parquet('{SRC}')"
        for r in range(10)
    ]
    con = duckdb.connect()
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/embeddings.parquet'"
        " (FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')"
    ).fetchone()[0]
    print("vectors:", n)


if __name__ == "__main__":
    main()
