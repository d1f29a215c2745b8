"""Synthesize an sf1-scale dataset from the driver's sf0.1 tables.

The driver ships sf{0.001,0.01,0.1} only; scale-proofing the engine
one decade further (VERDICT r2 #5) needs an sf1 that does not exist —
so this tool replicates sf0.1 R times (default 10) with key shifts
that PRESERVE join structure (every FK lands in its own replica, so
join/agg outputs scale linearly by construction) and per-replica
content perturbations that keep the dedup/similarity workloads honest:

- documents.text: replica r > 0 passes through a per-replica character
  substitution (vowel rotation) — every 30-char shingle changes, so
  cross-replica Jaccard ~ 0 and near-dup pair counts scale linearly
  (naive text copies would make every doc a 10-way near-dup and blow
  the pair output up quadratically, measuring the data, not the
  engine).
- embeddings.embedding: replica r rotates the vector by r positions —
  norms preserved, cross-replica cosine structure decorrelated.
- nation/region stay fixed (real TPC-H dims don't grow with SF).

Usage: python tools/make_scale_data.py [out_dir] [replicas]
Output is NOT checked in (see .gitignore) — it is a measurement rig,
not test data; correctness gates stay on the driver's own parquet.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
VOWELS = "aeiou"
CONS = "bcdfg"


def _sub_expr(col: str, r: int) -> str:
    """Per-replica deterministic character substitution — changes every
    shingle, preserves length and word/whitespace structure (token
    counts, quality metrics keep the same distribution).

    TWO independent rotations (vowels by r mod 5, the b-g consonant
    band by r div 5) give period 25, so every replica pair differs for
    any replicas <= 25. A single 5-letter rotation has period 5:
    replicas 5..9 would be byte-identical twins of 0..4, flooding the
    dedup measurements with spurious exact-dup pairs (caught by round-3
    code review)."""
    vrot = VOWELS[r % 5 :] + VOWELS[: r % 5]
    crot = CONS[(r // 5) % 5 :] + CONS[: (r // 5) % 5]
    src = VOWELS + CONS
    dst = vrot + crot
    return (
        f"translate({col}, '{src}{src.upper()}', "
        f"'{dst}{dst.upper()}')"
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SRC}/{t}.parquet')"
        )

    def write(name: str, union_sql: str) -> None:
        con.execute(
            f"COPY ({union_sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n}")

    # fixed dims: copy verbatim
    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied")

    # key strides larger than any source key keep replicas disjoint
    C, O, P, S, E, U, D, V = (10**6, 10**7, 10**6, 10**5, 10**7, 10**6, 10**6, 10**6)
    write("customer", " UNION ALL ".join(
        f"SELECT c_custkey + {r * C} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM customer" for r in range(reps)))
    write("supplier", " UNION ALL ".join(
        f"SELECT s_suppkey + {r * S} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM supplier" for r in range(reps)))
    write("part", " UNION ALL ".join(
        f"SELECT p_partkey + {r * P} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM part" for r in range(reps)))
    write("orders", " UNION ALL ".join(
        f"SELECT o_orderkey + {r * O} AS o_orderkey, "
        f"o_custkey + {r * C} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM orders" for r in range(reps)))
    write("lineitem", " UNION ALL ".join(
        f"SELECT l_orderkey + {r * O} AS l_orderkey, "
        f"l_partkey + {r * P} AS l_partkey, "
        f"l_suppkey + {r * S} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM lineitem" for r in range(reps)))
    write("events", " UNION ALL ".join(
        f"SELECT event_id + {r * E} AS event_id, ts, "
        f"user_id + {r * U} AS user_id, event_type, value, props "
        f"FROM events" for r in range(reps)))
    write("documents", " UNION ALL ".join(
        f"SELECT doc_id + {r * D} AS doc_id, "
        + (f"{_sub_expr('text', r)} AS text, " if r else "text, ")
        + "lang, source, n_chars FROM documents" for r in range(reps)))
    write("embeddings", " UNION ALL ".join(
        f"SELECT vec_id + {r * V} AS vec_id, "
        + (
            f"list_concat(embedding[{r + 1}:], embedding[1:{r}]) AS embedding, "
            if r
            else "embedding, "
        )
        + "label FROM embeddings" for r in range(reps)))


if __name__ == "__main__":
    main()
