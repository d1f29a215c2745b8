"""Documents-only sf10: 500k docs = 10 outer replicas of the sf1
documents (themselves 10 perturbed replicas of sf0.1) for the dedup
decade probe. The outer perturbation rotates DIFFERENT character bands
('hjklm' by r mod 5, 'npqrs' by r div 5 — period 25 ≥ 10 replicas)
than the inner vowel/consonant rotation, so outer replicas are
pairwise distinct AND the inner near-dup structure is preserved:
planted pair counts scale linearly, measuring the engine, not the
data. Measurement rig only — not checked in (.gitignore /.scale/)."""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/repo/.scale/sf1/documents.parquet"
B1, B2 = "hjklm", "npqrs"


def _expr(r: int) -> str:
    b1 = B1[r % 5 :] + B1[: r % 5]
    b2 = B2[(r // 5) % 5 :] + B2[: (r // 5) % 5]
    src, dst = B1 + B2, b1 + b2
    return f"translate(text, '{src}{src.upper()}', '{dst}{dst.upper()}')"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/docs_sf10"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    parts = [
        f"SELECT doc_id + {r} * 10000000 AS doc_id, {_expr(r)} AS text,"
        f" lang, source, n_chars FROM read_parquet('{SRC}')"
        for r in range(10)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet'"
        " (FORMAT PARQUET)"
    )
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')").fetchone()[0]
    print("docs:", n)


if __name__ == "__main__":
    main()
