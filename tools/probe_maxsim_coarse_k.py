"""MaxSim IVF coarse-k probe (judge ask, round 5): measure the
recall/latency curve of IVF-pruned late interaction at PRODUCTION-shaped
coarse codebook sizes on the 200k-vector decade rig, replacing the r4
"~interactive at k_coarse=1024" extrapolation with measured points.

Rig: .scale/vecs_sf10/embeddings.parquet (200k × 64-d; 25k multi-vector
groups of 8, every 20th group a query with 2 query vectors — the same
MAXSIM_* literals as plans/similarity). For each (k_coarse, nprobe)
config: train a spherical k-means codebook on the 25k representative
vectors (driver-side numpy — offline codebook training, exactly what a
100 TB deployment does on a sample), run the engine's parameterized
``operators.similarity.maxsim_ivf_topk``, record wall time (min of 2
noop-forced runs) and recall@k against exact numpy ground truth.

Usage: python tools/probe_maxsim_coarse_k.py [vec_dir] [k,k,...]
Prints one JSON line per config; paste the table into BASELINE.md.
Measurement rig only — not part of the engine or the driver contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

GROUP, QMOD, QVECS, TOPK = 8, 20, 2, 3  # MAXSIM_* literals


def load_matrix(vec_dir: str):
    import duckdb

    con = duckdb.connect()
    tbl = con.execute(
        "SELECT vec_id, embedding FROM read_parquet(?) ORDER BY vec_id",
        [os.path.join(vec_dir, "embeddings.parquet")],
    ).fetch_arrow_table()
    ids = tbl["vec_id"].to_numpy()
    V = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    return ids, V


def spherical_kmeans(X: np.ndarray, k: int, iters: int = 15, seed: int = 0):
    """Cosine k-means on unit-normalized rows; deterministic seed."""
    rng = np.random.default_rng(seed)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn[rng.choice(len(Xn), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / (np.linalg.norm(c) or 1.0)
            else:  # dead cluster: reseed to a random point
                C[j] = Xn[rng.integers(len(Xn))]
    return C


def ground_truth(ids: np.ndarray, V: np.ndarray):
    """Exact MaxSim top-k per query group (numpy, chunked)."""
    grp = ids // GROUP
    order = np.argsort(ids, kind="stable")
    ids, V, grp = ids[order], V[order], grp[order]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    # groups are contiguous runs of sorted vec_id but may be ragged at
    # the tail — segment-max via reduceat over run boundaries
    group_ids, starts = np.unique(grp, return_index=True)
    qmask = (grp % QMOD == 0) & (ids % GROUP < QVECS)
    Q, qgrp = Vn[qmask], grp[qmask]
    truth = {}
    for lo in range(0, len(Q), 500):
        sims = Q[lo : lo + 500] @ Vn.T  # (b, N)
        per_group = np.maximum.reduceat(sims, starts, axis=1)
        for row, g in zip(per_group, qgrp[lo : lo + 500]):
            acc = truth.setdefault(int(g), np.zeros(len(group_ids), dtype=np.float64))
            acc += row
    out = {}
    for g, maxsim in truth.items():
        mask = group_ids != g
        cand = np.nonzero(mask)[0]
        # top-k by (maxsim desc, doc_group asc) — the engine's tie-break
        sel = cand[np.lexsort((group_ids[cand], -maxsim[cand]))[:TOPK]]
        out[g] = {int(group_ids[i]) for i in sel}
    return out


def main() -> None:
    vec_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/vecs_sf10"
    ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else [64, 128, 256])]

    ids, V = load_matrix(vec_dir)
    reps = V[ids % GROUP == 0]
    print(f"# {len(ids)} vectors, {len(reps)} groups", file=sys.stderr)
    t0 = time.perf_counter()
    truth = ground_truth(ids, V)
    print(f"# ground truth in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    from pyspark.sql import SparkSession

    from etl_extractor_spark.operators.similarity import maxsim_ivf_topk

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    vectors = spark.read.parquet(os.path.join(vec_dir, "embeddings.parquet"))

    for k in ks:
        C = spherical_kmeans(reps, k)
        for nprobe in (1, 4):
            df = maxsim_ivf_topk(
                vectors, C.tolist(), group=GROUP, qmod=QMOD,
                qvecs=QVECS, k=TOPK, nprobe=nprobe,
            )
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            got: dict = {}
            for r in df.collect():
                got.setdefault(r.query_group, set()).add(r.doc_group)
            hits = sum(len(got.get(g, set()) & t) for g, t in truth.items())
            recall = hits / (TOPK * len(truth))
            print(json.dumps({
                "k_coarse": k, "nprobe": nprobe,
                "wall_sec": round(best, 1), "recall_at_3": round(recall, 4),
                "queries": len(truth), "vectors": len(ids),
            }), flush=True)


if __name__ == "__main__":
    main()
