#!/usr/bin/env python
"""nlist ∝ √N octave for IVF-routed bitext mining (round-8 verdict
item 4).

The registered `bitext_margin_mining_ivf` routes through the fixture's
FIXED 10 IVF labels (documented caveat, similarity.py `_ivf_assign`
docstring): its corpus-linearity evidence therefore rests on cells
that grow linearly with the corpus. A real IVF index grows nlist with
the corpus (the FAISS rule of thumb nlist ≈ √N), which keeps cells at
~√N members. This octave runs the honest experiment:

- corpus  = sf0.1 embeddings (2,000 × 64) × m decorrelated variants
  (the scale_experiment roll+sign discipline; copies=1 so every vector
  is distinct), m ∈ (10, 40) → N = 20k / 80k;
- nlist   = round(√N) (141 / 283), seeded as label = vec_id % nlist —
  per-label mean centroids exactly like the engine's `_ivf_centroids`
  coarse-quantizer training, then `_ivf_assign` re-routes every vector
  to its nearest centroid;
- engine  = `_bitext_ivf_pairs` → `_bitext_margin_stages`, the
  registered query's exact code path on the relabeled frame;
- checks  = (a) emitted candidate volume: the in-kernel top-K
  reduction's K·N bound must hold as cells SHRINK (≤ 2·BM_K·N rows —
  ∝ N, the verdict's "candidate volume measured ∝ N"); (b) in-kernel
  matmul volume Σ|Aᵢ|·|Bᵢ| ≈ N²/(4·nlist) = N^1.5/4 — the honest scan
  cost a √N-cell index pays, reported, not hidden; (c) the mined
  output hash-matches a FULL independent numpy replay of the entire
  routed pipeline (centroids → routing → in-cell top-K union →
  margins → mutual matching) at BOTH scales — the oracle role, since
  the registered DuckDB oracle is bound to the fixture's label column.

Prints one JSON line per multiplier.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
MULTS = (10, 40)


def build_corpus(m: int, out_dir: str) -> int:
    """m decorrelated variants of the base embeddings (scale_experiment
    roll+sign; copies=1). Returns N."""
    import pandas as pd
    import pyarrow.parquet as pq

    emb = pq.read_table(os.path.join(BASE, "embeddings.parquet")).to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
    out = []
    for v in range(m):
        mm = mat.copy()
        if v > 0:
            mm = np.roll(mm, shift=v * 7, axis=1)
            sgn = np.array(
                [
                    1.0
                    if int(hashlib.md5(f"esgn:{v}:{d}".encode()).hexdigest()[:2], 16)
                    < 128
                    else -1.0
                    for d in range(mm.shape[1])
                ],
                dtype=np.float32,
            )
            mm = mm * sgn
        copy = emb.copy()
        copy["vec_id"] = copy["vec_id"] + v * 1_000_000
        copy["embedding"] = list(mm)
        out.append(copy)
    pdf = pd.concat(out, ignore_index=True)
    pdf.to_parquet(os.path.join(out_dir, "embeddings.parquet"), index=False)
    return len(pdf)


def q_half_away(x):
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def numpy_replay(path: str, nlist: int, bm_k: int):
    """Full independent replay: seed labels → mean centroids → nearest-
    centroid routing (round-6dp, cell-asc ties) → per-cell per-endpoint
    top-K candidate union → margins → mutual matching."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    E = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    seed = ids % nlist
    cents = np.zeros((nlist, E.shape[1]))
    for c in range(nlist):
        cents[c] = E[seed == c].mean(axis=0)
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    csim = q_half_away(En @ Cn.T * 1e6)  # rounded cosine, millionths
    # argmax over (c_sim desc, cell asc)
    cell = np.lexsort((np.broadcast_to(np.arange(nlist), csim.shape), -csim), axis=1)[
        :, 0
    ]

    cand = {}
    sum_x, sum_y = {}, {}
    for c in np.unique(cell):
        sel = cell == c
        cids, cE = ids[sel], En[sel]
        am, bm = cids % 2 == 0, cids % 2 == 1
        a_ids, b_ids = cids[am], cids[bm]
        if len(a_ids) == 0 or len(b_ids) == 0:
            continue
        S = q_half_away(cE[am] @ cE[bm].T * 1e6)
        k = min(bm_k, len(b_ids))
        for i, aid in enumerate(a_ids):
            order = np.lexsort((b_ids, -S[i]))[:k]
            sum_x[aid] = int(S[i][order].sum())
            for j in order:
                cand[(aid, b_ids[j])] = int(S[i, j])
        kb = min(bm_k, len(a_ids))
        for j, bid in enumerate(b_ids):
            order = np.lexsort((a_ids, -S[:, j]))[:kb]
            sum_y[bid] = int(S[:, j][order].sum())
            for i in order:
                cand[(a_ids[i], bid)] = int(S[i, j])

    rows = []
    for (aid, bid), cu in cand.items():
        marg_raw = cu * 2 * bm_k / (sum_x[aid] + sum_y[bid])
        marg = float(np.sign(marg_raw) * np.floor(np.abs(marg_raw) * 1e6 + 0.5) / 1e6)
        rows.append((aid, bid, cu, marg))
    best_a, best_b = {}, {}
    for aid, bid, cu, marg in rows:
        ka = (-marg, -cu, bid)
        if aid not in best_a or ka < best_a[aid][0]:
            best_a[aid] = (ka, bid)
        kb = (-marg, -cu, aid)
        if bid not in best_b or kb < best_b[bid][0]:
            best_b[bid] = (kb, aid)
    mined = {
        (aid, bid, cu, marg, sum_x[aid], sum_y[bid])
        for aid, bid, cu, marg in rows
        if best_a[aid][1] == bid and best_b[bid][1] == aid
    }
    return mined, len(cand)


def main() -> None:
    import pyspark.sql.functions as F

    from minimapreduce_spark.operators.similarity import (
        BM_K,
        _bitext_ivf_pairs,
        _bitext_margin_stages,
        _ivf_assign,
    )
    from minimapreduce_spark.session import get_spark

    spark = get_spark(app_name="bitext-nlist-octave")
    for m in MULTS:
        d = tempfile.mkdtemp(prefix=f"bitext_nlist_m{m}_")
        try:
            n = build_corpus(m, d)
            nlist = int(round(n**0.5))
            path = os.path.join(d, "embeddings.parquet")
            # repartition: the pandas-written fixture is ONE parquet
            # file → one partition, which would serialize the N×nlist
            # routing cross-join onto a single core (measured: the
            # fan_out discipline, catalog.fan_out)
            emb = (
                spark.read.parquet(path)
                .repartition(32)
                .select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("emb"),
                    F.pmod("vec_id", F.lit(nlist)).alias("label"),
                )
                .localCheckpoint(eager=False)
            )
            t0 = time.perf_counter()
            cand = _bitext_ivf_pairs(emb).localCheckpoint()
            n_cand = cand.count()
            out = _bitext_margin_stages(cand).collect()
            wall = time.perf_counter() - t0

            # in-kernel matmul volume from the assignment census
            assigned = _ivf_assign(emb)
            census = (
                assigned.groupBy("cell")
                .agg(
                    F.sum((F.col("vec_id") % 2 == 0).cast("long")).alias("na"),
                    F.sum((F.col("vec_id") % 2 == 1).cast("long")).alias("nb"),
                )
                .agg(
                    F.sum(F.col("na") * F.col("nb")).alias("matmul"),
                    F.count("*").alias("cells"),
                )
                .first()
            )

            got = {
                (
                    int(r.src_vec_id),
                    int(r.tgt_vec_id),
                    int(round(r.cosine_sim * 1e6)),
                    float(r.margin),
                    int(r.sum_x),
                    int(r.sum_y),
                )
                for r in out
            }
            mined, n_cand_replay = numpy_replay(path, nlist, BM_K)
            print(
                json.dumps(
                    {
                        "mult": m,
                        "N": n,
                        "nlist": nlist,
                        "cells_nonempty": int(census["cells"]),
                        "inkernel_matmul_pairs": int(census["matmul"]),
                        "emitted_candidates": n_cand,
                        "candidate_bound_2KN": 2 * BM_K * n,
                        "mined_pairs": len(out),
                        "wall_sec": round(wall, 1),
                        "replay_match": got == mined,
                        "replay_candidates": n_cand_replay,
                    }
                ),
                flush=True,
            )
            assert n_cand <= 2 * BM_K * n, "K·N candidate bound violated"
            assert got == mined, (
                f"replay mismatch at m={m}: {len(got)} vs {len(mined)}"
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
