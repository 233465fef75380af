"""Query registry: the engine's public query surface.

Every operator from SURVEY §2 is registered here as a named query:
  - ``fn(spark, sf_dir) -> DataFrame`` — the Spark plan
  - ``oracle`` — equivalent ANSI SQL for the DuckDB correctness oracle
    (None for genuinely non-SQL-expressible ops → driver does a
    rows-only check)
  - ``bench=True`` marks headline queries timed by bench.py

This mirrors the reference's test protocol: distributed output must
match a sequential oracle order-insensitively (main/test-mr.sh:59-67),
generalized from `sort | cmp` to row-count + schema + value-hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    fn: QueryFn
    oracle: str | None = None
    bench: bool = False
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, bench: bool = False) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the engine's surface."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(fn=fn, oracle=oracle, bench=bench, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


# Driver-priority tier: the correctness driver verifies the first N
# registrations it sees, so the window is rotated each round to extend
# cumulative hard-verified coverage (round-1 verdict: the first 50 were
# all text/relational/TPC-H, leaving dedup/ANN/streaming/events/multimodal
# driver-unchecked). Order here = dict order of queries()/oracles(); the
# rest follows in module registration order. tests/test_driver_contract.py
# pins the rotation discipline.
#
# ROUND-10 ROTATION — FRESHNESS UNDER CLOSURE, NOW PIN-ROUNDED (the
# round-8/9 discipline plus the structural fix the round-9 verdict
# mandates; all rules encoded in tests/test_driver_contract.py):
#   (a) every round-10 registration is SWAPPED in at the head as it
#       registers (a new capability driver-verified beats any
#       re-verification), displacing the LAST r03 canary below;
#   (b) the remaining slots re-verify the queries whose last
#       driver-hash verification is OLDEST — the staleness rule: no
#       canary may be fresher than any non-window verified query
#       (ties allowed). After round 9 the oldest cohorts are the 12
#       r02-verified queries (eight rounds stale) and the 40
#       r03-verified; 12 + 38 of the r03 cohort fill the canary
#       slots (the r03 tie keeps the rule green either side of the
#       cut).
#   (c) WINDOW_PIN_ROUND below records WHEN this window was pinned:
#       the staleness rule is evaluated against the artifact set that
#       existed at pin time (rounds < pin), so the driver dropping
#       CORRECTNESS_r10.json AFTER the final commit — the exact
#       mechanism that turned rounds 8 and 9 red post-commit — can no
#       longer fire the tripwire, while max(artifact round) <= pin
#       still goes red if a LATER round forgets to rotate.

# The round whose registrations lead the window == 1 + the newest
# CORRECTNESS artifact at pin time. Bump this in the same commit that
# rotates DRIVER_PRIORITY for the next round.
WINDOW_PIN_ROUND: int = 10

DRIVER_PRIORITY: list[str] = [
    # -- round-10 registrations lead (rotation rule (a)) --
    "minhash_index_append_probe",
    "catalog_stats_lineitem_prod",
    "incremental_join_view_upserts",
    "events_pattern_match_windowed",
    "dedup_clusters_adaptive",
    "minhash_index_compact_probe",
    "incremental_join_view_rebuild",
    "ann_ivfpq_append_served_topk",
    "stream_incremental_join_view",
    "ann_ivfpq_compact_served_topk",
    "stream_incremental_join_view_rebuild",
    # -- r02 staleness canaries: the 12 queries last driver-verified in
    #    round 2, eight rounds stale — rotation rule (b) --
    "q9_product_type_profit",
    "sessions_peak_concurrency",
    "stream_dedup_watermark",
    "stream_session_window",
    "text_bm25_topk",
    "text_quality_score",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    "ts_similarity_topk",
    "udaf_weighted_discount",
    "vocab_growth_curve",
    "zorder_tile_stats",
    # -- r03 staleness canaries: next-oldest cohort (40 total; the 38
    #    alphabetically-first fill the remaining slots at pin time;
    #    each round-10 registration displaces one from the tail —
    #    displaced queries tie with the kept ones at round 3, so the
    #    staleness rule holds either side of the cut) --
    "agg_approx_sketch",
    "agg_grouping_sets",
    "agg_heavy_hitters_priority",
    "ann_ivf_nprobe_topk",
    "assign_training_shards",
    "cogroup_customer_activity",
    "curriculum_quality_buckets",
    "dedup_canonical_by_quality",
    "dedup_embedding_lsh",
    "dedup_span_repeats",
    "doc_fingerprint",
    "embedding_kmeans_lloyd",
    "embedding_quantize_int8",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_tumbling_hourly",
    "gdpr_erase_cascade",
    "join_bloom_pruned_revenue",
    "join_shuffle_hash_revenue",
    "multimodal_audio_windows",
    "multimodal_png_decode",
    "multimodal_resize",
    "q20_excess_share_suppliers",
    "q22_global_sales_opportunity",
    "scd2_asof_lookup",
    "session_top_paths",
    "sort_nulls_ordering",
]


# Queries registered AFTER the current (round-10) window was pinned.
# Any new registration must be appended here in the same commit, so the
# rotation test can distinguish "late, ledgered, pytest-oracle-verified"
# from "missed". New round-10 flagships should instead be SWAPPED into
# the window, displacing a canary (a flagship driver-verified beats a
# canary re-verified) — use this ledger only when the driver may
# already have run.
LATE_REGISTERED: list[str] = []




def _ordered_names() -> list[str]:
    """Priority tier first, then the rest in registration order."""
    prio = [n for n in DRIVER_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(prio)]
    return prio + rest


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracles() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items() if q.bench}
