"""Training-data pipeline operators vs the DuckDB oracle, plus
split-determinism properties the oracle can't express."""

import os

import pytest

from tests.conftest import assert_frames_match, run_and_compare

QUERIES = [
    "split_train_test",
    "sample_stratified",
    "text_pii_scrub",
    "text_quality_repetition",
    "merge_upsert_customers",
    "dedup_keep_latest",
    "dq_constraint_audit",
    "percentile_quantity",
    "histogram_order_prices",
]

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", QUERIES)
def test_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_split_fractions_and_stability(spark):
    """The hash split must (a) be reproducible run-to-run, (b) cover
    every doc exactly once, (c) land near 80/10/10."""
    from minimapreduce_spark.registry import REGISTRY

    fn = REGISTRY["split_train_test"].fn
    a = {r["doc_id"]: r["split"] for r in fn(spark, SF_DIR).collect()}
    b = {r["doc_id"]: r["split"] for r in fn(spark, SF_DIR).collect()}
    assert a == b, "split assignment must be deterministic"
    n = len(a)
    train = sum(1 for s in a.values() if s == "train") / n
    test = sum(1 for s in a.values() if s == "test") / n
    assert 0.70 <= train <= 0.90, train
    assert 0.03 <= test <= 0.18, test


def test_split_partition_invariance(spark):
    """Assignment must not depend on physical partitioning — the
    property that lets a 100 TB re-run on a different cluster keep the
    same split."""
    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators.pipeline import _hash2
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    h1 = docs.select("doc_id", _hash2(F.col("doc_id")).alias("h"))
    h32 = docs.repartition(32).select("doc_id", _hash2(F.col("doc_id")).alias("h"))
    assert sorted(map(tuple, h1.collect())) == sorted(map(tuple, h32.collect()))


def test_pii_scrub_removes_all_pii(spark):
    import re

    from minimapreduce_spark.registry import REGISTRY

    rows = REGISTRY["text_pii_scrub"].fn(spark, SF_DIR).collect()
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\d{3}[-.]\d{4}")
    assert rows
    for r in rows:
        assert "<EMAIL>" in r["scrubbed"]
        assert "<PHONE>" in r["scrubbed"]
        assert not email.search(r["scrubbed"]), r["scrubbed"]
        assert not phone.search(r["scrubbed"]), r["scrubbed"]


def test_merge_actions_present(spark):
    from minimapreduce_spark.registry import REGISTRY

    acts = {
        r["action"]
        for r in REGISTRY["merge_upsert_customers"].fn(spark, SF_DIR).collect()
    }
    assert acts == {"insert", "update", "keep"}, acts


PHASE2 = [
    "doc_chunks",
    "scd2_customer_tier_history",
    "null_semantics_agg",
]


@pytest.mark.parametrize("name", PHASE2)
def test_phase2_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_chunks_cover_whole_doc(spark):
    """Every word of every document must appear in at least one chunk,
    and consecutive chunks overlap by CHUNK_WORDS - CHUNK_STRIDE."""
    from minimapreduce_spark.operators.pipeline import CHUNK_STRIDE, CHUNK_WORDS
    from minimapreduce_spark.registry import REGISTRY

    rows = REGISTRY["doc_chunks"].fn(spark, SF_DIR).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        total = sum(r["n_words"] for r in chunks)
        n_full = len(chunks) - 1
        # overlap: every chunk but the first re-covers (WORDS - STRIDE) words
        distinct_words = total - n_full * (CHUNK_WORDS - CHUNK_STRIDE)
        # last chunk may be shorter; reconstruct expected doc length
        last = chunks[-1]
        expected = last["chunk_id"] * CHUNK_STRIDE + last["n_words"]
        assert distinct_words <= total
        assert expected >= 1
        assert all(r["n_words"] <= CHUNK_WORDS for r in chunks)


def test_scd2_ranges_are_disjoint_per_customer(spark):
    """Validity ranges of one customer must never overlap (an SCD2
    correctness invariant the oracle hash alone wouldn't explain)."""
    from minimapreduce_spark.registry import REGISTRY

    rows = REGISTRY["scd2_customer_tier_history"].fn(spark, SF_DIR).collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r["custkey"], []).append((r["from_year"], r["to_year"]))
    assert by_cust
    for custkey, ranges in by_cust.items():
        ranges.sort()
        for (f1, t1), (f2, _t2) in zip(ranges, ranges[1:]):
            assert t1 < f2 or f2 > f1, (custkey, ranges)
            assert f2 > t1, f"overlap for customer {custkey}: {ranges}"


PHASE3 = ["embedding_label_centroids", "incremental_rollup_merge"]


@pytest.mark.parametrize("name", PHASE3)
def test_phase3_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_incremental_merge_equals_single_pass(spark):
    """merge(partial(old), partial(new)) must equal the one-shot rollup
    computed by Spark itself (not just the DuckDB oracle)."""
    from pyspark.sql import functions as F

    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.registry import REGISTRY

    merged = REGISTRY["incremental_rollup_merge"].fn(spark, SF_DIR).toPandas()
    ev = load_table(spark, SF_DIR, "events")
    single = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 1_000_000).cast("long")) / 1_000_000.0).alias(
                "total_value"
            ),
        )
        .toPandas()
    )
    assert_frames_match(merged, single, name="incremental_rollup_merge")


def test_unigram_logprob_matches_oracle(spark, duck):
    run_and_compare(spark, duck, "text_unigram_logprob")


def test_chunks_reconstruct_original_text(spark):
    """Stitching chunk texts back together (first chunk + the last
    STRIDE words of each full successor + trailing partial) must
    reproduce every document verbatim — no word lost or duplicated."""
    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators.pipeline import CHUNK_STRIDE
    from minimapreduce_spark.registry import REGISTRY

    chunks = REGISTRY["doc_chunks"].fn(spark, SF_DIR).collect()
    originals = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(originals)
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda r: r["chunk_id"])
        words = cs[0]["chunk_text"].split(" ")
        for c in cs[1:]:
            cw = c["chunk_text"].split(" ")
            already = len(words) - c["chunk_id"] * CHUNK_STRIDE
            words.extend(cw[already:])
        assert " ".join(words) == originals[doc_id], f"doc {doc_id} mangled"


def test_datetime_arithmetic_matches_oracle(spark, duck):
    run_and_compare(spark, duck, "datetime_arithmetic_showcase")


def test_array_set_ops_matches_oracle(spark, duck):
    run_and_compare(spark, duck, "array_set_ops")


@pytest.mark.parametrize("name", ["langid_confusion_matrix", "sample_quality_weighted"])
def test_phase4_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_decimal_exact_revenue_matches_oracle(spark, duck):
    run_and_compare(spark, duck, "decimal_exact_revenue")


@pytest.mark.parametrize(
    "name", ["agg_grouping_id", "agg_filter_clause", "window_first_last_nth"]
)
def test_phase5_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


@pytest.mark.parametrize(
    "name", ["lateral_top2_orders", "set_ops_multiset", "page_orders_offset"]
)
def test_phase6_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_fuzzy_join_blocked_matches_oracle(spark, duck):
    run_and_compare(spark, duck, "fuzzy_join_blocked")


def test_keep_latest_is_per_key_max(spark):
    """Exactly one survivor per (user_id, event_type), and it carries
    that key's maximum timestamp."""
    from pyspark.sql import functions as F

    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.registry import REGISTRY

    kept = REGISTRY["dedup_keep_latest"].fn(spark, SF_DIR)
    assert kept.groupBy("user_id", "event_type").count().where("count > 1").count() == 0
    maxes = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id", "event_type")
        .agg(F.max("ts").alias("max_ts"))
    )
    stale = kept.join(maxes, ["user_id", "event_type"]).where("ts <> max_ts")
    assert stale.count() == 0


def test_dq_audit_finds_injected_violations(spark):
    """Each injected corruption class must be counted (>0) and the
    clean constraint must report exactly 0 — the audit can neither
    under- nor over-flag."""
    from minimapreduce_spark.registry import REGISTRY

    r = REGISTRY["dq_constraint_audit"].fn(spark, SF_DIR).first()
    assert r.n_null_custkey > 0
    assert r.n_orphan_custkey > 0
    assert r.n_dup_orderkey > 0
    assert r.n_negative_price == 0
    assert r.n_rows > r.n_dup_orderkey


def test_pack_token_batches_capacity_and_order(spark):
    """Start-offset packing: batches tile the doc sequence in order
    (first/last doc ranges don't interleave), token totals cover the
    corpus exactly, and every batch's START offset respects capacity
    (total_tokens >= capacity for all but the final batch is NOT
    guaranteed by start-offset packing — but batch starts every
    `capacity` tokens, so total >= capacity - max_doc_tokens is)."""
    import pyspark.sql.functions as F
    from minimapreduce_spark.operators.pipeline import pack_token_batches, PACK_CAPACITY
    from minimapreduce_spark.operators.text_analysis import _docs, _tokens

    out = pack_token_batches(spark, SF_DIR).toPandas().sort_values("batch_id")
    docs = _docs(spark, SF_DIR).select(
        "doc_id", F.size(_tokens(F.col("text"))).alias("n")
    )
    total = docs.agg(F.sum("n")).first()[0]
    n_docs = docs.count()
    assert out["total_tokens"].sum() == total
    assert out["n_docs"].sum() == n_docs
    # batches are contiguous, ordered doc ranges
    assert (out["first_doc"].values[1:] > out["last_doc"].values[:-1]).all()
    # batch ids are the dense occupied set
    assert out["batch_id"].is_monotonic_increasing
    assert out["batch_id"].iloc[-1] == (total - out["total_tokens"].iloc[-1]) // PACK_CAPACITY


def test_embedding_quantize_int8_codes_in_range(spark):
    from minimapreduce_spark.operators.similarity import embedding_quantize_int8

    out = embedding_quantize_int8(spark, SF_DIR).toPandas()
    assert (out["min_code"] >= 0).all()
    assert (out["max_code"] <= 255).all()
    # max-min calibration bounds reconstruction error by one step of
    # the widest dimension
    assert (out["max_abs_err"] >= 0).all()


def test_gdpr_cascade_counts_reconcile(spark):
    """The cascade report must agree with directly-computed erasure
    sets, and erasing 0 customers erases 0 everywhere (victim set
    parametrized empty via an impossible modulus check)."""
    import pyspark.sql.functions as F
    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators.pipeline import gdpr_erase_cascade

    out = {r["table_name"]: r for r in gdpr_erase_cascade(spark, SF_DIR).collect()}
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    victims = cust.where(F.col("c_custkey") % 97 == 0)
    assert out["customer"]["n_erased"] == victims.count()
    o_gone = orders.join(victims, orders.o_custkey == victims.c_custkey)
    assert out["orders"]["n_erased"] == o_gone.count()
    assert out["customer"]["n_before"] == cust.count()
    for t in out.values():
        assert t["n_erased"] <= t["n_before"]


def test_snapshot_diff_partitions_the_union(spark):
    """added + removed + changed + unchanged covers base ∪ staged
    exactly once: removed + changed + unchanged == |base| and the
    staged side reconciles likewise (no 'added' rows in this staging
    rule)."""
    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators.pipeline import snapshot_diff_customers

    out = {r["status"]: r["n_rows"] for r in snapshot_diff_customers(spark, SF_DIR).collect()}
    n_base = load_table(spark, SF_DIR, "customer").count()
    assert out.get("added", 0) == 0
    assert out["removed"] + out["changed"] + out["unchanged"] == n_base
    assert out["removed"] >= 1 and out["changed"] >= 1


def test_tier_migration_reconciles_with_history(spark):
    """Matrix total = number of consecutive-year customer pairs; every
    from/to tier is a valid tier name."""
    import pyspark.sql.functions as F
    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators.pipeline import tier_migration_matrix

    out = tier_migration_matrix(spark, SF_DIR).toPandas()
    tiers = {"gold", "silver", "bronze"}
    assert set(out["from_tier"]) <= tiers and set(out["to_tier"]) <= tiers
    orders = load_table(spark, SF_DIR, "orders")
    yearly = orders.select(
        F.col("o_custkey").alias("c"), F.year("o_orderdate").alias("yr")
    ).distinct()
    b = yearly.select("c", (F.col("yr") - 1).alias("yr"))
    n_pairs = yearly.join(b, ["c", "yr"]).count()
    assert out["n_customers"].sum() == n_pairs


def test_mixture_sample_matches_oracle(spark, duck):
    run_and_compare(spark, duck, "mixture_token_budget_sample")


def test_mixture_sample_hits_token_budget(spark):
    """The materialized mixture must actually land on the budget: kept
    tokens ≈ total/MIX_BUDGET_DEN (Bernoulli sampling → ±15% is a loose
    deterministic bound on this fixture), per-source kept tokens track
    the temperature-scaled allocation, and the selection is a
    deterministic pure predicate (re-run identical)."""
    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.pipeline import MIX_BUDGET_DEN

    fn = q.queries()["mixture_token_budget_sample"]
    kept = fn(spark, SF_DIR).toPandas()
    total = (
        q.queries()["source_mixture_weights"](spark, SF_DIR)
        .agg(F.sum("n_tokens"))
        .first()[0]
    )
    budget = total // MIX_BUDGET_DEN
    assert 0.85 * budget <= kept["n_tok"].sum() <= 1.15 * budget, (
        kept["n_tok"].sum(),
        budget,
    )
    # deterministic: a second plan build selects the identical doc set
    again = fn(spark, SF_DIR).toPandas()
    assert sorted(kept["doc_id"]) == sorted(again["doc_id"])


def test_mixture_sample_hash_margins_clear_double_ulp(spark):
    """The keep predicate compares a 60-bit hash (as double) against
    rate*2^60 (double): pin that no fixture doc sits near its
    threshold — the margin must dwarf the ~2^8 ulp at 2^60 magnitude,
    so the float compare can never flip cross-engine (the
    embedding-LSH margin discipline)."""
    from pyspark.sql import functions as F

    from minimapreduce_spark.operators.pipeline import (
        MIX_BUDGET_DEN,
        MIX_TEMP_DEN,
        MIX_TEMP_NUM,
        _HASH60,
        _t,
    )

    docs = _t(spark, SF_DIR, "documents")
    tokens = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    per_doc = docs.select("doc_id", "source", tokens.alias("n_tok"))
    tok = per_doc.groupBy("source").agg(F.sum("n_tok").cast("bigint").alias("t_s"))
    w_fp = F.round(
        F.pow(F.col("t_s").cast("double"), MIX_TEMP_NUM / MIX_TEMP_DEN) * 1000000
    ).cast("bigint")
    powd = tok.select("source", "t_s", w_fp.alias("w_fp"))
    totals = powd.agg(F.sum("t_s").alias("_tt"), F.sum("w_fp").alias("_sw"))
    rate = F.least(
        F.lit(1.0),
        F.expr(f"_tt DIV {MIX_BUDGET_DEN}").cast("double")
        * F.col("w_fp")
        / F.col("_sw")
        / F.col("t_s"),
    )
    rates = powd.crossJoin(F.broadcast(totals)).select("source", rate.alias("rate"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    min_margin = (
        per_doc.join(rates, "source")
        .select(
            F.abs(h.cast("double") - F.col("rate") * F.lit(_HASH60)).alias("margin")
        )
        .agg(F.min("margin"))
        .first()[0]
    )
    assert min_margin > 1e9, min_margin  # ulp at 2^60 is 256


def test_leakage_safe_split(spark):
    """split_leakage_safe beyond the hash match:
      - every near-dup component lands in exactly ONE split (the
        structural leakage guard — split is a function of group_id);
      - clustered docs carry their component id as group_id; docs in
        no component keep their own doc_id AND therefore keep
        split_train_test's assignment (same hash, same thresholds);
      - the capability is not vacuous on this fixture: at least one
        cluster exists whose members the per-doc split DOES separate;
      - full coverage, one row per doc, train fraction still ~80%."""
    from minimapreduce_spark.registry import REGISTRY

    out = REGISTRY["split_leakage_safe"].fn(spark, SF_DIR).toPandas()
    base = REGISTRY["split_train_test"].fn(spark, SF_DIR).toPandas()
    cc = REGISTRY["dedup_clusters"].fn(spark, SF_DIR).toPandas()

    joined = cc.merge(out, on="doc_id")
    assert (joined.groupby("cluster_id")["split"].nunique() == 1).all(), (
        "a near-dup cluster straddles splits — the leak this query exists to close"
    )
    assert (joined["group_id"] == joined["cluster_id"]).all()

    singles = out[~out["doc_id"].isin(set(cc["doc_id"]))]
    assert (singles["group_id"] == singles["doc_id"]).all()
    bmap = base.set_index("doc_id")["split"]
    assert (singles["split"].to_numpy() == bmap.loc[singles["doc_id"]].to_numpy()).all()

    naive = cc.merge(base, on="doc_id").groupby("cluster_id")["split"].nunique()
    assert (naive > 1).any(), (
        "fixture has no cluster the per-doc split separates — the "
        "leakage demonstration is vacuous; re-plant near-dups"
    )

    assert len(out) == len(base) and out["doc_id"].is_unique
    train = (out["split"] == "train").mean()
    assert 0.70 <= train <= 0.90, train


def test_lottery_ticket_matches_independent_reference(spark):
    """The portable-hash contract, pinned against hashlib directly (not
    the oracle, which shares the md5 formula): every sampled doc's
    ticket must equal the min over its token positions of the
    independently-computed 60-bit md5, and its n_tokens must equal the
    whitespace token count."""
    import hashlib as _hl

    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as _q  # noqa: F401 — populate registry
    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.registry import REGISTRY

    sample = {
        r.doc_id: r for r in REGISTRY["sample_token_lottery_topk"].fn(spark, SF_DIR).collect()
    }
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents")
        .where(F.col("doc_id").isin(list(sample)))
        .collect()
    }
    for doc_id, row in sample.items():
        words = texts[doc_id].split(" ")
        poss = [i for i, w in enumerate(words) if w != ""]
        tickets = [
            int(_hl.md5(f"lot:{doc_id}:{p}".encode()).hexdigest()[:15], 16)
            for p in poss
        ]
        assert row.n_tokens == len(poss)
        assert row.ticket == min(tickets), doc_id


def test_lottery_merge_of_shard_topks_equals_whole(spark):
    """Bounded-state mergeability: shard the corpus by doc parity, keep
    only each shard's top-K (ticket, doc_id) rows, union, re-take the
    bottom-K — must equal the whole-corpus sample exactly (doc rows are
    disjoint across doc shards, so the union of shard top-Ks is a
    superset of the global top-K)."""
    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as _q  # noqa: F401 — populate registry
    from minimapreduce_spark.catalog import load_table
    from minimapreduce_spark.operators.pipeline import LOTTERY_K, lottery_tickets
    from minimapreduce_spark.registry import REGISTRY

    docs = load_table(spark, SF_DIR, "documents")
    shard_rows = []
    for parity in (0, 1):
        shard = lottery_tickets(docs.where(F.col("doc_id") % 2 == parity))
        shard_rows += (
            shard.orderBy("ticket", "doc_id").limit(LOTTERY_K).collect()
        )
    merged = sorted((r.ticket, r.doc_id) for r in shard_rows)[:LOTTERY_K]
    whole = [
        (r.ticket, r.doc_id)
        for r in REGISTRY["sample_token_lottery_topk"].fn(spark, SF_DIR)
        .orderBy("rnk")
        .collect()
    ]
    assert merged == whole


def test_lottery_token_mass_dominance(spark, tmp_path):
    """A planted doc holding ~91% of the corpus's token mass must win a
    seat (inclusion ∝ token mass is the semantics; with the fixed
    portable hash the draw is deterministic, so this asserts the
    realized outcome of an overwhelming weight, not a tautology)."""
    from minimapreduce_spark import queries as _q  # noqa: F401 — populate registry
    from minimapreduce_spark.registry import REGISTRY

    rows = [(0, "tok " * 2000, "en", "synth", 8000)] + [
        (i, "w%d" % i, "en", "synth", 4) for i in range(1, 201)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id: bigint, text: string, lang: string, source: string, n_chars: bigint",
    )
    d = str(tmp_path / "lottery_plant")
    os.makedirs(d)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    sample = REGISTRY["sample_token_lottery_topk"].fn(spark, d).collect()
    by_id = {r.doc_id: r for r in sample}
    assert 0 in by_id, "the 91%-token-mass doc missed the sample"
    assert by_id[0].n_tokens == 2000


def test_dsir_planted_selection(spark, tmp_path):
    """DSIR semantics on a planted corpus: raw docs written in the
    TARGET vocabulary must occupy the top ranks, off-vocabulary raw
    docs must carry NEGATIVE weights (their buckets are unseen in the
    target → log-ratio < 0), and mixed docs must land between."""
    import os

    from minimapreduce_spark import queries as q

    docs = []
    # target sample: en docs in src0 with a distinctive vocabulary
    for i in range(20):
        docs.append((i, "alpha beta gamma alpha beta gamma alpha", "en", "src0", 40))
    # raw pool, src9 (outside the target predicate):
    # 5 target-like docs (ids 100..104), 5 alien docs (200..204),
    # 5 mixed docs (300..304)
    for i in range(5):
        docs.append((100 + i, "alpha beta gamma alpha beta", "en", "src9", 30))
        docs.append((200 + i, "zulu yankee xray zulu yankee", "xx", "src9", 30))
        docs.append((300 + i, "alpha beta zulu yankee", "en", "src9", 24))
    d = str(tmp_path / "dsir_planted")
    os.makedirs(d)
    spark.createDataFrame(
        docs, "doc_id: bigint, text: string, lang: string, source: string, n_chars: bigint"
    ).write.parquet(os.path.join(d, "documents.parquet"))

    out = (
        q.REGISTRY["sample_dsir_importance_topk"].fn(spark, d)
        .toPandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    assert len(out) == 15  # whole raw pool fits the top-k cut
    # target-like docs first, mixed in the middle, alien last
    assert sorted(out.doc_id[:5]) == [100, 101, 102, 103, 104], out.head(6)
    assert sorted(out.doc_id[5:10]) == [300, 301, 302, 303, 304]
    assert sorted(out.doc_id[10:]) == [200, 201, 202, 203, 204]
    by_id = out.set_index("doc_id")
    assert all(by_id.loc[i].weight > 0 for i in (100, 101, 102, 103, 104))
    assert all(by_id.loc[i].weight < 0 for i in (200, 201, 202, 203, 204))


def test_probe_auc_numpy_replay_and_planted_scorers(spark):
    """The tied-rank AUC kernel, pinned two ways: (a) numpy replay —
    recompute AUC from the probe's own (y, score) output with
    scipy-style average ranks and match the registered readout exactly
    at 6 dp; (b) planted scorers through the same kernel — a perfect
    scorer (score = y) must read AUC 1, an inverted one 0, and an
    all-constant scorer EXACTLY 0.5 (every pair tied → the average-rank
    identity collapses to n⁺n⁻/2, a closed form, not an approximation)."""
    import numpy as np

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.pipeline import (
        auc_from_scores,
        quality_linear_probe,
    )
    from tests.conftest import SF_DIR

    out = q.queries()["probe_auc_roc"](spark, SF_DIR).collect()[0]
    scored = quality_linear_probe(spark, SF_DIR).select("y", "score").toPandas()
    y = scored.y.to_numpy()
    s = scored.score.to_numpy()
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s))
    sorted_s = s[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j + 2) / 2.0  # 1-based average rank
        i = j + 1
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    auc = (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    assert out.n_pos == n_pos and out.n_neg == n_neg
    assert abs(out.auc - round(auc, 6)) < 1e-9

    rows = [(i % 2, float(i % 2)) for i in range(40)]
    perfect = spark.createDataFrame(rows, "y int, score double")
    assert auc_from_scores(perfect).collect()[0].auc == 1.0
    inverted = spark.createDataFrame(
        [(yv, 1.0 - sv) for yv, sv in rows], "y int, score double"
    )
    assert auc_from_scores(inverted).collect()[0].auc == 0.0
    constant = spark.createDataFrame(
        [(yv, 0.25) for yv, _ in rows], "y int, score double"
    )
    assert auc_from_scores(constant).collect()[0].auc == 0.5


def test_probe_kfold_cv_equals_physical_retrain(spark):
    """The CV shortcut's claim (the LOO retrain-equivalence discipline
    applied to folds): for one fold, WRITE a corpus with that fold's
    rows physically removed, retrain the probe pipeline on it, score
    the HELD-OUT fold with those weights — the accuracy must equal the
    registered query's acc_holdout EXACTLY (subset BIGINT moments ≡
    total − fold; same Cramer text ⇒ bit-identical weights). Also pins
    Σ n_test = corpus and n_train + n_test = corpus per fold."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.catalog import TABLES, table_path
    from minimapreduce_spark.operators.pipeline import (
        _PROBE_SCORE,
        _probe_solve_exprs,
        CV_FOLDS,
        PROBE_GRID,
        PROBE_QUALITY_CUT,
    )
    from minimapreduce_spark.operators.text_analysis import EN_STOP
    from minimapreduce_spark.catalog import load_table
    from tests.conftest import SF_DIR

    out = q.queries()["probe_kfold_cv"](spark, SF_DIR).toPandas()
    n_corpus = int(out.n_test.sum())
    assert ((out.n_train + out.n_test) == n_corpus).all()
    assert sorted(out.fold) == list(range(CV_FOLDS))

    def feats_of(sf_dir):
        dd = load_table(spark, sf_dir, "documents")
        ws = F.filter(F.split(F.col("text"), r"[^A-Za-z]+"), lambda w: w != "")
        stop_arr = F.array(*[F.lit(s) for s in EN_STOP])
        n_tokens = F.size(ws)
        n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w)))
        n_distinct = F.size(F.array_distinct(ws))
        stop_ratio = n_stop * F.lit(1.0) / n_tokens
        quality = (
            0.5 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
            + 0.3 * (1.0 - stop_ratio)
            + 0.2 * (n_distinct * F.lit(1.0) / n_tokens)
        )
        return (
            dd.select(
                "doc_id",
                F.when(quality >= float(PROBE_QUALITY_CUT), 1).otherwise(0).alias("y"),
                F.lit(1.0).alias("x0"),
                (F.least(n_tokens, F.lit(200)) / F.lit(200.0)).alias("x1"),
                stop_ratio.alias("x2"),
                (n_distinct * F.lit(1.0) / n_tokens).alias("x3"),
                n_tokens.alias("_nt"),
            )
            .where(F.col("_nt") > 0)
            .drop("_nt")
        )

    fold = 2
    docs = spark.read.parquet(table_path(SF_DIR, "documents"))
    tmp = tempfile.mkdtemp(prefix="cv_retrain_")
    try:
        d = os.path.join(tmp, "minus_fold")
        os.makedirs(d)
        for t in TABLES:
            if t == "documents":
                docs.where(F.col("doc_id") % CV_FOLDS != fold).write.parquet(
                    os.path.join(d, "documents.parquet")
                )
            else:
                os.symlink(table_path(SF_DIR, t), os.path.join(d, f"{t}.parquet"))
        grid = float(PROBE_GRID)
        moms = [
            F.sum(
                F.round(F.col(f"x{i}") * F.col(f"x{j}") * grid).cast("bigint")
            ).alias(f"s{i}{j}")
            for i in range(4)
            for j in range(i, 4)
        ] + [
            F.sum(F.round(F.col(f"x{i}") * F.col("y") * grid).cast("bigint")).alias(
                f"t{i}"
            )
            for i in range(4)
        ] + [F.count(F.lit(1)).alias("n")]
        a_exprs, w_exprs = _probe_solve_exprs()
        wts = feats_of(d).agg(*moms).selectExpr(*a_exprs, "n").selectExpr(*w_exprs)
        held = (
            feats_of(SF_DIR)
            .where(F.col("doc_id") % CV_FOLDS == fold)
            .crossJoin(F.broadcast(wts))
            .selectExpr(
                "y", f"CASE WHEN {_PROBE_SCORE} >= 0.5 THEN 1 ELSE 0 END AS k"
            )
            .toPandas()
        )
        acc_retrain = float((held["k"] == held["y"]).mean())
        row = out[out.fold == fold].iloc[0]
        assert round(acc_retrain, 6) == row.acc_holdout, (acc_retrain, row)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_probe_calibration_bins_identities(spark):
    """Reliability-diagram identities on the fixture: bins partition
    the corpus (Σn = probe rows), per-bin rates live in [0,1], the
    count-weighted frac_pos reconstructs the corpus positive rate, and
    a pandas replay of the binning (floor(score·10) clamped) matches
    every bin's n and n_pos."""
    import numpy as np

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.pipeline import (
        CALIB_BINS,
        quality_linear_probe,
    )
    from tests.conftest import SF_DIR

    out = q.queries()["probe_calibration_bins"](spark, SF_DIR).toPandas()
    probe = quality_linear_probe(spark, SF_DIR).toPandas()
    assert int(out.n.sum()) == len(probe)
    assert ((out.frac_pos >= 0) & (out.frac_pos <= 1)).all()
    rate = (out.frac_pos * out.n).sum() / out.n.sum()
    assert abs(rate - probe.y.mean()) < 1e-6

    bins = np.clip(
        np.floor(probe.score.to_numpy() * CALIB_BINS), 0, CALIB_BINS - 1
    ).astype(int)
    for _, r in out.iterrows():
        mask = bins == r.bin
        assert int(mask.sum()) == r.n, r.bin
        assert int(probe.y.to_numpy()[mask].sum()) == r.n_pos, r.bin


def test_feature_woe_iv_margins_and_identities(spark):
    """(a) pattern-(b) ln margin: recompute every WOE/IV ln argument
    from the registered output's own counts and pin the 6-dp quantized
    values clear of rounding midpoints; (b) identities: bins partition
    the corpus, WOE sign agrees with the smoothed share comparison,
    and a numpy replay of WOE/IV from the counts matches at 6 dp."""
    import math

    import numpy as np

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.pipeline import (
        WOE_BINS,
        quality_linear_probe,
    )
    from tests.conftest import SF_DIR

    out = q.queries()["feature_woe_iv"](spark, SF_DIR).toPandas()
    probe = quality_linear_probe(spark, SF_DIR).toPandas()
    assert int(out.n.sum()) == len(probe)
    tot_pos, tot_neg = int(out.n_pos.sum()), int(out.n_neg.sum())

    xs = []
    for _, r in out.iterrows():
        ps = (r.n_pos + 1.0) / (tot_pos + WOE_BINS)
        ns = (r.n_neg + 1.0) / (tot_neg + WOE_BINS)
        woe = math.log(ps / ns)
        assert abs(round(woe, 6) - r.woe) < 1e-9, r.bin
        assert abs(round((ps - ns) * woe, 6) - r.iv_term) < 1e-9, r.bin
        assert (r.woe > 0) == (ps > ns) or r.woe == 0, r.bin
        xs.append(woe * 1e6)
        xs.append((ps - ns) * woe * 1e6)
    margin = np.abs(np.mod(np.array(xs), 1.0) - 0.5).min()
    assert margin > 1e-9, f"WOE/IV quantization near a midpoint: {margin}"


def test_dp_geometric_release_replay_and_distribution(spark):
    """The DP release's two pins:

    (a) exact replay — every group's noise recomputes in pure Python
        from hashlib (two salted 60-bit md5 draws, leading-zero counts,
        difference), and n_noisy = n_true + noise with epsilon the
        shared ln-2 literal;
    (b) the sampler really implements the α=1/2 geometric mechanism —
        over 4000 synthetic keys the drawn Z = G₁ − G₂ matches the
        two-sided geometric distribution: mean ≈ 0 (|mean| < 0.15),
        variance ≈ Var(G)·2 = 4 (within 20%), and the one-sided draws
        halve per level like Geometric(1/2) must (P(G≥k+1)/P(G≥k) ≈ ½
        for the populated levels)."""
    import hashlib as _hl

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.pipeline import DP_EPSILON_LN2
    from tests.conftest import SF_DIR

    def h60(salt, key):
        return int(_hl.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16)

    def geo(h):
        return 60 if h == 0 else 60 - h.bit_length()

    out = q.queries()["privacy_dp_geometric_release"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    for r in out.itertuples():
        want = geo(h60("dpg1", r.event_type)) - geo(h60("dpg2", r.event_type))
        assert r.noise == want, (r.event_type, r.noise, want)
        assert r.n_noisy == r.n_true + r.noise
        assert r.epsilon == DP_EPSILON_LN2

    # (b) distribution over synthetic keys — pure Python, same sampler
    zs = [
        geo(h60("dpg1", f"k{i}")) - geo(h60("dpg2", f"k{i}"))
        for i in range(4000)
    ]
    n = len(zs)
    mean = sum(zs) / n
    var = sum((z - mean) ** 2 for z in zs) / n
    assert abs(mean) < 0.15, mean
    assert abs(var - 4.0) < 0.8, var  # Var(Z) = 2·Var(Geom(1/2)) = 4
    gs = [geo(h60("dpg1", f"k{i}")) for i in range(4000)]
    for k in range(3):
        a = sum(1 for g in gs if g >= k)
        b = sum(1 for g in gs if g >= k + 1)
        assert abs(b / a - 0.5) < 0.08, (k, b / a)
