"""UDF/UDAF/UDTF surface: oracle matches + Arrow-batching sanity."""

import pytest

from tests.conftest import SF_DIR, run_and_compare

ORACLED = [
    "udf_vectorized_sigmoid",
    "udaf_weighted_discount",
    "udtf_split_sentences",
    "cogroup_customer_activity",
]


@pytest.mark.parametrize("name", ORACLED)
def test_matches_oracle(spark, duck, name):
    run_and_compare(spark, duck, name)


def test_udtf_rows_expand(spark):
    """UDTF is one-to-many: output rows ≥ input docs with text."""
    from minimapreduce_spark import queries as q
    from minimapreduce_spark.catalog import load_table

    out = q.queries()["udtf_split_sentences"](spark, SF_DIR)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert out.count() >= n_docs
    assert out.columns == ["doc_id", "sent_no", "sentence"]


def test_arrow_embedding_norms_matches_builtin(spark):
    """The mapInArrow fixed-point norm must equal the same computation
    done with built-in array expressions (independent plan, same
    rounding rule)."""
    import pyspark.sql.functions as F
    from minimapreduce_spark.functions.udfs import arrow_embedding_norms
    from minimapreduce_spark.catalog import load_table

    got = {
        r["vec_id"]: r["l2_norm"]
        for r in arrow_embedding_norms(spark, SF_DIR).collect()
    }
    emb = load_table(spark, SF_DIR, "embeddings")
    ref = emb.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(
                        "embedding",
                        lambda v: F.round(v.cast("double") * 1000000).cast("bigint"),
                    ),
                    F.lit(0).cast("bigint"),
                    lambda acc, c: acc + c * c,
                ).cast("double")
            )
            / 1000000.0,
            6,
        ).alias("l2_norm"),
    )
    want = {r["vec_id"]: r["l2_norm"] for r in ref.collect()}
    assert got == want
