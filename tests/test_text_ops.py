

def test_pii_scrub_is_idempotent_and_leaves_no_residual(spark):
    """Scrubbing already-scrubbed text must be a no-op, and no PII
    pattern may survive the pass (the n_residual_pii=0 contract)."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from reports_generator_spark.plans.text import (
        _PII_EMAIL,
        _PII_IPV4,
        _PII_PHONE,
        _pii_injected_col,
        pii_scrub_col,
    )
    from reports_generator_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    inj = docs.select("doc_id", _pii_injected_col().alias("t"))
    once = inj.select("doc_id", pii_scrub_col(F.col("t")).alias("clean"))
    twice = once.select(
        "doc_id", "clean", pii_scrub_col(F.col("clean")).alias("clean2")
    )
    assert twice.filter(F.col("clean") != F.col("clean2")).count() == 0
    resid = once.select(
        (
            F.regexp_count(F.col("clean"), F.lit(_PII_EMAIL))
            + F.regexp_count(F.col("clean"), F.lit(_PII_IPV4))
            + F.regexp_count(F.col("clean"), F.lit(_PII_PHONE))
        ).alias("r")
    ).agg(F.sum("r")).first()[0]
    assert resid == 0
    # and the injection did plant PII (the key is not vacuously green)
    planted = inj.select(
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).alias("r")
    ).agg(F.sum("r")).first()[0]
    assert planted > 0
