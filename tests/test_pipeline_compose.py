"""End-to-end curation-pipeline composition: the operators are built to
chain (scrub -> quality/dedup filter -> mix -> split -> pack), and this is
the one place that verifies the chain as a USER would run it, not each
stage in isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.dedup import (
    dedup_exact_survivors,
)
from vector_search_question_answer_api_spark.operators.pipeline import (
    dataset_split,
    mixture_quotas,
    mixture_sample,
    pack_sequences,
    scrub_pii,
)
from vector_search_question_answer_api_spark.sources.tables import load_table


def test_curation_chain_end_to_end(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. scrub -> the cleaned text replaces the raw column
    cleaned = (
        scrub_pii(docs)
        .select("doc_id", F.col("scrubbed").alias("text"))
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
    )
    assert cleaned.count() == n_raw

    # 2. exact-dedup survivors only (semi-join on the survivor set)
    surv = dedup_exact_survivors(cleaned)
    deduped = cleaned.join(surv.select("doc_id"), "doc_id", "left_semi")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_raw

    # 3. domain mix with exact quotas over the deduped corpus
    weights = {"src0": 0.4, "src1": 0.3, "src2": 0.3}
    mixed = mixture_sample(deduped, "source", weights, 12, salt="c")
    counts = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    avail = {
        r["source"]: r["n"]
        for r in deduped.filter(F.col("source").isin(*weights))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for dom, quota in mixture_quotas(weights, 12).items():
        assert counts.get(dom, 0) == min(quota, avail.get(dom, 0))

    # 4. deterministic split of the mix
    split = dataset_split(mixed, train_pct=80, valid_pct=10)
    assert split.count() == mixed.count()
    assert set(
        r["split"] for r in split.select("split").distinct().collect()
    ) <= {"train", "valid", "test"}

    # 5. pack the train shard into token bins; every doc lands exactly once
    train = (
        split.filter(F.col("split") == "train")
        .join(mixed.select("doc_id", "source", "text"), "doc_id")
        .select(
            "source",
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        )
    )
    packed = pack_sequences(train, capacity=512)
    assert packed.count() == train.count()
    assert packed.select("doc_id").distinct().count() == train.count()
    # no bin's fill exceeds capacity unless it is a single oversize doc
    fills = (
        packed.groupBy("source", "bin_id")
        .agg(F.max("bin_fill").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["fill"] <= 512 or r["n"] == 1 for r in fills)

    # the whole chain is deterministic end-to-end
    again = pack_sequences(train, capacity=512)
    assert sorted(map(tuple, packed.collect())) == sorted(
        map(tuple, again.collect())
    )
