"""Training-data pipeline operators (operators/pipeline.py): PII scrub,
hash splits, greedy packing, contamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.pipeline import (
    contamination_scores,
    dataset_split,
    pack_sequences,
    scrub_pii,
)
from vector_search_question_answer_api_spark.sources.tables import load_table


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org today"),
            (2, "see https://a.b/c?d=1 and http://plain.io"),
            (3, "host 192.168.0.1 responded"),
            (4, "call +1 415 555 0100 now"),
            (5, "nothing personal here"),
            (6, None),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert rows[1]["n_email"] == 1 and "<EMAIL>" in rows[1]["scrubbed"]
    assert "@" not in rows[1]["scrubbed"]
    assert rows[2]["n_url"] == 2 and rows[2]["scrubbed"].count("<URL>") == 2
    assert rows[3]["n_ip"] == 1 and "<IP>" in rows[3]["scrubbed"]
    assert rows[4]["n_phone"] == 1 and "<PHONE>" in rows[4]["scrubbed"]
    assert rows[5]["scrubbed"] == "nothing personal here"
    assert all(rows[5][c] == 0 for c in ("n_email", "n_url", "n_ip", "n_phone"))
    assert rows[6]["scrubbed"] == ""


def test_scrub_pii_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "x@y.io at 10.0.0.1 via http://z +1 222 333 4444")],
        "doc_id long, text string",
    )
    once = scrub_pii(df).select("doc_id", F.col("scrubbed").alias("text"))
    twice = scrub_pii(once).collect()[0]
    assert twice["n_email"] == twice["n_url"] == twice["n_ip"] == twice["n_phone"] == 0


def test_dataset_split_fractions_and_determinism(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    s = dataset_split(d, 80, 10)
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == d.count()
    # hash-mod split: expect roughly 80/10/10 (loose bounds at tiny sf)
    assert counts.get("train", 0) > 0.6 * n
    assert 0 < counts.get("valid", 0) < 0.25 * n
    assert 0 < counts.get("test", 0) < 0.25 * n
    assert s.collect() == dataset_split(d, 80, 10).collect()
    assert s.filter((F.col("bucket") < 0) | (F.col("bucket") >= 100)).count() == 0


def test_pack_sequences_capacity_and_order(spark):
    rows = [
        ("s1", 1, 100), ("s1", 2, 100), ("s1", 3, 100),  # 2 bins: [1,2],[3]
        ("s1", 4, 300),                                   # oversize -> own bin
        ("s1", 5, 10),
        ("s2", 10, 256), ("s2", 11, 1),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = {(r["source"], r["doc_id"]): r for r in pack_sequences(df, capacity=256).collect()}
    assert out[("s1", 1)]["bin_id"] == 0 and out[("s1", 2)]["bin_id"] == 0
    assert out[("s1", 3)]["bin_id"] == 1
    assert out[("s1", 4)]["bin_id"] == 2 and out[("s1", 4)]["bin_fill"] == 300
    assert out[("s1", 5)]["bin_id"] == 3
    assert out[("s2", 10)]["bin_id"] == 0 and out[("s2", 11)]["bin_id"] == 1
    # bin_fill within a bin is the running sum and never exceeds capacity
    # except for a lone oversize doc
    for r in out.values():
        assert r["bin_fill"] <= 256 or r["bin_fill"] == 300


def test_contamination_bounds_and_planted_dup(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # plant a held-out doc (id % 17 == 0) that copies a train doc's text
    src = d.filter(F.col("doc_id") == 1).select("text").collect()[0]["text"]
    planted_id = 17 * 100003  # far outside the corpus id range, % 17 == 0
    extra = spark.createDataFrame(
        [(planted_id, src, "en", "src0", len(src))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    scores = contamination_scores(d.unionByName(extra), test_mod=17, k=3)
    rows = scores.collect()
    for r in rows:
        assert 0.0 <= r["contamination"] <= 1.0
    planted = [r for r in rows if r["doc_id"] == planted_id]
    assert planted and planted[0]["contamination"] == 1.0


def test_pack_sequences_sharded_bounds_groups(spark):
    rows = [("s1", i, 100) for i in range(12)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = pack_sequences(df, capacity=256, shard_mod=3).collect()
    assert len(out) == 12
    # every (bin) holds <= capacity unless lone oversize; bins never mix shards
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for bin_id, members in by_bin.items():
        assert len({m["doc_id"] % 3 for m in members}) == 1
        assert max(m["bin_fill"] for m in members) <= 256
    # shard encoding: bin_id % mod == shard of its members
    for r in out:
        assert r["bin_id"] % 3 == r["doc_id"] % 3


def test_mixture_quotas_apportionment():
    from vector_search_question_answer_api_spark.operators.pipeline import (
        mixture_quotas,
    )

    # exact thirds don't exist: largest-remainder hands out the leftovers
    q = mixture_quotas({"a": 1, "b": 1, "c": 1}, 10)
    assert sum(q.values()) == 10 and sorted(q.values()) == [3, 3, 4]
    # remainder tie breaks by domain name ('a' wins the extra slot)
    assert q["a"] == 4
    # weights need not be normalized
    assert mixture_quotas({"a": 30, "b": 20, "c": 50}, 10) == {
        "a": 3,
        "b": 2,
        "c": 5,
    }
    assert mixture_quotas({"a": 1}, 0) == {"a": 0}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_quotas({}, 5)
    with _pytest.raises(ValueError):
        mixture_quotas({"a": -1, "b": 2}, 5)
    with _pytest.raises(ValueError):
        mixture_quotas({"a": 0.0}, 5)


def test_mixture_sample_exact_quotas_and_determinism(spark, sf_dir):
    from vector_search_question_answer_api_spark.operators.pipeline import (
        mixture_quotas,
        mixture_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    got = mixture_sample(d, "source", weights, 12, salt="s")
    counts = {
        r["source"]: r["n"]
        for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    avail = {
        r["source"]: r["n"]
        for r in d.filter(F.col("source").isin(*weights))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for dom, quota in mixture_quotas(weights, 12).items():
        assert counts.get(dom, 0) == min(quota, avail.get(dom, 0))
    # excluded domains never leak into the mix
    assert set(counts) <= set(weights)
    # deterministic draw; a different salt draws a different sample
    same = mixture_sample(d, "source", weights, 12, salt="s")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, same.collect()))
    other = mixture_sample(d, "source", weights, 12, salt="t")
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}  # noqa: E731
    assert ids(got) != ids(other)
    # mix_rank is a dense 1..n prefix per domain: truncating the mix to a
    # smaller rank keeps a consistent subsample
    for dom, n in counts.items():
        ranks = sorted(
            r["mix_rank"]
            for r in got.filter(F.col("source") == dom).collect()
        )
        assert ranks == list(range(1, n + 1))


def test_filter_funnel_monotone_and_manual_check(spark, sf_dir):
    from vector_search_question_answer_api_spark.operators.pipeline import (
        FUNNEL_STAGES,
        filter_funnel,
    )

    d = load_table(spark, sf_dir, "documents")
    rows = filter_funnel(d, lang="en", min_tokens=20, min_quality=0.5).collect()
    assert [r["stage_name"] for r in rows] == FUNNEL_STAGES
    ns = [r["n_docs"] for r in rows]
    assert ns[0] == d.count()
    # cumulative stages can only shrink
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert rows[0]["retained_frac"] == 1.0
    assert all(0.0 <= r["retained_frac"] <= 1.0 for r in rows)
    # stage-1 count is just the declared-lang filter — check it directly
    assert ns[1] == d.filter(F.col("lang") == "en").count()


def test_filter_funnel_dedup_stage_counts_survivors_only(spark):
    df = spark.createDataFrame(
        [
            (1, "the data pipeline runs fast and the results are good", "en"),
            (2, "the data pipeline runs fast and the results are good", "en"),
            (3, "the data pipeline runs fast and the results are good", "en"),
            (4, "a different document for the corpus with more words", "en"),
            (5, "ein anderes dokument", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    from vector_search_question_answer_api_spark.operators.pipeline import (
        filter_funnel,
    )

    rows = {r["stage_name"]: r["n_docs"] for r in filter_funnel(
        df, lang="en", min_tokens=0, min_quality=0.0
    ).collect()}
    assert rows["all"] == 5
    assert rows["lang"] == 4
    assert rows["length"] == 4 and rows["quality"] == 4
    # three exact copies collapse to one survivor
    assert rows["dedup"] == 2


def test_filter_funnel_dedups_within_stage_survivors(spark):
    """The dedup stage marks survivors among the docs that PASSED the
    earlier stages: if a duplicate group's lowest-id member was already
    dropped (here: the German twin), the passing member must survive."""
    df = spark.createDataFrame(
        [
            (1, "shared duplicated text body for the funnel check", "de"),
            (2, "shared duplicated text body for the funnel check", "en"),
            (3, "a unique english document body", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    from vector_search_question_answer_api_spark.operators.pipeline import (
        filter_funnel,
    )

    rows = {r["stage_name"]: r["n_docs"] for r in filter_funnel(
        df, lang="en", min_tokens=0, min_quality=0.0
    ).collect()}
    assert rows["lang"] == 2
    # doc 2 is NOT a duplicate within the surviving set — both en docs
    # must come through the dedup stage
    assert rows["dedup"] == 2


def test_token_budget_sample_greedy_fill(spark):
    from vector_search_question_answer_api_spark.operators.pipeline import (
        token_budget_sample,
    )

    rows = [(i, "a" if i < 6 else "b", 100) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_toks"])
    out = token_budget_sample(
        df, "source", "n_toks", {"a": 250, "b": 1000}
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r)
    # a: 100+100 < 250 -> third doc crosses the line and is kept (overshoot
    # by at most one doc); fourth is out
    assert len(by_dom["a"]) == 3
    assert max(r["cum_tokens"] for r in by_dom["a"]) == 300
    # b: budget exceeds the domain's total -> every doc kept
    assert len(by_dom["b"]) == 4
    # every kept row's exclusive prefix is under budget
    for r in out:
        budget = 250 if r["source"] == "a" else 1000
        assert r["cum_tokens"] - 100 < budget
    # ranks are a contiguous prefix per domain
    for rs in by_dom.values():
        assert sorted(r["mix_rank"] for r in rs) == list(range(1, len(rs) + 1))


def test_token_budget_sample_deterministic_and_salted(spark, sf_dir):
    from vector_search_question_answer_api_spark.operators.pipeline import (
        token_budget_sample,
    )
    from vector_search_question_answer_api_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("n_toks")
    )
    budgets = {"src0": 2000, "src1": 1500}
    a = {tuple(r) for r in token_budget_sample(d, "source", "n_toks", budgets, salt="x").collect()}
    b = {tuple(r) for r in token_budget_sample(d, "source", "n_toks", budgets, salt="x").collect()}
    c = {tuple(r) for r in token_budget_sample(d, "source", "n_toks", budgets, salt="y").collect()}
    assert a == b
    assert a != c  # a different salt draws a different sample


def test_token_budget_sample_empty_and_zero_budgets(spark):
    from vector_search_question_answer_api_spark.operators.pipeline import (
        token_budget_sample,
    )

    df = spark.createDataFrame([(1, "a", 10)], ["doc_id", "source", "n_toks"])
    assert token_budget_sample(df, "source", "n_toks", {}).count() == 0
    assert token_budget_sample(df, "source", "n_toks", {"a": 0}).count() == 0
    # oversized single doc is still taken (prefix-empty rule)
    out = token_budget_sample(df, "source", "n_toks", {"a": 5}).collect()
    assert len(out) == 1 and out[0]["cum_tokens"] == 10
