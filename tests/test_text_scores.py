"""TF-IDF keyword extraction + unigram-LM scoring (operators/
text_analysis.py r3) against plain-Python references, and the BM25
df-cut lever."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.keyword_search import bm25_topk
from vector_search_question_answer_api_spark.operators.text_analysis import (
    doc_top_terms,
    unigram_logprob_scores,
)

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana banana cherry"),
    (2, "cherry cherry cherry durian"),
    (3, ""),  # empty doc: must survive with null scores
]


def _tok(t):
    t = re.sub(r"[^\w\s%]", " ", t.lower())
    return [w for w in re.split(r"\s+", t.strip()) if w]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_doc_top_terms_matches_python(spark, docs_df):
    toks = {d: _tok(t) for d, t in DOCS}
    n_docs = len(toks)
    df = {}
    for v in toks.values():
        for term in set(v):
            df[term] = df.get(term, 0) + 1
    got = {
        (r["doc_id"], r["term"]): (r["tfidf"], r["rank"])
        for r in doc_top_terms(docs_df, k=2).collect()
    }
    # doc 0: apple tf=2, df=1 -> 2*ln(4/1)=2.77; cherry tf=1 df=3 -> 0.29;
    # banana tf=1 df=2 -> 0.69 -> top2 = apple, banana
    assert got[(0, "apple")][1] == 1
    assert got[(0, "apple")][0] == pytest.approx(
        round(2 * math.log(4), 6), abs=1e-6
    )
    assert got[(0, "banana")][1] == 2
    assert (0, "cherry") not in got  # k=2 cutoff
    # empty doc contributes no rows
    assert not any(d == 3 for d, _ in got)


def test_unigram_logprob_matches_python(spark, docs_df):
    toks = {d: _tok(t) for d, t in DOCS}
    counts = {}
    for v in toks.values():
        for t in v:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    rows = {r["doc_id"]: r for r in unigram_logprob_scores(docs_df).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for d, v in toks.items():
        if not v:
            assert rows[d]["n_tokens"] == 0
            assert rows[d]["avg_logprob"] is None
            assert rows[d]["perplexity"] is None
            continue
        alp = sum(math.log(counts[t] / total) for t in v) / len(v)
        assert rows[d]["n_tokens"] == len(v)
        assert rows[d]["avg_logprob"] == pytest.approx(round(alp, 6), abs=2e-6)
        assert rows[d]["perplexity"] == pytest.approx(
            round(math.exp(-alp), 6), abs=1e-4
        )
    # rare-token doc scores lower than common-token doc
    assert rows[2]["avg_logprob"] < 0


def test_bm25_df_cut_drops_stopword_terms(spark, docs_df):
    q = spark.createDataFrame(
        [(1, "cherry durian")], ["query_id", "query_text"]
    )
    full = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs_df, q, k=10).collect()
    }
    # cherry has df=3/4 docs; a 0.5 df-cut leaves only durian scoring
    cut = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs_df, q, k=10, max_doc_freq=0.5).collect()
    }
    assert set(cut) == {2}  # only the durian doc remains a candidate
    assert set(full) == {0, 1, 2}  # exact path scores every cherry doc
