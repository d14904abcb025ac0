"""Text analytics operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.text_analysis import (
    lang_scores,
    quality_scores,
    token_stats,
)


@pytest.fixture(scope="module")
def synth_docs(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog in a field", "en", "s", 48),
        (1, "el perro y la casa de un amigo que es grande", "es", "s", 44),
        (2, "der hund und die katze ist ein freund von uns", "de", "s", 45),
        (3, "xyzzy plugh qwerty", "zz", "s", 18),
        (4, "", "en", "s", 0),
        (5, None, "en", "s", 0),
        (6, "word " * 20, "en", "s", 100),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_token_stats(synth_docs):
    got = {r["doc_id"]: r for r in token_stats(synth_docs).collect()}
    assert got[0]["n_tokens"] == 11
    assert got[0]["n_uniq_tokens"] == 10  # 'the' twice
    assert got[4]["n_tokens"] == 0
    assert got[5]["n_tokens"] == 0
    assert got[5]["n_chars"] == 0
    assert got[6]["n_tokens"] == 20
    assert got[6]["n_uniq_tokens"] == 1
    assert got[0]["est_bpe_tokens"] == 11


def test_lang_id(synth_docs):
    got = {r["doc_id"]: r["guessed_lang"] for r in lang_scores(synth_docs).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "de"
    assert got[3] == "unknown"
    assert got[4] == "unknown"


def test_quality_scores(synth_docs):
    got = {r["doc_id"]: r for r in quality_scores(synth_docs).collect()}
    for r in got.values():
        assert 0.0 <= r["quality_score"] <= 1.0
    # well-formed english text scores high
    assert got[0]["quality_score"] >= 0.75
    # empty text scores at the floor
    assert got[4]["quality_score"] == 0.0
    # 20x repeated word: low uniq_ratio drags the score
    assert got[6]["uniq_ratio"] == 0.05
