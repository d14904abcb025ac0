"""Multimodal column plumbing: binary payloads, metadata plans, the
featurizer mapInPandas shape, and the gated decode seam."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.multimodal import (
    DeterministicFeaturizer,
    attach_media,
    decode_media,
    frame_sample_plan,
    media_features,
    resize_plan,
)
from vector_search_question_answer_api_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return attach_media(load_table(spark, sf_dir, "documents")).cache()


def test_media_schema(media):
    fields = dict(media.dtypes)
    assert fields["content"] == "binary"
    assert fields["media"].startswith("struct<media_type:string,width:int")


def test_media_metadata_derivation(media):
    rows = {r["doc_id"]: r["media"] for r in media.limit(50).collect()}
    for doc_id, m in rows.items():
        assert m["media_type"] == ["image", "audio", "video"][doc_id % 3]
        assert m["width"] == 320 + (doc_id % 5) * 160
        if m["media_type"] == "image":
            assert m["duration_s"] == 0
        if m["media_type"] == "audio":
            assert m["sample_rate"] == 16000


def test_features_match_local_featurizer(spark, media):
    feats = {
        r["doc_id"]: r["features"]
        for r in media_features(media.limit(10)).collect()
    }
    texts = {
        r["doc_id"]: r["content"]
        for r in media.limit(10).select("doc_id", "content").collect()
    }
    fz = DeterministicFeaturizer()
    for doc_id, content in texts.items():
        assert feats[doc_id] == pytest.approx(fz(bytes(content)), abs=0)
    # features are stable across runs and in [0, 1)
    for v in feats.values():
        assert len(v) == 8
        assert all(0.0 <= x < 1.0 for x in v)


def test_features_content_sensitivity():
    fz = DeterministicFeaturizer()
    a, b = fz(b"payload-a"), fz(b"payload-b")
    assert a != b
    assert fz(None) == [0.0] * 8
    assert hashlib.md5(b"payload-a").hexdigest()  # sanity: md5 available


def test_frame_plan_only_videos_and_stride(media):
    plan = frame_sample_plan(media, every_s=5)
    rows = plan.collect()
    assert all(r["frame_ts_s"] % 5 == 0 for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_ts_s"])
    for doc_id, frames in by_doc.items():
        assert doc_id % 3 == 2  # videos only
        dur = 5 + doc_id % 55
        assert sorted(frames) == list(range(0, dur, 5))


def test_resize_plan_geometry(media):
    rows = resize_plan(media, max_side=512).collect()
    for r in rows:
        assert max(r["target_width"], r["target_height"]) <= 512
        # aspect preserved within 1px of flooring
        if r["width"] >= r["height"]:
            assert r["target_width"] >= r["target_height"]
        if r["width"] <= 512 and r["height"] <= 512:
            assert (r["target_width"], r["target_height"]) == (
                r["width"],
                r["height"],
            )


def test_decode_seam_is_gated(media):
    with pytest.raises(NotImplementedError):
        decode_media(media)


def test_mongo_source_gated(spark):
    from vector_search_question_answer_api_spark.sources.mongo import read_documents_mongo

    with pytest.raises(NotImplementedError):
        read_documents_mongo(spark, "mongodb://localhost:27017/x")
