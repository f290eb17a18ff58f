import pytest
from pyspark.sql import functions as F

from etl_for_dumdums_spark.operators.enrich import (
    MAX_CHARS,
    categorize,
    score_sentiment,
    stub_scorer,
)
from etl_for_dumdums_spark.operators.multimodal import (
    decode_image,
    extract_features,
    media_metadata_stats,
    sample_frames,
    MEDIA_SCHEMA,
)


def test_stub_scorer_deterministic_and_bounded():
    a = stub_scorer(["hello world", "spark"])
    b = stub_scorer(["hello world", "spark"])
    assert a == b
    assert all(-1.0 <= s <= 1.0 for s in a)


def test_categorize_thresholds():
    assert categorize(0.3) == "positive"
    assert categorize(-0.3) == "negative"
    assert categorize(0.25) == "neutral"  # boundary is exclusive
    assert categorize(-0.25) == "neutral"


def test_score_sentiment_semantics(spark):
    df = spark.createDataFrame(
        [(1, "x" * 2000), (2, "short"), (3, None), (4, "a reasonably long comment text")],
        ["id", "text"],
    )
    rows = {r["id"]: r for r in score_sentiment(df).collect()}
    # short (<10 chars) and null → neutral 0.0
    assert rows[2]["sentiment_score"] == 0.0 and rows[2]["sentiment_label"] == "NEUTRAL"
    assert rows[3]["sentiment_score"] == 0.0
    # long text scored on the truncated prefix
    expected = stub_scorer(["x" * MAX_CHARS])[0]
    assert rows[1]["sentiment_score"] == pytest.approx(expected)
    assert rows[4]["sentiment_category"] in ("positive", "negative", "neutral")


def test_score_sentiment_error_path(spark):
    def broken(texts):
        raise RuntimeError("api down")

    df = spark.createDataFrame([(1, "some long enough text here")], ["id", "text"])
    row = score_sentiment(df, scorer=broken).collect()[0]
    assert row["sentiment_label"] == "ERROR"
    assert row["sentiment_score"] == 0.0
    assert row["sentiment_category"] == "neutral"


def _media_df(spark):
    rows = [
        (1, "image", b"imgbytes-1", "image/png", 64, 48, None),
        (2, "image", b"imgbytes-2", "image/png", 32, 32, None),
        (3, "video", b"vidbytes", "video/mp4", 640, 480, 3500),
        (4, "audio", None, "audio/wav", None, None, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_image_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"x")
    feat = decode_image(b"x", fake=True)
    assert len(feat) == 8 and feat == decode_image(b"x", fake=True)


def test_extract_features_shapes(spark):
    out = extract_features(_media_df(spark)).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["payload_bytes"] == len(b"imgbytes-1")
    assert len(by_id[1]["feature"]) == 8
    assert by_id[4]["feature"] is None and by_id[4]["digest"] is None
    # deterministic digest
    assert by_id[2]["digest"] == extract_features(_media_df(spark)).collect()[1]["digest"]


def test_media_metadata_stats_prunes_payload(spark):
    df = media_metadata_stats(_media_df(spark))
    rows = {r["kind"]: r for r in df.collect()}
    assert rows["image"]["n_assets"] == 2
    assert rows["video"]["total_duration_ms"] == 3500
    assert "payload" not in df.columns


def test_sample_frames_explodes_timestamps(spark):
    frames = sample_frames(_media_df(spark), every_ms=1000).collect()
    assert [f["frame_ts_ms"] for f in frames] == [0, 1000, 2000, 3000]


def test_resize_images_stub_contract(spark):
    from etl_for_dumdums_spark.operators.multimodal import resize_images, resize_payload

    with pytest.raises(NotImplementedError):
        resize_payload(b"x", 8, 8)
    out = resize_images(_media_df(spark), width=16, height=16).collect()
    by_id = {r["media_id"]: r for r in out}
    assert set(by_id) == {1, 2}  # image rows only
    assert by_id[1]["width"] == by_id[1]["height"] == 16
    # deterministic per (payload, target) and sized to the target area
    again = {r["media_id"]: r for r in resize_images(_media_df(spark), 16, 16).collect()}
    assert by_id[1]["payload"] == again[1]["payload"]
    assert len(by_id[1]["payload"]) == max(16, (16 * 16) // 64)
    assert by_id[1]["payload"] != by_id[2]["payload"]


# ---------------------------------------------------------------------------
# Token-window chunking (operators/chunking.py)
# ---------------------------------------------------------------------------
def _chunk_fixture(spark):
    docs = [
        (1, "one two three"),                                  # < W tokens: 1 chunk
        (2, " ".join(f"t{i}" for i in range(32))),             # exactly W: 1 chunk
        (3, " ".join(f"t{i}" for i in range(33))),             # W+1: 2 chunks
        (4, " ".join(f"t{i}" for i in range(100))),            # several chunks
        (5, " ".join(f"t{i}" for i in range(56))),             # 56 = 24+32: 2 full
        (6, "  padded   whitespace\tand\nnewlines  "),         # normalization
    ]
    return spark.createDataFrame(docs, ["doc_id", "text"])


def test_chunk_by_tokens_shapes(spark):
    from etl_for_dumdums_spark.operators.chunking import chunk_by_tokens

    out = chunk_by_tokens(_chunk_fixture(spark), chunk_tokens=32, stride=24)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    per_doc = {}
    for (d, _c), r in rows.items():
        per_doc.setdefault(d, []).append(r)
    assert len(per_doc[1]) == 1 and per_doc[1][0].n_tok == 3
    assert len(per_doc[2]) == 1 and per_doc[2][0].n_tok == 32
    # 33 tokens: starts 0 and 24; second chunk has 9 new-ish tokens (> W-S=8)
    assert len(per_doc[3]) == 2
    assert rows[(3, 1)].start_tok == 24 and rows[(3, 1)].n_tok == 9
    # every chunk bounded by W, starts are multiples of stride
    for r in rows.values():
        assert 1 <= r.n_tok <= 32
        assert r.start_tok == r.chunk_id * 24


def test_chunk_by_tokens_full_coverage_and_new_content(spark):
    from etl_for_dumdums_spark.operators.chunking import chunk_by_tokens

    df = _chunk_fixture(spark)
    out = chunk_by_tokens(df, chunk_tokens=32, stride=24).collect()
    # rebuild each doc's token index coverage from (start, n_tok)
    import collections

    cover = collections.defaultdict(set)
    for r in out:
        cover[r.doc_id].update(range(r.start_tok, r.start_tok + r.n_tok))
    for d, text in [(r.doc_id, r.text) for r in df.collect()]:
        n = len(text.strip().split())
        assert cover[d] == set(range(n)), f"doc {d} not fully covered"
    # each non-first chunk must contribute new tokens (n_tok > W - S)
    for r in out:
        if r.chunk_id > 0:
            assert r.n_tok > 32 - 24


def test_chunk_by_tokens_text_roundtrip(spark):
    from etl_for_dumdums_spark.operators.chunking import chunk_by_tokens

    df = _chunk_fixture(spark)
    out = chunk_by_tokens(df, chunk_tokens=32, stride=24)
    toks_by_doc = {
        r.doc_id: " ".join(r.text.strip().lower().split()).split(" ")
        for r in df.collect()
    }
    for r in out.collect():
        expected = " ".join(toks_by_doc[r.doc_id][r.start_tok : r.start_tok + r.n_tok])
        assert r.chunk_text == expected
    # metadata-only mode drops the payload column
    assert "chunk_text" not in chunk_by_tokens(df, keep_text=False).columns


def test_chunk_by_tokens_validates_stride(spark):
    from etl_for_dumdums_spark.operators.chunking import chunk_by_tokens

    with pytest.raises(ValueError):
        chunk_by_tokens(_chunk_fixture(spark), chunk_tokens=16, stride=17)
    with pytest.raises(ValueError):
        chunk_by_tokens(_chunk_fixture(spark), stride=0)
