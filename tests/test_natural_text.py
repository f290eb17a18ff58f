"""Text-operator family over a NATURAL-LANGUAGE fixture (r4 verdict #6).

All text operators are oracled at the driver SFs on synthetic TPC-H-derived
strings; this suite validates them on public-domain prose in the four
marker languages plus crawl-style junk (tests/fixtures.py NATURAL_DOCS) —
text that behaves like the 100 TB target domain:

* semantic pins: both language-ID variants classify real en/de/fr/es prose
  correctly (junk → unknown), PII counts are the hand-computed exact
  values, quality/repetition buckets land where the thresholds say;
* full Spark-vs-DuckDB oracle parity for EVERY oracled text_* query over
  the same corpus — the synthetic-corpus green was not a word-salad
  artifact.
"""

import duckdb
import pytest

from etl_for_dumdums_spark.catalog import (
    EXTRA_ORACLE,
    EXTRA_QUERIES,
    ORACLE,
    QUERIES,
    load_all,
)

from .fixtures import NATURAL_DOCS, write_natural_docs
from .oracle_util import assert_matches_duckdb

load_all()
_Q = {**QUERIES, **EXTRA_QUERIES}
_SQL = {**ORACLE, **EXTRA_ORACLE}


@pytest.fixture(scope="module")
def natural_sf(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("natural"))
    return write_natural_docs(spark, out)


@pytest.fixture(scope="module")
def natural_con(natural_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{natural_sf}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_langid_marker_classifies_real_prose(spark, natural_sf):
    got = _rows(_Q["text_langid_confusion"](spark, natural_sf))
    assert got == [
        ("de", "de", 1),
        ("en", "en", 3),  # Melville, Austen, and the support-page doc
        ("en", "unknown", 2),  # "buy now" spam + 2-word stub: no markers
        ("es", "es", 1),
        ("fr", "fr", 1),
    ]


def test_langid_trigram_classifies_real_prose(spark, natural_sf):
    got = _rows(_Q["text_langid_ngram"](spark, natural_sf))
    assert got == [
        ("de", "de", 1),
        ("en", "en", 3),
        ("en", "unknown", 2),
        ("es", "es", 1),
        ("fr", "fr", 1),
    ]


def test_pii_scan_exact_counts_on_natural_text(spark, natural_sf):
    """doc 6 plants exactly 2 lowercase emails, one 555-XXXX phone, one
    dotted-quad IP. Hand-computed redact delta:
    alice@example.com(17)->:<EMAIL>(7)=10, bob123@mail.org(15)->8,
    555-0199(8)-><PHONE>(7)=1, 192.168.1.10(12)-><IP>(4)=8; total 27.
    Every other doc (and every non-en slice) must scan clean — doc_ids
    avoid the %7/%11/%13 injection branches by construction."""
    got = _rows(_Q["text_pii_scan"](spark, natural_sf))
    assert got == [
        ("de", 1, 0, 0, 0, 0, 0, 0, 0),
        ("en", 5, 1, 2, 1, 1, 1, 1, 27),
        ("es", 1, 0, 0, 0, 0, 0, 0, 0),
        ("fr", 1, 0, 0, 0, 0, 0, 0, 0),
    ]


def test_quality_buckets_on_natural_text(spark, natural_sf):
    """English prose + the PII doc land in 'ok'; non-English prose lands in
    'no_stopwords' (the heuristic is English-marker-based — its stated
    behavior, pinned so a marker-list change is loud); the spam doc has no
    stopwords; the 2-word stub is too_short."""
    got = {
        (r["source"], r["quality_bucket"]): r["n_docs"]
        for r in _Q["text_quality_score"](spark, natural_sf).collect()
    }
    assert got == {
        ("gutenberg", "ok"): 2,  # Melville + Austen
        ("gutenberg", "no_stopwords"): 3,  # de/fr/es prose, en-marker scan
        ("crawl", "ok"): 1,  # the support-page doc
        ("crawl", "no_stopwords"): 1,  # "buy now" * 30
        ("crawl", "too_short"): 1,  # "hello world"
    }


def test_repetition_gopher_flags_spam_not_prose(spark, natural_sf):
    """Real prose in every language rates 'ok'; the "buy now" spam (and the
    degenerate 2-word stub) trip top_word_heavy — the Gopher-style gate
    does separate natural text from loops."""
    got = {
        (r["lang"], r["repetition_bucket"]): r["n_docs"]
        for r in _Q["text_repetition_gopher"](spark, natural_sf).collect()
    }
    assert got == {
        ("de", "ok"): 1,
        ("en", "ok"): 3,
        ("en", "top_word_heavy"): 2,
        ("es", "ok"): 1,
        ("fr", "ok"): 1,
    }


# derives its benchmark-split labels by integer-parsing the synthetic
# "src<NN>" source naming — structurally inapplicable to natural sources
_SYNTHETIC_ONLY = {"text_contamination_check"}


def _oracled_text_queries():
    return sorted(
        n
        for n in _Q
        if n.startswith("text_")
        and _SQL.get(n) is not None
        and n not in _SYNTHETIC_ONLY
    )


@pytest.mark.parametrize("name", _oracled_text_queries())
def test_text_family_oracle_parity_on_natural_text(spark, natural_sf, natural_con, name):
    """Every oracled text_* query agrees with its DuckDB restatement on the
    natural-language corpus — same gate as the synthetic sweep, run on
    target-domain text (accents stripped to ASCII in the fixture; the
    synthetic sweep already covers multibyte via the zh/ja doc rows)."""
    assert_matches_duckdb(_Q[name](spark, natural_sf), natural_con, _SQL[name])


def test_fixture_docids_skip_injection_branches():
    assert all(i % 7 and i % 11 and i % 13 for i, *_ in NATURAL_DOCS)
