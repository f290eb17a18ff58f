"""Pin the r9 dedup_prefix_jaccard rewrite to the original direct form.

The rewrite (exact-dedup collapse of identical normalized texts before the
PPJoin, plus md5-fold token fingerprints) must produce EXACTLY the rows of
the original string-token, no-collapse form — candidates and filters depend
only on token sets, which are group-invariant, so the expansion is an
identity. Verified here by running both forms in DuckDB on the real
testdata (the replicated corpora that triggered the r9 disk deaths have the
same duplicate-group structure, just bigger).
"""

import duckdb
import pytest

from etl_for_dumdums_spark.catalog.dedup import _prefix_jaccard_sql

# the pre-r9 direct form, kept verbatim as the semantic reference
_DIRECT_SQL = """
    WITH arr AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS a
      FROM documents{where}),
    toks AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(a) - 1),
                                   i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS w
      FROM arr WHERE len(a) >= 3),
    dfreq AS (SELECT w, count(*) AS df FROM toks GROUP BY w),
    sized AS (SELECT doc_id, count(*) AS s FROM toks GROUP BY doc_id),
    ranked AS (
      SELECT t.doc_id, t.w,
             row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.w) AS rk
      FROM toks t JOIN dfreq d USING (w)),
    prefix AS (
      SELECT r.doc_id, r.w
      FROM ranked r JOIN sized z USING (doc_id)
      WHERE r.rk <= z.s - (4 * z.s + 4) // 5 + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM prefix a JOIN prefix b ON a.w = b.w AND a.doc_id < b.doc_id),
    sized_cand AS (
      SELECT c.da, c.db, za.s AS sa, zb.s AS sb
      FROM cand c JOIN sized za ON za.doc_id = c.da
                  JOIN sized zb ON zb.doc_id = c.db
      WHERE 5 * least(za.s, zb.s) >= 4 * greatest(za.s, zb.s)),
    inter AS (
      SELECT c.da, c.db, max(c.sa) AS sa, max(c.sb) AS sb, count(*) AS n_shared
      FROM sized_cand c
      JOIN toks ta ON ta.doc_id = c.da
      JOIN toks tb ON tb.doc_id = c.db AND tb.w = ta.w
      GROUP BY c.da, c.db)
    SELECT da, db, n_shared, sa, sb,
           round(n_shared * 1.0 / (sa + sb - n_shared), 4) AS jaccard
    FROM inter
    WHERE 9 * n_shared >= 4 * (sa + sb)
    ORDER BY da, db
"""


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize(
    "sf_dir,where",
    [
        ("/root/testdata/sf0.001", ""),
        ("/root/testdata/sf0.01", ""),
        ("/root/testdata/sf0.01", " WHERE doc_id % 10 = 0"),
    ],
)
def test_collapsed_form_equals_direct_form(sf_dir, where):
    con = _con(sf_dir)
    direct = con.execute(_DIRECT_SQL.format(where=where)).fetchall()
    grouped = con.execute(_prefix_jaccard_sql(where)).fetchall()
    assert grouped == direct


def test_collapsed_form_expands_duplicate_groups():
    """Synthetic corpus with a 3-member identical group, one near-dup of it,
    and one unrelated doc: the collapse must emit all 3 within-group pairs
    at jaccard 1.0 and all 3 cross-group pairs, nothing else."""
    con = duckdb.connect()
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different text with no overlap whatsoever in any form at all"
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(1, '{base}'), (2, '{base}'), (3, '{base}'), (4, '{near}'), (5, '{other}')"
        ") AS t(doc_id, text)"
    )
    rows = con.execute(_prefix_jaccard_sql()).fetchall()
    pairs = {(r[0], r[1]): r for r in rows}
    assert set(pairs) == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)}
    for p in ((1, 2), (1, 3), (2, 3)):
        assert pairs[p][5] == 1.0  # identical-group pairs
    # cross-group pairs share the rep pair's stats
    assert pairs[(1, 4)][2:] == pairs[(2, 4)][2:] == pairs[(3, 4)][2:]
    assert pairs[(1, 4)][5] < 1.0
