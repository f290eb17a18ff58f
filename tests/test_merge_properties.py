"""Property-based MERGE semantics: any sequence of keyed upsert batches must
leave the store equal to a dict updated in the same order (last write wins,
no duplicates, no losses)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_for_dumdums_spark.io import merge_table

_batches = st.lists(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), st.text("ab", max_size=3)),
        min_size=1,
        max_size=5,
        unique_by=lambda kv: kv[0],  # source batches are unique on the pk
    ),
    min_size=1,
    max_size=4,
)


@given(batches=_batches)
@settings(
    max_examples=10,  # each example costs several Spark jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_equals_dict_semantics(spark, tmp_path_factory, batches):
    path = str(tmp_path_factory.mktemp("prop") / "store")
    expected: dict[int, str] = {}
    for batch in batches:
        merge_table(
            spark, spark.createDataFrame(batch, ["id", "val"]), path, "id"
        )
        expected.update(dict(batch))
    got = {r["id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert got == expected
