"""Dedup graph operators (engine extension)."""

from dbt_core_spark.operators.dedup import connected_components


def test_connected_components_chain(spark):
    """Transitive chains collapse to one component labeled by min id —
    the case single-link one-pass dedup gets wrong."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 3)], "id_a long, id_b long")
    got = {(r.id, r.component) for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (5, 1), (10, 10), (11, 10)}


def test_connected_components_converges_early(spark):
    """A single pair converges without exhausting max_iter."""
    pairs = spark.createDataFrame([(7, 9)], "id_a long, id_b long")
    out = connected_components(pairs, max_iter=25)
    assert {(r.id, r.component) for r in out.collect()} == {(7, 7), (9, 7)}
