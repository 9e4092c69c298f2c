"""Delta seam: the same merge/snapshot models run through the parquet
fallback AND (when delta-spark is importable) through real ``MERGE INTO``
/ delta-format writes, asserting identical results.  In this container
delta is absent, so the delta leg skips and the fallback leg pins the
semantics the Delta path must reproduce (ref:
tests/functional/adapter/incremental/, tests/functional/snapshots/).
"""

import pytest

from dbt_core_spark import Engine, ProjectDef
from dbt_core_spark.operators.delta_compat import (
    effective_format,
    have_delta,
    merge_build_sql,
)

FORMATS = [
    "parquet",
    pytest.param(
        "delta",
        marks=pytest.mark.skipif(
            not have_delta(), reason="delta-spark not installed"
        ),
    ),
]


@pytest.mark.parametrize("fmt", FORMATS)
def test_incremental_merge_two_paths(spark, schema, fmt):
    """Upsert via merge produces the same rows whether executed by the
    parquet anti-join fallback or Delta MERGE INTO."""
    p = ProjectDef(name="dseam")
    p.seeds["raw"] = [
        {"id": 1, "name": "ann", "note": "keep"},
        {"id": 2, "name": "bob", "note": "keep"},
    ]
    p.models["m"] = "select * from {{ ref('raw') }}"
    p.model_configs["m"] = {
        "materialized": "incremental",
        "unique_key": "id",
        "file_format": fmt,
        "merge_exclude_columns": ["note"],
    }
    eng = Engine(spark, p, schema=schema)
    assert eng.seed().ok()
    assert eng.run().ok()

    p.seeds["raw"] = [
        {"id": 2, "name": "bobby", "note": "CHANGED"},  # note excluded
        {"id": 3, "name": "cyd", "note": "new"},
    ]
    eng2 = Engine(spark, p, schema=schema)
    assert eng2.seed().ok()
    assert eng2.run().ok()

    rows = {r["id"]: (r["name"], r["note"]) for r in eng2.table("m").collect()}
    assert rows == {
        1: ("ann", "keep"),
        2: ("bobby", "keep"),   # name merged, excluded note retained
        3: ("cyd", "new"),
    }


@pytest.mark.parametrize("fmt", FORMATS)
def test_snapshot_two_paths(spark, schema, fmt):
    """SCD2 snapshot rows are format-independent: same dbt_valid_from/
    dbt_valid_to structure under parquet rebuild or delta writes."""
    p = ProjectDef(name="dseam_snap")
    p.seeds["raw"] = [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
    p.snapshots["snap"] = {
        "sql": "select * from {{ ref('raw') }}",
        "unique_key": "id",
        "strategy": "check",
        "check_cols": ["v"],
        "file_format": fmt,
    }
    eng = Engine(spark, p, schema=schema)
    assert eng.seed().ok()
    assert eng.snapshot().ok()

    p.seeds["raw"] = [{"id": 1, "v": "CHANGED"}, {"id": 2, "v": "b"}]
    eng2 = Engine(spark, p, schema=schema)
    assert eng2.seed().ok()
    assert eng2.snapshot().ok()

    rows = eng2.table("snap").collect()
    assert len(rows) == 3  # id=1 closed + reopened, id=2 untouched
    open_v1 = [
        r for r in rows if r["id"] == 1 and r["dbt_valid_to"] is None
    ]
    assert len(open_v1) == 1 and open_v1[0]["v"] == "CHANGED"
    closed_v1 = [
        r for r in rows if r["id"] == 1 and r["dbt_valid_to"] is not None
    ]
    assert len(closed_v1) == 1 and closed_v1[0]["v"] == "a"


def test_effective_format_fallback(caplog):
    """delta without a runtime degrades to parquet, warning once."""
    import logging

    with caplog.at_level(logging.WARNING, "dbt_core_spark.operators.delta_compat"):
        if have_delta():  # pragma: no cover — delta runtime present
            assert effective_format("delta", "db.t_eff") == "delta"
            return
        assert effective_format("delta", "db.t_eff") == "parquet"
        assert effective_format("delta", "db.t_eff") == "parquet"
    warns = [r for r in caplog.records if "falling back to parquet" in r.message]
    assert len(warns) == 1  # once per relation
    assert effective_format(None, "db.t2") == "parquet"
    assert effective_format("parquet", "db.t2") == "parquet"


def test_merge_build_sql_shape():
    """The MERGE INTO statement the Delta path will issue: keys null-safe
    in ON, excluded columns absent from UPDATE SET, predicates ANDed
    with DBT_INTERNAL_DEST rewritten to the target alias."""
    sql = merge_build_sql(
        "db.tgt", "src_v", ["id"], ["name"], ["id", "name", "note"],
        extra_conditions=["DBT_INTERNAL_DEST.ds > '2024-01-01'"],
    )
    assert "MERGE INTO db.tgt t USING src_v s" in sql
    assert "ON t.id = s.id AND (t.ds > '2024-01-01')" in sql
    assert "UPDATE SET t.name = s.name " in sql  # note/id not updated
    assert "INSERT (id, name, note) VALUES (s.id, s.name, s.note)" in sql


def test_merge_build_sql_empty_update_and_source_alias():
    """Two contract edges: (1) when every non-key column is excluded the
    WHEN MATCHED clause is omitted entirely (an empty UPDATE SET list is
    invalid SQL — the reference's merge macro drops the clause); (2)
    predicates referencing DBT_INTERNAL_SOURCE rewrite to the source
    alias ``s``."""
    sql = merge_build_sql("db.tgt", "src_v", ["id"], [], ["id", "name"])
    assert "WHEN MATCHED" not in sql
    assert "WHEN NOT MATCHED THEN INSERT (id, name)" in sql

    sql = merge_build_sql(
        "db.tgt", "src_v", ["id"], ["name"], ["id", "name"],
        extra_conditions=[
            "DBT_INTERNAL_SOURCE.ds >= DBT_INTERNAL_DEST.ds"
        ],
    )
    assert "(s.ds >= t.ds)" in sql
    assert "DBT_INTERNAL" not in sql
