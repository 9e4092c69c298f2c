"""Incremental materialization semantics
(ref: tests/functional/adapter/incremental/ — test_incremental_unique_id.py,
test_incremental_on_schema_change.py, test_incremental_predicates.py,
test_incremental_merge_exclude_columns.py)."""

import pytest

from dbt_core_spark import Engine, ProjectDef
from dbt_core_spark.plans.nodes import NodeType
from _slowmark import _mark_slow  # noqa: E402


def _seed_project(rows):
    p = ProjectDef(name="inc")
    p.seeds["raw"] = rows
    return p


ROWS_V1 = [
    {"id": 1, "name": "ann", "city": "nyc"},
    {"id": 2, "name": "bob", "city": "sf"},
]
ROWS_V2 = [
    {"id": 2, "name": "bobby", "city": "sf"},   # changed
    {"id": 3, "name": "cyd", "city": "la"},     # new
]


def _run_twice(spark, schema, model_sql, config, rows1=ROWS_V1, rows2=ROWS_V2):
    p = _seed_project(rows1)
    p.models["m"] = model_sql
    p.model_configs["m"] = config
    eng = Engine(spark, p, schema=schema)
    assert eng.seed().ok()
    r1 = eng.run()
    assert r1.ok(), [r.message for r in r1.results]
    # replace seed data, run again
    p.seeds["raw"] = rows2
    eng2 = Engine(spark, p, schema=schema)
    assert eng2.seed().ok()
    r2 = eng2.run()
    assert r2.ok(), [r.message for r in r2.results]
    return eng2


def test_incremental_append(spark, schema):
    eng = _run_twice(
        spark, schema, "select * from {{ ref('raw') }}",
        {"materialized": "incremental", "incremental_strategy": "append"},
    )
    assert eng.table("m").count() == 4  # 2 + 2, no dedup


def test_incremental_merge_unique_key(spark, schema):
    eng = _run_twice(
        spark, schema, "select * from {{ ref('raw') }}",
        {"materialized": "incremental", "unique_key": "id"},
    )
    rows = {r["id"]: r["name"] for r in eng.table("m").collect()}
    assert rows == {1: "ann", 2: "bobby", 3: "cyd"}  # upserted


def test_incremental_composite_key(spark, schema):
    rows1 = [{"state": "ca", "county": "sf", "pop": 1}, {"state": "ny", "county": "ny", "pop": 2}]
    rows2 = [{"state": "ca", "county": "sf", "pop": 9}, {"state": "ca", "county": "la", "pop": 3}]
    eng = _run_twice(
        spark, schema, "select * from {{ ref('raw') }}",
        {"materialized": "incremental", "unique_key": ["state", "county"]},
        rows1, rows2,
    )
    rows = {(r["state"], r["county"]): r["pop"] for r in eng.table("m").collect()}
    assert rows == {("ca", "sf"): 9, ("ny", "ny"): 2, ("ca", "la"): 3}


def test_incremental_merge_exclude_columns(spark, schema):
    eng = _run_twice(
        spark, schema, "select * from {{ ref('raw') }}",
        {"materialized": "incremental", "unique_key": "id",
         "merge_exclude_columns": ["city"]},
        [{"id": 1, "name": "ann", "city": "nyc"}],
        [{"id": 1, "name": "anne", "city": "tokyo"}],
    )
    row = eng.table("m").collect()[0]
    assert row["name"] == "anne" and row["city"] == "nyc"  # city kept


def test_incremental_full_refresh(spark, schema):
    p = _seed_project(ROWS_V1)
    p.models["m"] = "select * from {{ ref('raw') }}"
    p.model_configs["m"] = {"materialized": "incremental", "incremental_strategy": "append"}
    eng = Engine(spark, p, schema=schema)
    eng.seed(); eng.run(); eng.run()
    assert eng.table("m").count() == 4
    r = eng.run(full_refresh=True)
    assert r.ok()
    assert eng.table("m").count() == 2  # rebuilt from scratch


def test_on_schema_change_fail(spark, schema):
    p = _seed_project(ROWS_V1)
    p.models["m"] = "select id, name from {{ ref('raw') }}"
    p.model_configs["m"] = {"materialized": "incremental",
                            "incremental_strategy": "append",
                            "on_schema_change": "fail"}
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.run().ok()
    p.models["m"] = "select id, name, city from {{ ref('raw') }}"
    eng2 = Engine(spark, p, schema=schema)
    r = eng2.run()
    assert r.results[0].status == "error"
    assert "on_schema_change" in r.results[0].message


def test_on_schema_change_append_new_columns(spark, schema):
    p = _seed_project(ROWS_V1)
    p.models["m"] = "select id, name from {{ ref('raw') }}"
    p.model_configs["m"] = {"materialized": "incremental",
                            "incremental_strategy": "append",
                            "on_schema_change": "append_new_columns"}
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.run().ok()
    p.models["m"] = "select id, name, city from {{ ref('raw') }}"
    eng2 = Engine(spark, p, schema=schema)
    assert eng2.run().ok()
    df = eng2.table("m")
    assert "city" in df.columns
    # old rows have null city, new rows have values
    assert df.filter("city is null").count() == 2
    assert df.filter("city is not null").count() == 2


def test_on_schema_change_ignore_drops_new_cols(spark, schema):
    p = _seed_project(ROWS_V1)
    p.models["m"] = "select id, name from {{ ref('raw') }}"
    p.model_configs["m"] = {"materialized": "incremental",
                            "incremental_strategy": "append"}
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.run().ok()
    p.models["m"] = "select id, name, city from {{ ref('raw') }}"
    eng2 = Engine(spark, p, schema=schema)
    assert eng2.run().ok(), [r.message for r in eng2.run().results]
    assert "city" not in eng2.table("m").columns


def test_incremental_predicates_freeze_rows(spark, schema):
    """Rows excluded by the predicate are never merged over
    (ref: test_incremental_predicates.py)."""
    eng = _run_twice(
        spark, schema, "select * from {{ ref('raw') }}",
        {"materialized": "incremental", "unique_key": "id",
         "incremental_predicates": ["DBT_INTERNAL_DEST.id >= 2"]},
        [{"id": 1, "name": "ann", "city": "nyc"}, {"id": 2, "name": "bob", "city": "sf"}],
        [{"id": 1, "name": "HACKED", "city": "x"}, {"id": 2, "name": "bobby", "city": "sf"}],
    )
    rows = {r["id"]: r["name"] for r in eng.table("m").collect()}
    # id=1 frozen (predicate excludes it from merge); duplicate insert of
    # id=1 from source is the documented Delta behavior too
    assert rows[2] == "bobby"
    assert eng.table("m").filter("id = 1 and name = 'ann'").count() == 1


def _table_files(spark, rel, subdir=""):
    """{relative_path: md5} of data files under the table location."""
    import hashlib, os
    loc = None
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {rel}").collect():
        if (r["col_name"] or "").strip() == "Location":
            loc = r["data_type"]
    assert loc and loc.startswith("file:")
    root = loc[len("file:"):]
    out = {}
    for dirpath, _dirs, files in os.walk(os.path.join(root, subdir)):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(dirpath, f)
            with open(full, "rb") as fh:
                out[os.path.relpath(full, root)] = hashlib.md5(fh.read()).hexdigest()
    return out


@_mark_slow
def test_partition_scoped_merge_untouched_bytes(spark, schema):
    """A merge whose increment touches one partition must leave the other
    partitions' files byte-identical (no full-table rewrite)."""
    p = _seed_project([
        {"id": 1, "day": "2020-01-01", "v": 1},
        {"id": 2, "day": "2020-01-02", "v": 1},
        {"id": 3, "day": "2020-01-03", "v": 1},
    ])
    p.models["m"] = "select * from {{ ref('raw') }}"
    p.model_configs["m"] = {"materialized": "incremental", "unique_key": "id",
                            "partition_by": "day"}
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.run().ok()
    rel = f"{schema}.m"
    before = _table_files(spark, rel, "day=2020-01-01")
    # increment: update id=2 (day2) + insert id=4 (day2)
    p.seeds["raw"] = [
        {"id": 2, "day": "2020-01-02", "v": 9},
        {"id": 4, "day": "2020-01-02", "v": 9},
    ]
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed(); r = eng2.run()
    assert r.ok(), [x.message for x in r.results]
    after = _table_files(spark, rel, "day=2020-01-01")
    assert before == after  # untouched partition never rewritten
    rows = {r["id"]: r["v"] for r in eng2.table("m").collect()}
    assert rows == {1: 1, 2: 9, 3: 1, 4: 9}


def test_partition_scoped_merge_key_moves_partition(spark, schema):
    """A key whose partition value changes must not leave a stale copy in
    its old partition; a fully-emptied partition is dropped."""
    p = _seed_project([
        {"id": 1, "day": "2020-01-01", "v": 1},   # only row in day1
        {"id": 2, "day": "2020-01-02", "v": 1},
    ])
    p.models["m"] = "select * from {{ ref('raw') }}"
    p.model_configs["m"] = {"materialized": "incremental", "unique_key": "id",
                            "partition_by": "day"}
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.run().ok()
    # id=1 moves day1 → day3
    p.seeds["raw"] = [{"id": 1, "day": "2020-01-03", "v": 5}]
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed(); r = eng2.run()
    assert r.ok(), [x.message for x in r.results]
    rows = {(r["id"], r["day"]): r["v"] for r in eng2.table("m").collect()}
    assert rows == {(1, "2020-01-03"): 5, (2, "2020-01-02"): 1}  # no dup in day1


def test_insert_overwrite_partitions(spark, schema):
    p = _seed_project([
        {"id": 1, "day": "2020-01-01", "v": 1},
        {"id": 2, "day": "2020-01-02", "v": 1},
    ])
    p.models["m"] = "select * from {{ ref('raw') }}"
    p.model_configs["m"] = {"materialized": "incremental",
                            "incremental_strategy": "insert_overwrite",
                            "partition_by": "day"}
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.run().ok()
    # second run: only day 2 present → day 1 rows untouched, day 2 replaced
    p.seeds["raw"] = [{"id": 9, "day": "2020-01-02", "v": 2}]
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed(); r = eng2.run()
    assert r.ok(), [x.message for x in r.results]
    rows = {(r["day"], r["id"]): r["v"] for r in eng2.table("m").collect()}
    assert rows == {("2020-01-01", 1): 1, ("2020-01-02", 9): 2}


def test_partition_scoped_merge_quoted_partition_value(spark, schema):
    """A partition value containing a single quote must survive the
    emptied-partition DROP path (escaped literal, not malformed SQL)."""
    p = _seed_project([
        {"id": 1, "day": "O'Brien", "v": 1},   # only row in its partition
        {"id": 2, "day": "plain", "v": 1},
    ])
    p.models["m"] = "select * from {{ ref('raw') }}"
    p.model_configs["m"] = {"materialized": "incremental", "unique_key": "id",
                            "partition_by": "day"}
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.run().ok()
    # id=1 moves out of the quoted partition, emptying it → DROP PARTITION
    p.seeds["raw"] = [{"id": 1, "day": "moved", "v": 5}]
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed(); r = eng2.run()
    assert r.ok(), [x.message for x in r.results]
    rows = {(r["id"], r["day"]): r["v"] for r in eng2.table("m").collect()}
    assert rows == {(1, "moved"): 5, (2, "plain"): 1}


@_mark_slow
def test_unpartitioned_merge_warns_full_rewrite(spark, schema, caplog):
    """An incremental merge without partition_by on a target past the
    size threshold must warn (once) that every run rewrites the whole
    table — the silent 100 TB trap made loud."""
    import logging

    p = _seed_project([{"id": i, "day": "2020-01-01", "v": i} for i in range(50)])
    p.models["m"] = "select * from {{ ref('raw') }}"
    p.model_configs["m"] = {"materialized": "incremental", "unique_key": "id",
                            "full_rewrite_warn_bytes": 1}
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.run().ok()
    with caplog.at_level(logging.WARNING,
                         logger="dbt_core_spark.operators.materializations"):
        assert eng.run().ok()   # second run takes the merge path
        assert eng.run().ok()   # third run: warning must not repeat
    warns = [r for r in caplog.records if "rewrites the whole" in r.message]
    assert len(warns) == 1
    # partitioned targets never hit this path
    caplog.clear()
    p2 = _seed_project([{"id": i, "day": "2020-01-01", "v": i} for i in range(50)])
    p2.models["mp"] = "select * from {{ ref('raw') }}"
    p2.model_configs["mp"] = {"materialized": "incremental", "unique_key": "id",
                              "partition_by": "day",
                              "full_rewrite_warn_bytes": 1}
    eng2 = Engine(spark, p2, schema=schema)
    eng2.seed(); assert eng2.run().ok()
    with caplog.at_level(logging.WARNING,
                         logger="dbt_core_spark.operators.materializations"):
        assert eng2.run().ok()
    assert not [r for r in caplog.records if "rewrites the whole" in r.message]


# ---- hostile unique-key property fuzz (r5 verdict item 4: "NULL and
# duplicate unique_keys ... against full-refresh/oracle equivalence").
# The engine-gate fuzz tiers drive the materialization FLOWS, but their
# models aggregate by key, so NULL/duplicate source keys can never
# reach the merge there; this pins the merge kernel's contract
# directly:
#   - a non-NULL key matches by equality: target rows with a key
#     present in the source are replaced by exactly ONE source row per
#     key (duplicate source keys collapse; WHICH duplicate survives is
#     explicitly unspecified — Delta MERGE errors on them, the
#     parquet fallback dedups — so values are only compared for keys
#     with a unique source row);
#   - NULL keys never match (SQL MERGE ON equality): NULL-key target
#     rows survive untouched AND every NULL-key source row appends.
from hypothesis import HealthCheck as _HC
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st

_kv_rows = _st.lists(
    _st.tuples(_st.one_of(_st.none(), _st.integers(0, 3)),
               _st.integers(0, 99)),
    min_size=0, max_size=12,
)


@_mark_slow
@_settings(max_examples=12, deadline=None,
           suppress_health_check=[_HC.function_scoped_fixture])
@_given(tgt=_kv_rows, src=_kv_rows)
def test_merge_frames_null_and_duplicate_keys(spark, tgt, src):
    from dbt_core_spark.operators.materializations import _merge_frames

    schema_ = "id int, v int"
    target = spark.createDataFrame(tgt, schema_)
    source = spark.createDataFrame(src, schema_)
    out = [(r["id"], r["v"]) for r in
           _merge_frames(target, source, ["id"], [], [], False).collect()]

    src_keys = {k for k, _ in src if k is not None}
    expected_keys = sorted(
        (
            [k for k, _ in tgt if k is None]            # NULL targets kept
            + [k for k, _ in tgt
               if k is not None and k not in src_keys]  # unmatched kept
            + [k for k, _ in src if k is None]          # NULL sources append
            + sorted(src_keys)                          # one row per src key
        ),
        key=lambda x: (x is None, x),
    )
    assert sorted((k for k, _ in out),
                  key=lambda x: (x is None, x)) == expected_keys
    # value check where deterministic: unique-source-key rows
    from collections import Counter
    src_key_counts = Counter(k for k, _ in src if k is not None)
    for k, v in src:
        if k is not None and src_key_counts[k] == 1:
            assert (k, v) in out
    # NULL-key rows carry values verbatim from both sides
    null_vals = sorted(v for k, v in out if k is None)
    assert null_vals == sorted(
        [v for k, v in tgt if k is None] + [v for k, v in src if k is None])


@_mark_slow
@_settings(max_examples=6, deadline=None,
           suppress_health_check=[_HC.function_scoped_fixture])
@_given(tgt=_kv_rows, src=_kv_rows)
def test_merge_frames_delete_insert_keeps_all_source_rows(spark, tgt, src):
    """delete+insert: ALL source rows land (dbt's tested behavior keeps
    duplicates), matched target rows drop, NULL-key semantics as
    above."""
    from dbt_core_spark.operators.materializations import _merge_frames

    schema_ = "id int, v int"
    out = [(r["id"], r["v"]) for r in _merge_frames(
        spark.createDataFrame(tgt, schema_),
        spark.createDataFrame(src, schema_),
        ["id"], [], [], True).collect()]
    src_keys = {k for k, _ in src if k is not None}
    expected = sorted(
        [r for r in tgt if r[0] is None or r[0] not in src_keys] + src,
        key=lambda r: (r[0] is None, r[0], r[1]),
    )
    assert sorted(out, key=lambda r: (r[0] is None, r[0], r[1])) == expected


_col_pool = ["a", "b", "c"]


@_mark_slow
@_settings(max_examples=8, deadline=None,
           suppress_health_check=[_HC.function_scoped_fixture])
@_given(
    cols1=_st.sets(_st.sampled_from(_col_pool), min_size=1),
    cols2=_st.sets(_st.sampled_from(_col_pool), min_size=1),
    mode=_st.sampled_from(
        ["ignore", "append_new_columns", "sync_all_columns", "fail"]),
)
def test_on_schema_change_drift_property(spark, cols1, cols2, mode):
    """Schema drift mid-stream (r5 verdict item 4): the second
    incremental batch selects a RANDOM column subset under each
    on_schema_change mode.  Expected schemas (the reference's
    test_incremental_on_schema_change.py contract):
      ignore             -> target keeps run-1 columns exactly
      append_new_columns -> run-1 columns + new columns (old rows NULL)
      sync_all_columns   -> exactly run-2 columns (+ key)
      fail               -> run errors iff the column set changed
    Values: updated/inserted rows carry batch values, columns the
    batch lacks are NULL for those rows; surviving rows keep theirs."""
    import uuid

    from dbt_core_spark import Engine, ProjectDef

    schema = f"drift_{uuid.uuid4().hex[:8]}"
    c1, c2 = sorted(cols1), sorted(cols2)

    def proj(cols, mult):
        return ", ".join([f"id"] + [f"id * {mult * (i + 2)} as {c}"
                                    for i, c in enumerate(cols)])

    p = ProjectDef(name="d")
    p.seeds["raw"] = [{"id": i} for i in range(4)]
    p.models["m"] = (
        "{{ config(materialized='incremental', unique_key='id', "
        f"on_schema_change='{mode}') }}}}"
        f" select {proj(c1, 1)} from {{{{ ref('raw') }}}} "
        "{% if is_incremental() %} where id >= 2 {% endif %}"
    ).replace("}}}} ", "}} ", 1)
    eng = Engine(spark, p, schema=schema)
    try:
        eng.seed()
        assert eng.run().ok()
        # second run: same model name, drifted projection
        p.models["m"] = (
            "{{ config(materialized='incremental', unique_key='id', "
            f"on_schema_change='{mode}') }}}}"
            f" select {proj(c2, 10)} from {{{{ ref('raw') }}}} "
            "{% if is_incremental() %} where id >= 2 {% endif %}"
        ).replace("}}}} ", "}} ", 1)
        eng2 = Engine(spark, p, schema=schema)
        eng2.seed()
        res = eng2.run()
        drifted = c1 != c2
        if mode == "fail" and drifted:
            assert not res.ok()
            return
        assert res.ok(), str([r.message for r in res.results])
        out = spark.table(f"{schema}.m")
        got_cols = sorted(c for c in out.columns if c != "id")
        if mode == "ignore":
            want_cols = c1
        elif mode == "append_new_columns":
            want_cols = sorted(set(c1) | set(c2))
        else:  # sync_all_columns, or fail without drift
            want_cols = c2 if mode == "sync_all_columns" else c1
        assert got_cols == want_cols, (mode, c1, c2, got_cols)
        rows = {r["id"]: r.asDict() for r in out.collect()}
        assert set(rows) == {0, 1, 2, 3}
        for i, r in rows.items():
            batch = i >= 2  # ids 2,3 came from the drifted second batch
            for j, c in enumerate(want_cols):
                if batch:
                    exp = (10 * (c2.index(c) + 2) * i) if c in c2 else None
                else:
                    exp = (1 * (c1.index(c) + 2) * i) if c in c1 else None
                assert r.get(c) == exp, (mode, c1, c2, i, c, r)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
        spark.sql(f"DROP DATABASE IF EXISTS {schema}__sources CASCADE")
