"""Snapshot SCD-2 semantics (ref: tests/functional/snapshots/ —
test_basic_snapshot.py, test_check_cols_snapshot.py,
test_hard_delete_snapshot.py, test_snapshot_column_names.py)."""

from dbt_core_spark import Engine, ProjectDef

V1 = [
    {"id": 1, "email": "a@x.com", "updated_at": "2020-01-01 00:00:00"},
    {"id": 2, "email": "b@x.com", "updated_at": "2020-01-01 00:00:00"},
]
V2 = [
    {"id": 1, "email": "a2@x.com", "updated_at": "2020-02-01 00:00:00"},  # changed
    {"id": 2, "email": "b@x.com", "updated_at": "2020-01-01 00:00:00"},   # unchanged
    {"id": 3, "email": "c@x.com", "updated_at": "2020-02-01 00:00:00"},   # new
]


def _snap_project(rows, strategy_cfg):
    p = ProjectDef(name="snap")
    p.seeds["people"] = [
        {**r} for r in rows
    ]
    p.seed_configs["people"] = {"column_types": {"updated_at": "timestamp"}}
    p.snapshots["people_snapshot"] = {
        "sql": "select * from {{ ref('people') }}",
        "unique_key": "id",
        **strategy_cfg,
    }
    return p


def test_timestamp_snapshot_tracks_history(spark, schema):
    p = _snap_project(V1, {"strategy": "timestamp", "updated_at": "updated_at"})
    eng = Engine(spark, p, schema=schema)
    assert eng.seed().ok()
    assert eng.snapshot().ok()
    snap = spark.table(f"{schema}.people_snapshot")
    assert snap.count() == 2
    assert snap.filter("dbt_valid_to is null").count() == 2

    p.seeds["people"] = V2
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed()
    r = eng2.snapshot()
    assert r.ok(), [x.message for x in r.results]
    snap = spark.table(f"{schema}.people_snapshot")
    # id=1: two versions (closed + current); id=2: one; id=3: one
    assert snap.count() == 4
    cur = {r["id"]: r["email"] for r in snap.filter("dbt_valid_to is null").collect()}
    assert cur == {1: "a2@x.com", 2: "b@x.com", 3: "c@x.com"}
    closed = snap.filter("dbt_valid_to is not null").collect()
    assert len(closed) == 1 and closed[0]["id"] == 1
    assert str(closed[0]["dbt_valid_to"]).startswith("2020-02-01")
    # idempotent re-run: same source again changes nothing
    eng3 = Engine(spark, p, schema=schema)
    assert eng3.snapshot().ok()
    assert spark.table(f"{schema}.people_snapshot").count() == 4


def test_check_strategy(spark, schema):
    p = _snap_project(V1, {"strategy": "check", "check_cols": ["email"],
                           "snapshot_at": "2020-03-01 00:00:00"})
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.snapshot().ok()
    p.seeds["people"] = V2
    p.snapshots["people_snapshot"]["snapshot_at"] = "2020-04-01 00:00:00"
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed(); r = eng2.snapshot()
    assert r.ok(), [x.message for x in r.results]
    snap = spark.table(f"{schema}.people_snapshot")
    assert snap.count() == 4
    chg = snap.filter("id = 1").orderBy("dbt_valid_from").collect()
    assert str(chg[0]["dbt_valid_to"]).startswith("2020-04-01")
    assert chg[1]["dbt_valid_to"] is None


def test_hard_delete_invalidate(spark, schema):
    p = _snap_project(V1, {"strategy": "timestamp", "updated_at": "updated_at",
                           "hard_deletes": "invalidate",
                           "snapshot_at": "2020-06-01 00:00:00"})
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.snapshot().ok()
    p.seeds["people"] = [V1[0]]  # id=2 deleted upstream
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed(); assert eng2.snapshot().ok()
    snap = spark.table(f"{schema}.people_snapshot")
    dead = snap.filter("id = 2").collect()
    assert len(dead) == 1 and str(dead[0]["dbt_valid_to"]).startswith("2020-06-01")


def test_hard_delete_new_record(spark, schema):
    p = _snap_project(V1, {"strategy": "timestamp", "updated_at": "updated_at",
                           "hard_deletes": "new_record",
                           "snapshot_at": "2020-06-01 00:00:00"})
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.snapshot().ok()
    p.seeds["people"] = [V1[0]]
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed(); r = eng2.snapshot()
    assert r.ok(), [x.message for x in r.results]
    snap = spark.table(f"{schema}.people_snapshot")
    recs = snap.filter("id = 2").orderBy("dbt_valid_from").collect()
    assert len(recs) == 2
    assert recs[-1]["dbt_is_deleted"] == "True"
    assert recs[-1]["dbt_valid_to"] is None


def test_renamed_meta_columns(spark, schema):
    p = _snap_project(V1, {
        "strategy": "timestamp", "updated_at": "updated_at",
        "snapshot_meta_column_names": {
            "dbt_valid_from": "start_ts", "dbt_valid_to": "end_ts",
            "dbt_scd_id": "row_hash", "dbt_updated_at": "upd_ts"},
    })
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.snapshot().ok()
    cols = spark.table(f"{schema}.people_snapshot").columns
    assert {"start_ts", "end_ts", "row_hash", "upd_ts"} <= set(cols)
    assert "dbt_valid_from" not in cols


def test_valid_to_current_sentinel(spark, schema):
    """dbt_valid_to_current: open rows carry a sentinel timestamp instead
    of NULL (ref: v1/snapshot.py dbt_valid_to_current)."""
    p = _snap_project(V1, {"strategy": "timestamp", "updated_at": "updated_at",
                           "dbt_valid_to_current": "9999-12-31 00:00:00"})
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.snapshot().ok()
    snap = spark.table(f"{schema}.people_snapshot")
    assert snap.filter("dbt_valid_to = timestamp'9999-12-31 00:00:00'").count() == 2
    p.seeds["people"] = V2
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed(); r = eng2.snapshot()
    assert r.ok(), [x.message for x in r.results]
    snap = spark.table(f"{schema}.people_snapshot")
    cur = snap.filter("dbt_valid_to = timestamp'9999-12-31 00:00:00'")
    assert cur.count() == 3  # all three keys open, sentinel intact
    closed = snap.filter("dbt_valid_to <> timestamp'9999-12-31 00:00:00'")
    assert closed.count() == 1 and closed.collect()[0]["id"] == 1


def test_null_updated_at_keeps_current_row(spark, schema):
    """A NULL source updated_at must read as 'unchanged' — not drop the
    key's current row (reference MERGE leaves unmatched targets alone)."""
    p = _snap_project(V1, {"strategy": "timestamp", "updated_at": "updated_at"})
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.snapshot().ok()
    p.seeds["people"] = [
        {"id": 1, "email": "a@x.com", "updated_at": None},  # NULL ts
        {"id": 2, "email": "b@x.com", "updated_at": "2020-01-01 00:00:00"},
    ]
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed(); r = eng2.snapshot()
    assert r.ok(), [x.message for x in r.results]
    snap = spark.table(f"{schema}.people_snapshot")
    assert snap.count() == 2  # both keys still present, nothing dropped
    cur = {r["id"]: r["email"] for r in snap.filter("dbt_valid_to is null").collect()}
    assert cur == {1: "a@x.com", 2: "b@x.com"}


def test_new_record_flag_is_total(spark, schema):
    """With hard_deletes='new_record' every row carries dbt_is_deleted
    ('False' for live rows, 'True' only on deletion records) so filters
    like dbt_is_deleted = 'False' keep live rows."""
    p = _snap_project(V1, {"strategy": "timestamp", "updated_at": "updated_at",
                           "hard_deletes": "new_record",
                           "snapshot_at": "2020-06-01 00:00:00"})
    eng = Engine(spark, p, schema=schema)
    eng.seed(); assert eng.snapshot().ok()
    snap = spark.table(f"{schema}.people_snapshot")
    assert snap.filter("dbt_is_deleted = 'False'").count() == 2  # initial write total
    p.seeds["people"] = [V1[0]]  # id=2 deleted upstream
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed(); assert eng2.snapshot().ok()
    snap = spark.table(f"{schema}.people_snapshot")
    assert snap.filter("dbt_is_deleted is null").count() == 0  # flag is total
    assert snap.filter("dbt_is_deleted = 'True'").count() == 1
    live = snap.filter("dbt_is_deleted = 'False'")
    assert set(r["id"] for r in live.collect()) == {1, 2}  # closed id=2 row is 'False'
