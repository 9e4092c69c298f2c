import os
import shutil
import sys
import uuid

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_core_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
_WH = f"/tmp/dbt_core_spark_test_wh_{uuid.uuid4().hex[:8]}"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dbt_core_spark_tests",
        master="local[8]",
        extra_conf={
            "spark.sql.warehouse.dir": _WH,
            "spark.sql.shuffle.partitions": "8",
        },
    )
    yield s
    s.stop()
    shutil.rmtree(_WH, ignore_errors=True)


@pytest.fixture()
def schema(spark):
    name = f"t_{uuid.uuid4().hex[:10]}"
    yield name
    for db in (name, f"{name}__sources", f"{name}_dbt_test__audit"):
        spark.sql(f"DROP DATABASE IF EXISTS `{db}` CASCADE")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: builder-floor tier (fuzz sweeps, cross-engine replays, "
        "multi-second compositions) — deselected by default so the "
        "driver's budgeted gate runs the quick tier; run everything "
        "with SPARK_GRAFT_FULL_TESTS=1 or select with -m slow "
        "(see tests/_slowmark.py)")


def pytest_collection_modifyitems(config, items):
    """Default = quick tier (r11 verdict item 3: the 41-minute full
    suite exceeds the driver's pytest budget and xdist is unavailable).
    SPARK_GRAFT_FULL_TESTS=1 or an explicit -m expression runs exactly
    what was asked."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    if config.getoption("-m"):
        return
    selected, deselected = [], []
    for item in items:
        (deselected if "slow" in item.keywords else selected).append(item)
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected
