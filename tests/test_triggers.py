"""Row-trigger battery, distilled from the reference's MTR suite:

* issue581.test — BEFORE INSERT/UPDATE trigger sets ``new.copy`` from a
  correlated scalar subquery over a second table.
* issue364.test — AFTER INSERT trigger copies every inserted row into a
  mirror table.
* issue1318.test — BEFORE UPDATE trigger appends an audit row per
  updated row (constants + NEW values).
"""

from __future__ import annotations

import pytest

from stonedb_spark.sources.triggers import (
    create_trigger,
    delete_rows,
    drop_trigger,
    insert_rows,
    list_triggers,
    update_rows,
)


def _mk(spark, tmp_path, name, schema, rows):
    p = str(tmp_path / name)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
    return p


def _sorted(spark, path, key="id"):
    return [tuple(r) for r in spark.read.parquet(path).orderBy(key).collect()]


def test_before_insert_update_scalar_subquery_lookup(spark, tmp_path):
    # issue581: t1(id, copy); t2(id, data); triggers copy t2.data into t1.copy.
    t1 = _mk(spark, tmp_path, "t1", "id int, copy int", [])
    t2 = _mk(spark, tmp_path, "t2", "id int, data int", [(1, 1), (2, 2)])
    create_trigger(
        t1, "t1_bi", "BEFORE", "INSERT",
        set_exprs={"copy": "ref.data"},
        lookup={"table": t2, "on": "new.id = ref.id"},
    )
    create_trigger(
        t1, "t1_bu", "BEFORE", "UPDATE",
        set_exprs={"copy": "ref.data"},
        lookup={"table": t2, "on": "new.id = ref.id"},
    )
    ins = spark.createDataFrame([(1, 3), (2, 4), (3, 3)], "id int, copy int")
    insert_rows(spark, t1, ins)
    # Trigger overrode the inserted copy values; id=3 misses the lookup -> NULL.
    assert _sorted(spark, t1) == [(1, 1), (2, 2), (3, None)]

    # Statement sets copy=1, BEFORE UPDATE trigger overrides from t2 again.
    n = update_rows(spark, t1, {"copy": "1"}, "id = 2")
    assert n == 1
    assert _sorted(spark, t1) == [(1, 1), (2, 2), (3, None)]
    n = update_rows(spark, t1, {"copy": "1"}, "id = 3")
    assert n == 1
    assert _sorted(spark, t1) == [(1, 1), (2, 2), (3, None)]


def test_after_insert_mirrors_rows(spark, tmp_path):
    # issue364: AFTER INSERT ON t_test1 inserts NEW.* into t_test2.
    schema = "id int, first_name string, score int"
    t1 = _mk(spark, tmp_path, "t_test1", schema, [])
    t2 = _mk(spark, tmp_path, "t_test2", schema, [])
    create_trigger(
        t1, "insert_trigger_t_test2", "AFTER", "INSERT",
        insert_into={
            "table": t2,
            "select": {
                "id": "new.id",
                "first_name": "new.first_name",
                "score": "new.score",
            },
        },
    )
    insert_rows(
        spark, t1, spark.createDataFrame([(1, "zhang", 100), (2, "li", 90)], schema)
    )
    assert _sorted(spark, t2) == [(1, "zhang", 100), (2, "li", 90)]
    # A second statement appends again (per-statement firing).
    insert_rows(spark, t1, spark.createDataFrame([(3, "wang", 80)], schema))
    assert len(_sorted(spark, t2)) == 3


def test_before_update_audit_row_with_old_image(spark, tmp_path):
    # issue1318: BEFORE UPDATE ON employees writes an audit row; we also
    # exercise the OLD pre-image, which the reference trigger body can use.
    emp = _mk(
        spark, tmp_path, "employees",
        "id int, employeeNumber int, lastname string, action string",
        [(1, 1001, "smith", None), (2, 1002, "jones", None)],
    )
    audit = _mk(
        spark, tmp_path, "employees_audit",
        "employeeNumber int, lastname string, old_lastname string, action string",
        [],
    )
    create_trigger(
        emp, "before_employee_update", "BEFORE", "UPDATE",
        insert_into={
            "table": audit,
            "select": {
                "action": "'update'",
                "employeeNumber": "new.employeeNumber",
                "lastname": "new.lastname",
                "old_lastname": "old.lastname",
            },
        },
    )
    update_rows(spark, emp, {"lastname": "'brown'"}, "id = 1")
    got = _sorted(spark, audit, "employeeNumber")
    assert got == [(1001, "brown", "smith", "update")]
    # Untouched row survived, touched row updated.
    assert _sorted(spark, emp) == [
        (1, 1001, "brown", None),
        (2, 1002, "jones", None),
    ]


def test_after_delete_audit_and_null_where(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", "id int, v int", [(1, 10), (2, None), (3, 30)])
    log = _mk(spark, tmp_path, "log", "id int, v int", [])
    create_trigger(
        t, "t_ad", "AFTER", "DELETE",
        insert_into={"table": log, "select": {"id": "new.id", "v": "new.v"}},
    )
    # NULL predicate rows are NOT matched and NOT deleted (MySQL 3VL).
    n = delete_rows(spark, t, "v > 5")
    assert n == 2
    assert _sorted(spark, t) == [(2, None)]
    assert _sorted(spark, log) == [(1, 10), (3, 30)]


def test_trigger_catalog_and_errors(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", "id int", [(1,)])
    create_trigger(t, "tr1", "BEFORE", "INSERT", set_exprs={"id": "new.id + 1"})
    assert [x["name"] for x in list_triggers(t)] == ["tr1"]
    with pytest.raises(ValueError):  # duplicate name (MySQL 1359)
        create_trigger(t, "tr1", "AFTER", "INSERT")
    with pytest.raises(ValueError):  # NEW assignment in AFTER (MySQL 1362)
        create_trigger(t, "tr2", "AFTER", "UPDATE", set_exprs={"id": "1"})
    with pytest.raises(ValueError):  # NEW row in DELETE (MySQL 1363)
        create_trigger(t, "tr3", "BEFORE", "DELETE", set_exprs={"id": "1"})
    drop_trigger(t, "tr1")
    assert list_triggers(t) == []
    with pytest.raises(ValueError):  # unknown name (MySQL 1360)
        drop_trigger(t, "tr1")
    # With the catalog empty, DML is a plain append.
    insert_rows(spark, t, spark.createDataFrame([(9,)], "id int"))
    assert _sorted(spark, t) == [(1,), (9,)]
