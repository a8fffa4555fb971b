"""Dataset-check unit tests: null semantics (nulls_distinct, null_safe FK,
eqNullSafe matching), tolerances, filters — the SURVEY §7.3 watch items."""

import json

import pytest
from pyspark.sql import functions as F

import dqx_spark.functions as C
from dqx_spark import DQEngine, DQDatasetRule
from dqx_spark.engine import ExtraParams

RUN_TS = "2024-06-01 00:00:00"


def fired_ids(spark, df, rule, ref_dfs=None, id_col="id"):
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(df, [rule], ref_dfs=ref_dfs)
    return {r[id_col] for r in checked.where(F.col("_errors").isNotNull() | F.col("_warnings").isNotNull()).collect()}


def test_is_unique_nulls_distinct(spark):
    df = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, None), (3, None), (4, "b")], "id int, k string"
    )
    # ANSI: null keys are distinct from each other -> only the 'a' pair fires
    assert fired_ids(spark, df, DQDatasetRule(check_func=C.is_unique, columns=["k"])) == {0, 1}
    # nulls_distinct=False: the two null keys ARE duplicates
    assert fired_ids(
        spark, df, DQDatasetRule(check_func=C.is_unique, columns=["k"], check_func_kwargs={"nulls_distinct": False})
    ) == {0, 1, 2, 3}
    # composite key + filter: filtered-out rows don't count toward duplicates
    df2 = spark.createDataFrame([(0, 1, "x"), (1, 1, "x"), (2, 1, "y")], "id int, a int, b string")
    assert fired_ids(
        spark, df2,
        DQDatasetRule(check_func=C.is_unique, columns=["a"], filter="b = 'x'"),
    ) == {0, 1}


def test_is_unique_join_strategy_parity(spark):
    df = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, None), (3, None), (4, "b")], "id int, k string"
    )
    for kwargs in ({}, {"nulls_distinct": False}):
        window = fired_ids(
            spark, df, DQDatasetRule(check_func=C.is_unique, columns=["k"], check_func_kwargs=kwargs)
        )
        join = fired_ids(
            spark,
            df,
            DQDatasetRule(
                check_func=C.is_unique, columns=["k"], check_func_kwargs={**kwargs, "strategy": "join"}
            ),
        )
        assert window == join, kwargs
    # filter parity
    df2 = spark.createDataFrame([(0, 1, "x"), (1, 1, "x"), (2, 1, "y")], "id int, a int, b string")
    assert fired_ids(
        spark, df2,
        DQDatasetRule(check_func=C.is_unique, columns=["a"], filter="b = 'x'",
                      check_func_kwargs={"strategy": "join"}),
    ) == {0, 1}


def test_is_unique_join_strategy_plan(spark, lineitem):
    import contextlib
    import io

    from dqx_spark import DQEngine
    from dqx_spark.engine import ExtraParams

    e = DQEngine(extra_params=ExtraParams(run_time_overwrite="2024-06-01 00:00:00"))
    checked = e.apply_checks(
        lineitem,
        [DQDatasetRule(check_func=C.is_unique, columns=["l_orderkey", "l_linenumber"],
                       check_func_kwargs={"strategy": "join"})],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        checked.explain()
    p = buf.getvalue()
    # dup keys come back as a broadcast; the full row stream never shuffles
    # and no window partition can hotspot on a skewed key
    assert "BroadcastHashJoin" in p
    assert "Window" not in p
    assert "SortMergeJoin" not in p


def test_foreign_key_null_semantics(spark):
    df = spark.createDataFrame([(0, 1), (1, 99), (2, None)], "id int, fk int")
    ref = spark.createDataFrame([(1,), (2,), (None,)], "rk int")
    # standard: null FK passes, 99 missing
    assert fired_ids(
        spark, df,
        DQDatasetRule(check_func=C.foreign_key, columns=["fk"],
                      check_func_kwargs={"ref_columns": ["rk"], "ref_df_name": "r"}),
        ref_dfs={"r": ref},
    ) == {1}
    # null_safe: null matches the null ref key -> still only 99 fires
    assert fired_ids(
        spark, df,
        DQDatasetRule(check_func=C.foreign_key, columns=["fk"],
                      check_func_kwargs={"ref_columns": ["rk"], "ref_df_name": "r", "null_safe": True}),
        ref_dfs={"r": ref},
    ) == {1}
    # null_safe against a ref WITHOUT nulls: the null row now fires
    ref2 = spark.createDataFrame([(1,)], "rk int")
    assert fired_ids(
        spark, df,
        DQDatasetRule(check_func=C.foreign_key, columns=["fk"],
                      check_func_kwargs={"ref_columns": ["rk"], "ref_df_name": "r", "null_safe": True}),
        ref_dfs={"r": ref2},
    ) == {1, 2}
    # negate: existence is the violation
    assert fired_ids(
        spark, df,
        DQDatasetRule(check_func=C.foreign_key, columns=["fk"],
                      check_func_kwargs={"ref_columns": ["rk"], "ref_df_name": "r", "negate": True}),
        ref_dfs={"r": ref},
    ) == {0}


def test_aggr_tolerances_and_nulls(spark):
    df = spark.createDataFrame([(0, 10.0), (1, 20.0), (2, None)], "id int, v double")
    # avg = 15; abs tolerance 6 covers limit 20
    assert fired_ids(
        spark, df,
        DQDatasetRule(check_func=C.is_aggr_equal, column="v",
                      check_func_kwargs={"limit": 20.0, "aggr_type": "avg", "abs_tolerance": 6.0}),
    ) == set()
    assert fired_ids(
        spark, df,
        DQDatasetRule(check_func=C.is_aggr_equal, column="v",
                      check_func_kwargs={"limit": 20.0, "aggr_type": "avg", "abs_tolerance": 1.0}),
    ) == {0, 1, 2}
    # grouped with null group key: the null group still gets its verdict
    df2 = spark.createDataFrame([(0, "a", 5.0), (1, "a", 5.0), (2, None, 100.0)], "id int, g string, v double")
    assert fired_ids(
        spark, df2,
        DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="v",
                      check_func_kwargs={"limit": 50.0, "aggr_type": "sum", "group_by": ["g"]}),
    ) == {2}
    # count with '*'
    assert fired_ids(
        spark, df2,
        DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="*",
                      check_func_kwargs={"limit": 2, "aggr_type": "count"}),
    ) == {0, 1, 2}


def test_compare_datasets_details(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0, {"m": 1}), (2, "b", 2.0, {"m": 2}), (3, "c", 3.0, None)],
        "pk int, s string, v double, mp map<string,int>",
    )
    ref = spark.createDataFrame(
        [(1, "a", 1.0, {"m": 9}), (2, "CHANGED", 2.0, {"m": 2}), (4, "d", 4.0, None)],
        "pk int, s string, v double, mp map<string,int>",
    )
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    rule = DQDatasetRule(
        check_func=C.compare_datasets,
        check_func_kwargs={"columns": ["pk"], "ref_columns": ["pk"], "ref_df_name": "r",
                           "check_missing_records": True},
    )
    checked = engine.apply_checks(df, [rule], ref_dfs={"r": ref})
    rows = checked.collect()
    by_pk = {r["pk"]: r for r in rows}
    # map column is skipped -> pk 1 matches despite differing maps
    assert by_pk[1]["_errors"] is None
    msg2 = json.loads(by_pk[2]["_errors"][0]["message"])
    assert msg2["changed"]["s"]["ref"] == "CHANGED"
    msg3 = json.loads(by_pk[3]["_errors"][0]["message"])
    assert msg3["row_extra"] is True
    # ref-only row appended carrying the REFERENCE key (coalesced PK,
    # matching the upstream :2924-2927 semantics) + row_missing
    assert 4 in by_pk
    assert json.loads(by_pk[4]["_errors"][0]["message"])["row_missing"] is True
    assert all(r["pk"] is not None for r in rows)
    assert checked.count() == 4


def test_sql_query_dataset_level(spark):
    df = spark.createDataFrame([(0, 5), (1, 50)], "id int, v int")
    # dataset-level verdict: all rows flagged when any v > 10
    rule = DQDatasetRule(
        check_func=C.sql_query,
        check_func_kwargs={
            "query": "SELECT max(v) > 10 AS condition FROM {{ input }}",
            "msg": "some v too large",
        },
    )
    assert fired_ids(spark, df, rule) == {0, 1}
    with pytest.raises(ValueError):
        C.sql_query("DROP TABLE x")


def test_time_window_checks_edges(spark):
    rows = [
        (0, "2024-01-01 00:10:00"), (1, "2024-01-01 00:20:00"),  # hour 0: 2 rows
        (2, "2024-01-01 01:10:00"),                              # hour 1: 1 row
        (3, "2024-01-01 03:10:00"),                              # hour 3 (gap at hour 2)
        (4, None),                                               # null ts -> 1900 bucket
    ]
    df = spark.createDataFrame(rows, "id int, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    assert fired_ids(
        spark, df,
        DQDatasetRule(check_func=C.is_data_fresh_per_time_window, column="ts",
                      check_func_kwargs={"window_minutes": 60, "min_records_per_window": 2}),
    ) == {2, 3, 4}
    assert fired_ids(
        spark, df,
        DQDatasetRule(check_func=C.has_no_gaps_per_time_window, column="ts",
                      check_func_kwargs={"window_minutes": 60}),
    ) == {2, 4}  # hour-1 bucket precedes the hour-2 gap; 1900 bucket precedes hour 0


def test_has_no_aggr_outliers_rolling(spark):
    rows = [(i, f"2024-01-{d:02d} 10:00:00", 10.0) for i, d in enumerate(range(1, 11))]
    rows.append((100, "2024-01-11 10:00:00", 1000.0))  # spike on day 11
    df = spark.createDataFrame(rows, "id long, ts string, v double").withColumn("ts", F.col("ts").cast("timestamp"))
    assert fired_ids(
        spark, df,
        DQDatasetRule(check_func=C.has_no_aggr_outliers, column="v",
                      check_func_kwargs={"time_column": "ts", "aggr_type": "avg", "sigma": 3.0,
                                         "lookback_num_intervals": 7, "warmup_num_intervals": 5,
                                         "time_interval": "day"}),
    ) == {100}


def test_compare_datasets_dedup_ref_preserves_row_count(spark):
    """A duplicate-key ref side multiplies joined rows (inherent to the PK
    join shape); dedup_ref=True restores one annotated row per input row."""
    import dqx_spark.functions as C
    from dqx_spark import DQDatasetRule, DQEngine
    from dqx_spark.engine import ExtraParams

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    ref = spark.createDataFrame([(1, "a"), (1, "a2"), (2, "b")], "id long, v string")
    e = DQEngine(extra_params=ExtraParams(run_time_overwrite="2024-06-01 00:00:00"))
    kw = {"columns": ["id"], "ref_columns": ["id"], "ref_df_name": "r"}
    multiplied = e.apply_checks(df, [DQDatasetRule(check_func=C.compare_datasets, check_func_kwargs=kw)],
                                ref_dfs={"r": ref})
    assert multiplied.count() == 3  # documented join semantics
    kept = e.apply_checks(
        df,
        [DQDatasetRule(check_func=C.compare_datasets, check_func_kwargs={**kw, "dedup_ref": True})],
        ref_dfs={"r": ref},
    )
    assert kept.count() == 2
