"""inline_rows (functions/literals.py): the JVM literal-relation
builder behind every engine-path tiny relation. Every non-empty
relation now goes through ONE spark.sql VALUES statement (the
Column-literal construction costs several py4j round trips per cell —
a 2,000x6 relation measured ~30s of gateway traffic, and even a 10x2
relation ~96ms vs ~7ms flat for the SQL parse). Also covers the
literal-predicate helpers (in_expr / sql_in / sql_eq / array_lit) that
replace Column.isin / F.array-of-lits on the serving path."""

import math

from pyspark.sql import functions as F

from ex_elasticlunr_spark.functions.literals import (
    array_lit,
    in_expr,
    inline_rows,
    sql_eq,
    sql_in,
)

DDL = "i int, l long, d double, s string, b boolean, x binary"
NASTY = ["it's", 'back\\slash', "new\nline", "tab\tchar", "quote''s",
         "unié中", "", "NULL", "%s;--", "a,b(c)"]


def _rows(n):
    out = []
    for k in range(n):
        s = NASTY[k % len(NASTY)]
        out.append((k, k * (1 << 40), k * math.pi, s, k % 2 == 0,
                    bytes([k % 256, 255])))
    return out


def test_small_and_large_relations_agree(spark):
    small = inline_rows(spark, _rows(6), DDL).collect()
    big = inline_rows(spark, _rows(60), DDL).collect()
    assert [tuple(r) for r in big[:6]] == [tuple(r) for r in small]


def test_values_path_roundtrips_exactly(spark):
    rows = _rows(50)
    got = [tuple(r) for r in inline_rows(spark, rows, DDL).collect()]
    want = [(i, l, d, s, b, bytearray(x)) for i, l, d, s, b, x in rows]
    assert got == want  # doubles bit-exact via repr round-trip


def test_values_path_nulls(spark):
    rows = [(None, None, None, None, None, None)] * 60
    got = inline_rows(spark, rows, DDL).collect()
    assert len(got) == 60 and all(
        all(v is None for v in r) for r in got)


def test_collect_costs_zero_tasks(spark):
    st = spark.sparkContext._jsc.sc().statusTracker()
    ids = st.getJobIdsForGroup(None)
    before = max(list(ids)) if len(list(ids)) else -1
    inline_rows(spark, _rows(100), DDL).collect()
    ids2 = st.getJobIdsForGroup(None)
    after = max(list(ids2)) if len(list(ids2)) else -1
    assert after == before  # a local literal relation: no Spark job


def test_values_path_special_floats(spark):
    rows = [(i, 0, v, "x", True, b"\x00")
            for i, v in enumerate([float("inf"), float("-inf"),
                                   float("nan"), -0.0, 5e-324] * 12)]
    got = inline_rows(spark, rows, DDL).collect()
    import math as m
    assert got[0]["d"] == float("inf") and got[1]["d"] == float("-inf")
    assert m.isnan(got[2]["d"]) and got[4]["d"] == 5e-324
    assert str(got[3]["d"]) == "-0.0"


def test_array_rows(spark):
    rows = [("c0", [1.5, -0.0, 2.25e-300]), ("c1", []), ("c2", None)]
    got = inline_rows(spark, rows,
                      "cell string, cv array<double>").collect()
    assert got[0]["cv"] == [1.5, -0.0, 2.25e-300]
    assert got[1]["cv"] == [] and got[2]["cv"] is None


def test_in_expr_matches_isin(spark):
    df = spark.range(0, 500).select(
        F.col("id").cast("int").alias("i"),
        F.concat(F.lit("t"), F.col("id")).alias("t"))
    for col, vals in (("i", [3, 499, 77]),
                      ("t", ["t3", "it's", "t499", "a\\b"])):
        a = sorted(map(tuple, df.where(F.col(col).isin(vals)).collect()))
        b = sorted(map(tuple, df.where(in_expr(col, vals)).collect()))
        assert a == b and len(a) >= 2
    # empty list: never-true, like isin([])
    assert df.where(in_expr("i", [])).count() == 0
    # integral-typed values (numpy scalars) render as numeric literals
    import numpy as np
    got = df.where(in_expr("i", [np.int64(3), np.int32(7)])).count()
    assert got == 2


def test_sql_fragments_compose(spark):
    df = spark.range(0, 100).select(
        F.col("id").cast("int").alias("i"),
        F.concat(F.lit("t"), F.col("id")).alias("t"))
    cond = "(" + sql_eq("t", "t7") + ") OR (" + sql_in("i", [11, 13]) + ")"
    assert df.where(F.expr(cond)).count() == 3


def test_array_lit(spark):
    row = spark.range(1).select(
        array_lit([1.5, 2.5e-300], "double").alias("a"),
        array_lit([], "int").alias("e"),
        array_lit(["x'y", "z"], "string").alias("s")).collect()[0]
    assert row["a"] == [1.5, 2.5e-300]
    assert row["e"] == [] and row["s"] == ["x'y", "z"]
