"""inline_rows (functions/literals.py): the JVM literal-relation
builder behind every engine-path tiny relation, and — above the cell
threshold — the single-statement SQL VALUES path (the Column-literal
construction costs several py4j round trips per cell; a 2,000x6
relation measured ~30s of gateway traffic)."""

import math

from ex_elasticlunr_spark.functions.literals import (
    _SQL_VALUES_CELLS,
    inline_rows,
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


def test_small_and_values_paths_agree(spark):
    rows = _rows(6)  # 36 cells: Column-literal path
    small = inline_rows(spark, rows, DDL).collect()
    big_n = _SQL_VALUES_CELLS // 6 + 2
    big = inline_rows(spark, _rows(big_n), DDL).collect()
    assert [tuple(r) for r in big[:6]] == [tuple(r) for r in small]


def test_values_path_roundtrips_exactly(spark):
    n = _SQL_VALUES_CELLS // 6 + 5
    rows = _rows(n)
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
