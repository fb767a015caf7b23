"""Randomized differential query fuzzing: hypothesis generates
filter/group/aggregate specs over `orders`, each spec is compiled
BOTH to a Spark DataFrame plan and to DuckDB SQL from the same tree,
and results must match exactly — the correctness layer beyond the
fixed per-key oracles (it explores predicate/aggregation combinations
no hand-written key covers; all outputs are integers, so matches are
exact, never tolerance-based)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from conftest import assert_matches_oracle

# --- predicate atoms: (spark_column_fn, sql_text) pairs built together
# so both engines always see the same semantic tree ---------------------


def _price_cmp(op, v):
    sql = f"o_totalprice {op} {v}"
    col = (
        (F.col("o_totalprice") < v) if op == "<" else (F.col("o_totalprice") >= v)
    )
    return col, sql


def _status_eq(neg, s):
    sql = f"o_orderstatus {'<>' if neg else '='} '{s}'"
    col = (F.col("o_orderstatus") != s) if neg else (F.col("o_orderstatus") == s)
    return col, sql


def _prio_in(subset):
    quoted = ", ".join(f"'{p}'" for p in subset)
    sql = f"o_orderpriority IN ({quoted})"
    return F.col("o_orderpriority").isin(*subset), sql


def _cust_mod(k, r):
    sql = f"o_custkey % {k} = {r}"
    return (F.col("o_custkey") % k) == r, sql


_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

_atom = st.one_of(
    st.tuples(
        st.sampled_from(["<", ">="]), st.integers(1_000, 500_000)
    ).map(lambda t: _price_cmp(*t)),
    st.tuples(st.booleans(), st.sampled_from(["O", "F", "P"])).map(
        lambda t: _status_eq(*t)
    ),
    st.lists(st.sampled_from(_PRIOS), min_size=1, max_size=3, unique=True).map(
        _prio_in
    ),
    st.tuples(st.integers(2, 7), st.integers(0, 1)).map(
        lambda t: _cust_mod(t[0], min(t[1], t[0] - 1))
    ),
)


@st.composite
def _specs(draw):
    atoms = draw(st.lists(_atom, min_size=1, max_size=3))
    conj = draw(st.booleans())  # AND vs OR fold
    group = draw(st.sampled_from([None, "o_orderstatus", "o_orderpriority"]))
    return atoms, conj, group


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_specs())
def test_generated_filter_agg_matches_duckdb(spark, duck, spec):
    """Any generated WHERE + GROUP BY + integer-aggregate query must
    produce identical results on Spark and DuckDB."""
    atoms, conj, group = spec
    col = atoms[0][0]
    sql_pred = atoms[0][1]
    for c, s in atoms[1:]:
        col = (col & c) if conj else (col | c)
        sql_pred = f"({sql_pred}) {'AND' if conj else 'OR'} ({s})"

    o = spark.read.parquet(
        "%s/orders.parquet" % __import__("conftest").SF_DIR
    ).filter(col)
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").alias("sum_cents"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
        F.max("o_orderkey").cast("bigint").alias("max_key"),
    ]
    agg_sql = (
        "CAST(count(*) AS BIGINT) AS n,"
        " CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)"
        "   AS sum_cents,"
        " CAST(min(o_orderkey) AS BIGINT) AS min_key,"
        " CAST(max(o_orderkey) AS BIGINT) AS max_key"
    )
    if group is None:
        sdf = o.agg(*aggs)
        sql = f"SELECT {agg_sql} FROM orders WHERE {sql_pred}"
    else:
        sdf = o.groupBy(group).agg(*aggs)
        sql = (
            f"SELECT {group}, {agg_sql} FROM orders"
            f" WHERE {sql_pred} GROUP BY {group}"
        )
    assert_matches_oracle(sdf, duck, sql)


# --- join fuzzing: orders x customer with generated per-side filters ---

def _cust_bal(op, v):
    sql = f"c_acctbal {op} {v}"
    col = (F.col("c_acctbal") < v) if op == "<" else (F.col("c_acctbal") >= v)
    return col, sql


def _cust_key_mod(k, r):
    r = min(r, k - 1)
    return (F.col("c_custkey") % k) == r, f"c_custkey % {k} = {r}"


_cust_atom = st.one_of(
    st.tuples(st.sampled_from(["<", ">="]), st.integers(-999, 9999)).map(
        lambda t: _cust_bal(*t)
    ),
    st.tuples(st.integers(2, 5), st.integers(0, 1)).map(
        lambda t: _cust_key_mod(*t)
    ),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_atom, _cust_atom, st.sampled_from(["inner", "left"]))
def test_generated_join_matches_duckdb(spark, duck, o_atom, c_atom, how):
    """orders ⋈ customer with generated per-side predicates and an
    integer rollup per nation must match DuckDB under inner AND left
    join semantics (left keeps filtered-out-match orders with NULL
    customer columns)."""
    sf = __import__("conftest").SF_DIR
    o_col, o_sql = o_atom
    c_col, c_sql = c_atom
    o = spark.read.parquet(f"{sf}/orders.parquet").filter(o_col)
    c = spark.read.parquet(f"{sf}/customer.parquet").filter(c_col)
    j = o.join(c, o.o_custkey == c.c_custkey, how)
    sdf = j.groupBy(F.coalesce("c_nationkey", F.lit(-1)).alias("nk")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
        F.count("c_custkey").cast("bigint").alias("n_matched"),
    )
    jk = "JOIN" if how == "inner" else "LEFT JOIN"
    sql = f"""
      SELECT coalesce(c_nationkey, -1) AS nk,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_cents,
             CAST(count(c_custkey) AS BIGINT) AS n_matched
      FROM (SELECT * FROM orders WHERE {o_sql}) o
      {jk} (SELECT * FROM customer WHERE {c_sql}) c
        ON o.o_custkey = c.c_custkey
      GROUP BY 1
    """
    assert_matches_oracle(sdf, duck, sql)


# --- window fuzzing: generated (partition, order, function, frame) ----
# Every ordering ends in o_orderkey, a unique column, so ALL window
# functions (including row_number and lag) are total-order
# deterministic and the comparison is exact, never tolerance-based.

_WIN_PARTS = [
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("pk", "o_custkey % 10"),
]
_WIN_ORDERS = [
    ("cents", "cents"),
    ("o_orderdate", "o_orderdate"),
]


def _win_fn(name):
    """(label, spark_fn(window) -> Column, sql_text(over) -> str)."""
    from pyspark.sql import Window  # local: keep module import light

    if name == "row_number":
        return name, lambda w: F.row_number().over(w).cast("bigint"), \
            "CAST(row_number() OVER ({ov}) AS BIGINT)"
    if name == "rank":
        return name, lambda w: F.rank().over(w).cast("bigint"), \
            "CAST(rank() OVER ({ov}) AS BIGINT)"
    if name == "dense_rank":
        return name, lambda w: F.dense_rank().over(w).cast("bigint"), \
            "CAST(dense_rank() OVER ({ov}) AS BIGINT)"
    if name == "lag":
        return name, lambda w: F.lag("cents", 1).over(w).cast("bigint"), \
            "CAST(lag(cents, 1) OVER ({ov}) AS BIGINT)"
    if name == "running_sum":
        return (
            name,
            lambda w: F.sum("cents")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"),
            "CAST(sum(cents) OVER ({ov} ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) AS BIGINT)",
        )
    if name == "rolling_sum_4":
        return (
            name,
            lambda w: F.sum("cents").over(w.rowsBetween(-3, 0)).cast("bigint"),
            "CAST(sum(cents) OVER ({ov} ROWS BETWEEN 3 PRECEDING"
            " AND CURRENT ROW) AS BIGINT)",
        )
    if name == "ntile4":
        return name, lambda w: F.ntile(4).over(w).cast("bigint"), \
            "CAST(ntile(4) OVER ({ov}) AS BIGINT)"
    raise AssertionError(name)


_WIN_FNS = st.sampled_from(
    ["row_number", "rank", "dense_rank", "lag", "running_sum",
     "rolling_sum_4", "ntile4"]
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.sampled_from(_WIN_PARTS),
    st.sampled_from(_WIN_ORDERS),
    _WIN_FNS,
    st.booleans(),
)
def test_generated_window_matches_duckdb(spark, duck, part, order, fn_name, desc):
    """Any generated PARTITION BY / ORDER BY / window-function combo
    (ranking, offset, running and rolling frames) must produce
    identical per-row results on Spark and DuckDB."""
    from pyspark.sql import Window

    sf = __import__("conftest").SF_DIR
    p_alias, p_sql = part
    o_alias, _o_sql = order
    _, sfn, sql_tpl = _win_fn(fn_name)

    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_orderdate",
        (F.col("o_custkey") % 10).alias("pk"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    ocol = F.col(o_alias).desc() if desc else F.col(o_alias).asc()
    w = Window.partitionBy(p_alias).orderBy(ocol, F.col("o_orderkey").asc())
    sdf = o.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        sfn(w).alias("wval"),
    )
    dirn = "DESC" if desc else "ASC"
    ov = f"PARTITION BY {p_alias} ORDER BY {o_alias} {dirn}, o_orderkey ASC"
    sql = f"""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_orderpriority, o_orderdate,
               o_custkey % 10 AS pk,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
      )
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             {sql_tpl.format(ov=ov)} AS wval
      FROM base
    """
    assert_matches_oracle(sdf, duck, sql)


# --- scalar-expression fuzzing: string/date projections ---------------
# Each atom is a (spark_column, sql_text) pair built from one spec, so
# both engines evaluate the same expression tree; all outputs are
# strings or integers — exact comparison, no float tolerance.


def _substr(start, length):
    # 1-based start on both engines; generated bounds may exceed the
    # string — both engines return the clamped suffix
    return (
        F.substring(F.col("o_orderpriority"), start, length),
        f"substring(o_orderpriority, {start}, {length})",
    )


def _case_fn(upper):
    fn = "upper" if upper else "lower"
    return (
        getattr(F, fn)(F.col("o_orderstatus")),
        f"{fn}(o_orderstatus)",
    )


def _concat_sep(sep):
    return (
        F.concat_ws(sep, F.col("o_orderstatus"), F.col("o_orderpriority")),
        f"concat_ws('{sep}', o_orderstatus, o_orderpriority)",
    )


def _date_add_days(n):
    return (
        F.date_format(F.date_add(F.to_date("o_orderdate"), n), "yyyy-MM-dd"),
        f"strftime(CAST(o_orderdate AS DATE) + ({n}) * INTERVAL 1 DAY,"
        f" '%Y-%m-%d')",
    )


def _extract_part(part):
    spark_fn = {"year": F.year, "month": F.month, "day": F.dayofmonth}[part]
    return (
        spark_fn(F.col("o_orderdate")).cast("bigint"),
        f"CAST(extract({part} FROM o_orderdate) AS BIGINT)",
    )


def _lpad_key(width, fill):
    return (
        F.lpad(F.col("o_orderkey").cast("string"), width, fill),
        f"lpad(CAST(o_orderkey AS VARCHAR), {width}, '{fill}')",
    )


_scalar_atom = st.one_of(
    st.tuples(st.integers(1, 6), st.integers(1, 8)).map(lambda t: _substr(*t)),
    st.booleans().map(_case_fn),
    st.sampled_from(["-", "/", "::"]).map(_concat_sep),
    st.integers(-400, 400).map(_date_add_days),
    st.sampled_from(["year", "month", "day"]).map(_extract_part),
    st.tuples(st.integers(4, 12), st.sampled_from(["0", "x"])).map(
        lambda t: _lpad_key(*t)
    ),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(_scalar_atom, min_size=1, max_size=3))
def test_generated_scalar_projection_matches_duckdb(spark, duck, atoms):
    """Any generated projection of string/date scalar expressions must
    evaluate identically per row on Spark and DuckDB."""
    sf = __import__("conftest").SF_DIR
    o = spark.read.parquet(f"{sf}/orders.parquet")
    cols = [F.col("o_orderkey").cast("bigint").alias("o_orderkey")]
    sqls = ["CAST(o_orderkey AS BIGINT) AS o_orderkey"]
    for i, (c, s) in enumerate(atoms):
        cols.append(c.alias(f"e{i}"))
        sqls.append(f"{s} AS e{i}")
    sdf = o.select(*cols)
    sql = f"SELECT {', '.join(sqls)} FROM orders"
    assert_matches_oracle(sdf, duck, sql)


# --- set-operation fuzzing: two generated slices of orders under
# UNION / UNION ALL / INTERSECT / EXCEPT -------------------------------
# Projections are pure integers (key + bucketed custkey) so distinct
# semantics and row multiplicity compare exactly.

_SETOPS = [
    ("union_all", lambda a, b: a.unionByName(b), "UNION ALL"),
    ("union", lambda a, b: a.unionByName(b).distinct(), "UNION"),
    ("intersect", lambda a, b: a.intersect(b), "INTERSECT"),
    # subtract() IS SQL EXCEPT (distinct semantics); exceptAll().distinct()
    # diverges when a row occurs on both sides with higher multiplicity
    # on the left (it would survive exceptAll+distinct but not EXCEPT)
    ("except", lambda a, b: a.subtract(b), "EXCEPT"),
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_atom, _atom, st.sampled_from([s[0] for s in _SETOPS]), st.integers(2, 9))
def test_generated_setop_matches_duckdb(spark, duck, atom_a, atom_b, op, k):
    """Two generated filters of orders combined by any set operation
    must agree with DuckDB, including bag vs set semantics (UNION ALL
    keeps duplicates, UNION/INTERSECT/EXCEPT are distinct)."""
    sf = __import__("conftest").SF_DIR
    label, fn, kw = next(s for s in _SETOPS if s[0] == op)
    proj = [
        F.col("o_orderkey").cast("bigint").alias("k1"),
        (F.col("o_custkey") % k).cast("bigint").alias("k2"),
    ]
    base = spark.read.parquet(f"{sf}/orders.parquet")
    a = base.filter(atom_a[0]).select(*proj)
    b = base.filter(atom_b[0]).select(*proj)
    sdf = fn(a, b).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum("k1"), F.lit(0)).cast("bigint").alias("sum_k1"),
        F.coalesce(F.sum("k2"), F.lit(0)).cast("bigint").alias("sum_k2"),
    )
    part = (
        "SELECT CAST(o_orderkey AS BIGINT) AS k1,"
        f" CAST(o_custkey % {k} AS BIGINT) AS k2 FROM orders WHERE {{p}}"
    )
    inner = f"({part.format(p=atom_a[1])}) {kw} ({part.format(p=atom_b[1])})"
    sql = (
        "SELECT CAST(count(*) AS BIGINT) AS n,"
        " CAST(coalesce(sum(k1), 0) AS BIGINT) AS sum_k1,"
        " CAST(coalesce(sum(k2), 0) AS BIGINT) AS sum_k2"
        f" FROM ({inner})"
    )
    assert_matches_oracle(sdf, duck, sql)


# --- subquery fuzzing: [NOT] EXISTS and [NOT] IN against a generated
# customer slice. Identical SQL text runs on both engines, exercising
# the subquery decorrelation/rewrite paths (the r5 driver fails were
# exactly this class of engine boundary). --------------------------------


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    _atom,
    _cust_atom,
    st.sampled_from(["EXISTS", "NOT EXISTS", "IN", "NOT IN"]),
)
def test_generated_subquery_matches_duckdb(spark, duck, o_atom, c_atom, form):
    """orders filtered by a generated [NOT] EXISTS / [NOT] IN subquery
    over a generated customer slice must agree with DuckDB. NOT IN is
    the classic three-valued-logic trap; c_custkey is non-null here so
    the comparison stays exact while still exercising the null-aware
    anti-join plan."""
    sf = __import__("conftest").SF_DIR
    spark.read.parquet(f"{sf}/orders.parquet").createOrReplaceTempView("fz_o")
    spark.read.parquet(f"{sf}/customer.parquet").createOrReplaceTempView("fz_c")
    if form.endswith("EXISTS"):
        sub = (
            f"{form} (SELECT 1 FROM {{c}} c"
            f" WHERE c.c_custkey = o.o_custkey AND ({c_atom[1]}))"
        )
    else:
        sub = (
            f"o.o_custkey {form}"
            f" (SELECT c_custkey FROM {{c}} WHERE {c_atom[1]})"
        )
    body = (
        "SELECT CAST(count(*) AS BIGINT) AS n,"
        " CAST(coalesce(sum(o_orderkey), 0) AS BIGINT) AS sum_key"
        " FROM {o} o WHERE (" + o_atom[1] + ") AND " + sub
    )
    sdf = spark.sql(body.format(o="fz_o", c="fz_c"))
    assert_matches_oracle(sdf, duck, body.format(o="orders", c="customer"))


# --- null-heavy outer-join + window fuzzing ----------------------------
# FULL OUTER joins synthesize nulls on BOTH sides; the window then
# partitions on a nullable key and orders by a coalesced unique total
# order, so ranking over null groups is exact on both engines.


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    _atom,
    _cust_atom,
    st.sampled_from(["LEFT", "FULL"]),
    st.sampled_from(["row_number", "rank", "count"]),
)
def test_generated_outer_join_window_matches_duckdb(
    spark, duck, o_atom, c_atom, jk, wfn
):
    """Outer join with generated per-side filters, then a window
    function partitioned on the NULLABLE dimension key — the
    null-group + outer-join combination only differential testing
    covers."""
    sf = __import__("conftest").SF_DIR
    spark.read.parquet(f"{sf}/orders.parquet").createOrReplaceTempView("fz_o")
    spark.read.parquet(f"{sf}/customer.parquet").createOrReplaceTempView("fz_c")
    over = (
        "PARTITION BY c.c_mktsegment"
        " ORDER BY coalesce(o.o_orderkey, -c.c_custkey)"
    )
    fn_sql = {
        "row_number": f"row_number() OVER ({over})",
        "rank": f"rank() OVER ({over})",
        "count": f"count(o.o_orderkey) OVER ({over})",
    }[wfn]
    body = f"""
      SELECT coalesce(c_mktsegment, '<null>') AS seg,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(w) AS BIGINT) AS sum_w
      FROM (
        SELECT c.c_mktsegment, {fn_sql} AS w
        FROM (SELECT * FROM {{o}} WHERE {o_atom[1]}) o
        {jk} JOIN (SELECT * FROM {{c}} WHERE {c_atom[1]}) c
          ON o.o_custkey = c.c_custkey
      )
      GROUP BY 1
    """
    sdf = spark.sql(body.format(o="fz_o", c="fz_c"))
    assert_matches_oracle(sdf, duck, body.format(o="orders", c="customer"))


# --- DECIMAL arithmetic/rounding fuzzing (round-8 family) --------------
# Exact-decimal expression trees evaluated on both engines, results
# compared as scaled BIGINTs. Encodes the repo's cross-engine decimal
# discipline and explores its edges: negative operands, half-boundary
# rounding, scale growth under multiplication. The one KNOWN divergence
# (CAST(decimal AS BIGINT): Spark truncates toward zero, DuckDB rounds
# to nearest) is pinned by its own test below — the generated queries
# always use the explicit floor(x*10^k+0.5) spelling instead.

_DEC_OPS = [
    ("+", lambda c, v: c + v),
    ("-", lambda c, v: c - v),
    ("*", lambda c, v: c * v),
]


@st.composite
def _decimal_specs(draw):
    op_i = draw(st.integers(0, len(_DEC_OPS) - 1))
    # one decimal place, may be negative, never zero for '*'
    raw = draw(st.integers(-99, 99).filter(lambda x: x != 0))
    const = f"{raw / 10:.1f}"
    round_scale = draw(st.integers(0, 2))
    group = draw(st.sampled_from([None, "o_orderstatus"]))
    return op_i, const, round_scale, group


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_decimal_specs())
def test_generated_decimal_arithmetic_matches_duckdb(spark, duck, spec):
    """sum() over an exact-DECIMAL expression, rounded half-up at a
    generated scale via the mirrored floor spelling, must be
    bit-identical cross-engine for +, -, × with negative and
    half-boundary constants."""
    op_i, const, k, group = spec
    op_name, op_fn = _DEC_OPS[op_i]
    pow10 = 10 ** k

    price = F.col("o_totalprice").cast("decimal(18,2)")
    cval = F.lit(const).cast("decimal(4,1)")
    expr = op_fn(price, cval)

    o = spark.read.parquet(
        "%s/orders.parquet" % __import__("conftest").SF_DIR
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.floor(F.sum(expr) * pow10 + F.lit(0.5)).cast("bigint").alias("s_round"),
        F.floor(F.min(expr) * pow10 + F.lit(0.5)).cast("bigint").alias("mn_round"),
        F.floor(F.max(expr) * pow10 + F.lit(0.5)).cast("bigint").alias("mx_round"),
    ]
    sql_expr = f"(CAST(o_totalprice AS DECIMAL(18,2)) {op_name} CAST({const} AS DECIMAL(4,1)))"
    agg_sql = (
        "CAST(count(*) AS BIGINT) AS n,"
        f" CAST(floor(sum({sql_expr}) * {pow10} + 0.5) AS BIGINT) AS s_round,"
        f" CAST(floor(min({sql_expr}) * {pow10} + 0.5) AS BIGINT) AS mn_round,"
        f" CAST(floor(max({sql_expr}) * {pow10} + 0.5) AS BIGINT) AS mx_round"
    )
    if group is None:
        sdf = o.agg(*aggs)
        sql = f"SELECT {agg_sql} FROM orders"
    else:
        sdf = o.groupBy(group).agg(*aggs)
        sql = f"SELECT {group}, {agg_sql} FROM orders GROUP BY {group}"
    assert_matches_oracle(sdf, duck, sql)


def test_decimal_to_bigint_cast_diverges_and_floor_heals(spark, duck):
    """Pin the divergence the discipline exists for: CAST(x.5 AS
    BIGINT) truncates toward zero in Spark but rounds to nearest in
    DuckDB — and the explicit floor(x + 0.5) spelling agrees."""
    spark_trunc = spark.sql(
        "SELECT CAST(CAST(1.5 AS DECIMAL(3,1)) AS BIGINT) AS v"
    ).first()["v"]
    duck_round = duck.execute(
        "SELECT CAST(CAST(1.5 AS DECIMAL(3,1)) AS BIGINT) AS v"
    ).fetchone()[0]
    assert spark_trunc == 1 and duck_round == 2  # the trap, pinned
    s = spark.sql(
        "SELECT CAST(floor(CAST(1.5 AS DECIMAL(3,1)) + 0.5) AS BIGINT) AS v"
    ).first()["v"]
    d = duck.execute(
        "SELECT CAST(floor(CAST(1.5 AS DECIMAL(3,1)) + 0.5) AS BIGINT) AS v"
    ).fetchone()[0]
    assert s == d == 2


# --- array / higher-order-function fuzzing (round-8 family) ------------
# Token-array pipelines (filter by length -> optional slice -> distinct)
# evaluated as Spark HOFs and DuckDB list functions from the same spec.
# This is exactly the grammar the round-8 shingle respelling lives in —
# a values drift between the HOF and window spellings, or between
# Spark's and DuckDB's list semantics (1-based slicing, distinct
# first-occurrence order), surfaces here.


@st.composite
def _array_specs(draw):
    min_len = draw(st.integers(1, 7))
    slice_k = draw(st.sampled_from([None, 1, 2, 3, 5]))
    distinct = draw(st.booleans())
    return min_len, slice_k, distinct


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_array_specs())
def test_generated_array_pipeline_matches_duckdb(spark, duck, spec):
    """Per-document results of a generated token-array pipeline must
    match: count, total length, and the lexicographic min element
    (order-insensitive comparands — array_distinct and list_distinct
    differ in element ORDER, which is exactly why no key compares raw
    distinct arrays)."""
    min_len, slice_k, distinct = spec

    toks = F.filter(
        F.split(F.col("text"), " "),
        lambda x: (x != "") & (F.length(x) >= min_len),
    )
    sql_arr = (
        f"list_filter(string_split(text, ' '),"
        f" x -> x <> '' AND length(x) >= {min_len})"
    )
    if slice_k is not None:
        toks = F.slice(toks, 1, slice_k)
        sql_arr = f"({sql_arr})[1:{slice_k}]"
    if distinct:
        toks = F.array_distinct(toks)
        sql_arr = f"list_distinct({sql_arr})"

    d = spark.read.parquet(
        "%s/documents.parquet" % __import__("conftest").SF_DIR
    )
    sdf = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_toks"),
        F.coalesce(
            F.aggregate(
                F.transform(toks, lambda x: F.length(x).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ),
            F.lit(0).cast("bigint"),
        ).alias("sum_len"),
        F.array_min(toks).alias("min_tok"),
    )
    sql = f"""
    SELECT doc_id,
           CAST(len({sql_arr}) AS BIGINT) AS n_toks,
           CAST(coalesce(list_sum(list_transform({sql_arr},
                x -> CAST(length(x) AS BIGINT))), 0) AS BIGINT) AS sum_len,
           list_min({sql_arr}) AS min_tok
    FROM documents
    """
    assert_matches_oracle(sdf, duck, sql)


# --- window FRAME fuzzing: RANGE vs ROWS boundaries, ties, empty
# frames, IGNORE NULLS (VERDICT r8 item 7) ------------------------------
# Two sub-families with different determinism regimes:
#  (a) aggregate-over-frame: sum/count/min/max are deterministic over a
#      RANGE frame even when the ORDER BY has ties (peers share one
#      frame), and over a ROWS frame only under a total order — so
#      RANGE specs here order by a deliberately LOW-CARDINALITY key
#      with NO tiebreaker (the tie semantics under test), while ROWS
#      specs append the unique-key tiebreak.
#  (b) offset/positional with IGNORE NULLS: lead/lag/first/last/
#      nth_value over a column with injected NULLs, total order.
# All values are integer cents — exact comparison.

# (frame_key, needs_total_order, spark_frame(Window,w)->w, sql_frame)
def _frame_spec(name):
    from pyspark.sql import Window as W

    if name == "range_upc":  # peers of CURRENT ROW are IN the frame
        return False, lambda w: w.rangeBetween(W.unboundedPreceding, W.currentRow), \
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    if name == "range_2_2":  # value-distance frame, independent of ties
        return False, lambda w: w.rangeBetween(-2, 2), \
            "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING"
    if name == "range_cr_uf":
        return False, lambda w: w.rangeBetween(W.currentRow, W.unboundedFollowing), \
            "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
    if name == "range_0_0":  # exactly the peer group
        return False, lambda w: w.rangeBetween(0, 0), \
            "RANGE BETWEEN CURRENT ROW AND CURRENT ROW"
    if name == "rows_up_1p":  # EMPTY at each partition head -> NULL agg
        return True, lambda w: w.rowsBetween(W.unboundedPreceding, -1), \
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    if name == "rows_1f_3f":  # EMPTY at each partition tail
        return True, lambda w: w.rowsBetween(1, 3), \
            "ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING"
    if name == "rows_2p_1p":
        return True, lambda w: w.rowsBetween(-2, -1), \
            "ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING"
    raise AssertionError(name)


_FRAME_AGGS = [
    ("sum", lambda c: F.sum(c), "CAST(sum({c}) OVER ({ov}) AS BIGINT)"),
    ("count", lambda c: F.count(c), "CAST(count({c}) OVER ({ov}) AS BIGINT)"),
    ("min", lambda c: F.min(c), "CAST(min({c}) OVER ({ov}) AS BIGINT)"),
    ("max", lambda c: F.max(c), "CAST(max({c}) OVER ({ov}) AS BIGINT)"),
]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.sampled_from(
        ["range_upc", "range_2_2", "range_cr_uf", "range_0_0",
         "rows_up_1p", "rows_1f_3f", "rows_2p_1p"]
    ),
    st.sampled_from([a[0] for a in _FRAME_AGGS]),
    st.sampled_from([3, 7, 10]),  # tie density of the RANGE order key
    st.booleans(),  # descending order
)
def test_generated_window_frame_matches_duckdb(spark, duck, frame, agg, mod, desc):
    """Any (frame boundary, aggregate, tie density, direction) combo
    must agree across engines: RANGE frames are measured in ORDER-BY
    VALUE distance and include ALL peers of the boundary rows (ordered
    by a low-cardinality key with NO tiebreak — the tie semantics are
    the point), ROWS frames count physical rows under a total order,
    and an empty frame (head/tail exclusive bounds) aggregates to NULL
    on both engines, never 0."""
    from pyspark.sql import Window

    sf = __import__("conftest").SF_DIR
    needs_total, fr, fr_sql = _frame_spec(frame)
    sfn, agg_tpl = next(a[1:] for a in _FRAME_AGGS if a[0] == agg)

    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        (F.col("o_custkey") % 5).cast("bigint").alias("g"),
        (F.col("o_orderkey") % mod).cast("bigint").alias("ord"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    ocol = F.col("ord").desc() if desc else F.col("ord").asc()
    if needs_total:
        w = Window.partitionBy("g").orderBy(ocol, F.col("o_orderkey").asc())
        ov = f"PARTITION BY g ORDER BY ord {'DESC' if desc else 'ASC'}," \
             " o_orderkey ASC"
    else:
        w = Window.partitionBy("g").orderBy(ocol)
        ov = f"PARTITION BY g ORDER BY ord {'DESC' if desc else 'ASC'}"
    sdf = o.select(
        "o_orderkey",
        sfn(F.col("cents")).over(fr(w)).cast("bigint").alias("wval"),
    )
    sql = f"""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_custkey % 5 AS BIGINT) AS g,
               CAST(o_orderkey % {mod} AS BIGINT) AS ord,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
      )
      SELECT o_orderkey,
             {agg_tpl.format(c='cents', ov=f'{ov} {fr_sql}')} AS wval
      FROM base
    """
    assert_matches_oracle(sdf, duck, sql)


def _null_fn(name, ignore):
    """(spark_col_fn(w)->Column, sql_text) over the nullable column
    ``nv``; DuckDB spells IGNORE NULLS inside the argument list."""
    ig_sql = " IGNORE NULLS" if ignore else ""
    # PySpark's F.lead/F.lag take no ignoreNulls arg — the clause is
    # SQL-only, so build those two via F.expr (parsed as a window
    # function, then bound to the Window with .over)
    ig_expr = " ignore nulls" if ignore else ""
    if name == "lead":
        return lambda w: F.expr(f"lead(nv, 2){ig_expr}").over(w), \
            f"lead(nv, 2{ig_sql}) OVER ({{ov}})"
    if name == "lag":
        return lambda w: F.expr(f"lag(nv, 1){ig_expr}").over(w), \
            f"lag(nv, 1{ig_sql}) OVER ({{ov}})"
    if name == "first":
        return lambda w: F.first("nv", ignore).over(w), \
            f"first_value(nv{ig_sql}) OVER ({{ov}})"
    if name == "last":
        return lambda w: F.last("nv", ignore).over(w), \
            f"last_value(nv{ig_sql}) OVER ({{ov}})"
    if name == "nth2":
        return lambda w: F.nth_value("nv", 2, ignore).over(w), \
            f"nth_value(nv, 2{ig_sql}) OVER ({{ov}})"
    raise AssertionError(name)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.sampled_from(["lead", "lag", "first", "last", "nth2"]),
    st.booleans(),  # IGNORE NULLS vs RESPECT NULLS
    st.sampled_from([2, 3, 5]),  # null density: nv NULL when cents%k==0
    st.booleans(),  # frame: default (UP..CURRENT ROW) vs full partition
)
def test_generated_ignore_nulls_matches_duckdb(spark, duck, fn, ignore, kmod, full):
    """lead/lag/first/last/nth_value with IGNORE NULLS over injected
    NULLs must agree across engines, under both the DEFAULT frame
    (RANGE UNBOUNDED PRECEDING..CURRENT ROW — last_value is then the
    current row's peer group edge) and the full-partition ROWS frame.
    Total order (unique-key tiebreak) keeps positional results exact."""
    from pyspark.sql import Window as W

    sf = __import__("conftest").SF_DIR
    sfn, sql_tpl = _null_fn(fn, ignore)
    # lead/lag are frame-insensitive and Spark REJECTS an explicit
    # frame on them ("Cannot specify window frame for lead function")
    # — the positional offset walks rows, not a frame
    full = full and fn not in ("lead", "lag")

    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        (F.col("o_custkey") % 5).cast("bigint").alias("g"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    ).select(
        "o_orderkey", "g",
        F.when(F.col("cents") % kmod != 0, F.col("cents")).alias("nv"),
    )
    w = W.partitionBy("g").orderBy(F.col("o_orderkey").asc())
    fr_sql = ""
    if full:
        w = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        fr_sql = " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    sdf = o.select("o_orderkey", sfn(w).cast("bigint").alias("wval"))
    ov = f"PARTITION BY g ORDER BY o_orderkey ASC{fr_sql}"
    sql = f"""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_custkey % 5 AS BIGINT) AS g,
               CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                         % {kmod} != 0
                    THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
               END AS nv
        FROM orders
      )
      SELECT o_orderkey,
             CAST({sql_tpl.format(ov=ov)} AS BIGINT) AS wval
      FROM base
    """
    assert_matches_oracle(sdf, duck, sql)


# --- NULL-ordering fuzzing: explicit NULLS FIRST/LAST across window
# shapes. The defaults DIVERGE between engines (Spark: NULLS FIRST for
# ASC / NULLS LAST for DESC; DuckDB: NULLS LAST always), so every
# ordering here spells the placement explicitly on BOTH sides — the
# portable discipline the engine's own keys follow — and the family
# proves the explicit spellings agree everywhere: ranking over a total
# order, running ROWS frames, and RANGE frames where the NULL rows form
# their own peer group at the chosen end.


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.booleans(),  # descending
    st.booleans(),  # nulls first
    st.sampled_from(["row_number", "running_sum", "range_sum_upc"]),
    st.sampled_from([2, 3, 5]),  # null density of the order key
)
def test_generated_null_ordering_matches_duckdb(spark, duck, desc, nf, fn, kmod):
    from pyspark.sql import Window as W

    sf = __import__("conftest").SF_DIR
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        (F.col("o_custkey") % 5).cast("bigint").alias("g"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    ).select(
        "o_orderkey", "g", "cents",
        # nullable ORDER BY key
        F.when(F.col("cents") % kmod != 0, F.col("cents") % 97).alias("nv"),
    )
    c = F.col("nv")
    ocol = (
        (c.desc_nulls_first() if nf else c.desc_nulls_last()) if desc
        else (c.asc_nulls_first() if nf else c.asc_nulls_last())
    )
    dirn = "DESC" if desc else "ASC"
    place = "NULLS FIRST" if nf else "NULLS LAST"

    if fn == "range_sum_upc":
        # RANGE requires a single order expression: no tiebreak — the
        # NULL rows are one peer group at the chosen end and share one
        # frame; sum is deterministic under ties
        w = W.partitionBy("g").orderBy(ocol).rangeBetween(
            W.unboundedPreceding, W.currentRow
        )
        wcol = F.sum("cents").over(w)
        ov = f"PARTITION BY g ORDER BY nv {dirn} {place} " \
             "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        wsql = f"sum(cents) OVER ({ov})"
    else:
        w = W.partitionBy("g").orderBy(ocol, F.col("o_orderkey").asc())
        ov = f"PARTITION BY g ORDER BY nv {dirn} {place}, o_orderkey ASC"
        if fn == "row_number":
            wcol = F.row_number().over(w)
            wsql = f"row_number() OVER ({ov})"
        else:
            w = w.rowsBetween(W.unboundedPreceding, W.currentRow)
            wcol = F.sum("cents").over(w)
            wsql = (
                f"sum(cents) OVER ({ov} ROWS BETWEEN UNBOUNDED PRECEDING"
                " AND CURRENT ROW)"
            )
    sdf = o.select("o_orderkey", wcol.cast("bigint").alias("wval"))
    sql = f"""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_custkey % 5 AS BIGINT) AS g,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
      ), base2 AS (
        SELECT o_orderkey, g, cents,
               CASE WHEN cents % {kmod} != 0 THEN cents % 97 END AS nv
        FROM base
      )
      SELECT o_orderkey, CAST({wsql} AS BIGINT) AS wval
      FROM base2
    """
    assert_matches_oracle(sdf, duck, sql)


# --- grouping-topology fuzzing: ROLLUP / CUBE / GROUPING SETS ----------
# The multi-grouping surface is a classic divergence zone: which rows
# are super-aggregate rows, how the null-group is marked, and the
# GROUPING() indicator per column. Dims here are non-null, so a NULL in
# the output can only mean "aggregated over" — and grouping(col) is
# compared per column as the explicit cross-engine probe (the
# engine-specific composite grouping_id bit order is deliberately NOT
# compared). Both sides run the SAME ANSI text: Spark through
# spark.sql over a temp view (the engine's declared SQL surface),
# DuckDB over its registered view.

_GRP_DIMS = [
    ("st", "o_orderstatus"),
    ("pr", "o_orderpriority"),
    ("ck", "CAST(o_custkey % 5 AS BIGINT)"),
]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.sampled_from(["rollup", "cube", "sets"]),
    st.integers(2, 3),                      # how many dims participate
    st.integers(0, 6),                      # seed for the sets variant
)
def test_generated_grouping_sets_matches_duckdb(spark, duck, mode, ndims, seed):
    sf = __import__("conftest").SF_DIR
    dims = _GRP_DIMS[:ndims]
    names = [n for n, _ in dims]
    exprs = ", ".join(f"{e} AS {n}" for n, e in dims)

    if mode == "rollup":
        grp = f"ROLLUP({', '.join(names)})"
    elif mode == "cube":
        grp = f"CUBE({', '.join(names)})"
    else:
        # deterministic subset list derived from the seed: always
        # includes the full set and the grand total, plus one mid set
        mid = names[seed % ndims]
        grp = f"GROUPING SETS (({', '.join(names)}), ({mid}), ())"

    g_cols = ", ".join(
        f"CAST(grouping({n}) AS BIGINT) AS g_{n}" for n in names
    )
    body = f"""
      WITH base AS (SELECT {exprs},
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             FROM orders)
      SELECT {', '.join(names)}, {g_cols},
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM base GROUP BY {grp}
    """
    # scoped view name: never shadow/leak "orders" into the shared
    # session catalog (the r8 registry-contamination lesson)
    view = "orders_grpfz"
    spark.read.parquet(f"{sf}/orders.parquet").createOrReplaceTempView(view)
    try:
        sdf = spark.sql(body.replace("FROM orders)", f"FROM {view})"))
        assert_matches_oracle(sdf, duck, body)
    finally:
        spark.catalog.dropTempView(view)


# --- timestamp / timezone fuzzing (round-10 family) --------------------
# The classic cross-engine divergence zone: date_trunc week anchors,
# month-end clamped arithmetic, epoch-microsecond boundaries, and
# format→parse round-trips, all under the engine's pinned UTC session
# timezone. Output discipline per the portable-spelling rules: every
# temporal value leaves the query as a formatted STRING or an integer
# (never a raw DATE/TIMESTAMP column), and integer division uses the
# engines' integer `div`/`//`, never double division.


def _events_ts(spark):
    """events.ts as a Spark TIMESTAMP column (fixture stores NANOS;
    the nanosAsLong conf surfaces them as raw longs at read time —
    rescale through the production loader)."""
    import conftest

    from reports_generator_spark.sources.tables import load_table

    return load_table(spark, conftest.SF_DIR, "events")


_TRUNC_UNITS = ["year", "quarter", "month", "week", "day", "hour"]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.sampled_from(_TRUNC_UNITS),
    st.integers(2, 7),
    st.integers(0, 1),
)
def test_generated_date_trunc_matches_duckdb(spark, duck, unit, mod, res):
    """date_trunc at every unit — including 'week', whose Monday
    anchor and year-boundary behavior (orders span 1995-2001, so ISO
    week 52/53 edges are in-domain) must agree cross-engine — grouped
    and counted, the bucket emitted as a formatted string."""
    o = spark.read.parquet(
        "%s/orders.parquet" % __import__("conftest").SF_DIR
    ).filter((F.col("o_orderkey") % mod) == (res % mod))
    sdf = o.groupBy(
        F.date_format(F.date_trunc(unit, "o_orderdate"), "yyyy-MM-dd HH:mm:ss")
        .alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
    )
    sql = f"""
        SELECT strftime(date_trunc('{unit}', o_orderdate),
                        '%Y-%m-%d %H:%M:%S') AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(o_orderkey) AS BIGINT) AS min_key
        FROM orders WHERE o_orderkey % {mod} = {res % mod}
        GROUP BY 1
    """
    assert_matches_oracle(sdf, duck, sql)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.integers(0, 30),
    st.integers(-25, 25),
    st.booleans(),
)
def test_generated_month_arithmetic_matches_duckdb(spark, duck, d, n, use_last_day):
    """Month-end clamped arithmetic: shift each order date by d days
    (synthesizing genuine month-end dates — the fixture's dates are
    month-starts), then add n months (clamping: Jan 31 + 1 month must
    be Feb 28/29 on BOTH engines), optionally through last_day."""
    o = spark.read.parquet(
        "%s/orders.parquet" % __import__("conftest").SF_DIR
    )
    shifted = F.add_months(F.date_add(F.col("o_orderdate"), d), n)
    if use_last_day:
        shifted = F.last_day(shifted)
    sdf = o.groupBy(
        F.date_format(shifted, "yyyy-MM-dd").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    dk = f"CAST((CAST(o_orderdate AS DATE) + to_days({d}) + to_months({n})) AS DATE)"
    if use_last_day:
        dk = f"last_day({dk})"
    sql = f"""
        SELECT strftime({dk}, '%Y-%m-%d') AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    """
    assert_matches_oracle(sdf, duck, sql)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.sampled_from([2, 3, 5, 7, 1000, 1_000_000]), st.integers(0, 1))
def test_generated_epoch_micros_matches_duckdb(spark, duck, mod, res):
    """Epoch-microsecond boundary arithmetic on sub-second event
    timestamps: bucket by epoch_us % mod (mod 1e6 isolates the
    sub-second fraction), aggregate with integer division only —
    unix_micros needs the NTZ→LTZ cast, value-preserving under the
    pinned UTC session."""
    ev = _events_ts(spark)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    sdf = ev.groupBy((us % mod == res).alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min(us).cast("bigint").alias("mn_us"),
        F.max(us).cast("bigint").alias("mx_us"),
        F.sum(F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000"))
        .cast("bigint").alias("sum_sec"),
    )
    sql = f"""
        SELECT (epoch_us(ts) % {mod} = {res}) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(epoch_us(ts)) AS BIGINT) AS mn_us,
               CAST(max(epoch_us(ts)) AS BIGINT) AS mx_us,
               CAST(sum(epoch_us(ts) // 1000000) AS BIGINT) AS sum_sec
        FROM events GROUP BY 1
    """
    assert_matches_oracle(sdf, duck, sql)


_FMT_PAIRS = [
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("yyyy-MM", "%Y-%m"),
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.sampled_from(range(len(_FMT_PAIRS))), st.integers(2, 5))
def test_generated_format_parse_roundtrip_matches_duckdb(spark, duck, fi, mod):
    """format → to_timestamp/strptime round-trip at decreasing
    precision: the reparsed value truncates (never rounds) dropped
    fields to their unit start on BOTH engines; compared as epoch
    seconds after the round-trip."""
    sfmt, dfmt = _FMT_PAIRS[fi]
    ev = _events_ts(spark)
    reparsed = F.to_timestamp(
        F.date_format(F.col("ts").cast("timestamp"), sfmt), sfmt
    )
    sec = F.expr(
        f"unix_micros(to_timestamp(date_format(CAST(ts AS TIMESTAMP),"
        f" '{sfmt}'), '{sfmt}')) div 1000000"
    )
    sdf = ev.filter((F.col("event_id") % mod) == 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min(sec).cast("bigint").alias("mn_sec"),
        F.max(sec).cast("bigint").alias("mx_sec"),
        F.countDistinct(reparsed).cast("bigint").alias("n_distinct"),
    )
    sql = f"""
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(min(epoch_us(strptime(strftime(ts, '{dfmt}'), '{dfmt}'))
                        // 1000000) AS BIGINT) AS mn_sec,
               CAST(max(epoch_us(strptime(strftime(ts, '{dfmt}'), '{dfmt}'))
                        // 1000000) AS BIGINT) AS mx_sec,
               CAST(count(DISTINCT strptime(strftime(ts, '{dfmt}'), '{dfmt}'))
                    AS BIGINT) AS n_distinct
        FROM events WHERE event_id % {mod} = 0
    """
    assert_matches_oracle(sdf, duck, sql)


# --- integer division / modulo / cast-boundary fuzzing (round-10
# fifth family) ----------------------------------------------------------
# Mixed-sign integer pipelines: (key - offset) pushed through div / % /
# pmod chains must agree exactly — truncating division and
# dividend-sign modulo are shared semantics (probed, not assumed), and
# pmod's portable DuckDB spelling is ((a % k) + k) % k. The DIVERGENT
# boundaries (fractional-string try_cast, odd-half double→bigint cast,
# shift amounts ≥ 64, double division by zero) are pinned below as
# documented traps with their portable spellings.

_INTDIV_OPS = [
    # (spark_expr_fmt, duck_expr_fmt, k_must_be_positive) over {a} {k}
    ("({a}) div {k}", "({a}) // {k}", False),
    ("({a}) % {k}", "({a}) % {k}", False),
    # pmod's ((r+k)%k if r<0 else r) only equals the plain re-mod
    # spelling for positive divisors (negative-k asymmetry pinned below)
    ("pmod({a}, {k})", "((({a}) % {k}) + {k}) % {k}", True),
]


@st.composite
def _intdiv_specs(draw):
    col = draw(st.sampled_from(["o_orderkey", "o_custkey"]))
    offset = draw(st.integers(-5000, 5000))
    op1 = draw(st.integers(0, len(_INTDIV_OPS) - 1))
    k1 = draw(st.integers(-9, 9).filter(lambda x: x != 0))
    # optionally chain a second stage onto the first's result
    chain = draw(st.booleans())
    op2 = draw(st.integers(0, len(_INTDIV_OPS) - 1))
    k2 = draw(st.integers(-9, 9).filter(lambda x: x != 0))
    group = draw(st.sampled_from([None, "o_orderstatus"]))
    return col, offset, op1, k1, chain, op2, k2, group


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_intdiv_specs())
def test_generated_intdiv_pipeline_matches_duckdb(spark, duck, spec):
    """Truncating div / sign-of-dividend mod / non-negative pmod over
    mixed-sign integers, optionally chained, aggregated as exact
    bigints — any drift in rounding direction or sign convention
    between the engines fails the hash."""
    col, offset, op1, k1, chain, op2, k2, group = spec
    s_fmt1, d_fmt1, pos1 = _INTDIV_OPS[op1]
    if pos1:
        k1 = abs(k1)
    a = f"{col} - {offset}" if offset >= 0 else f"{col} + {-offset}"
    s_expr = s_fmt1.format(a=a, k=k1)
    d_expr = d_fmt1.format(a=a, k=k1)
    if chain:
        s_fmt2, d_fmt2, pos2 = _INTDIV_OPS[op2]
        if pos2:
            k2 = abs(k2)
        s_expr = s_fmt2.format(a=s_expr, k=k2)
        d_expr = d_fmt2.format(a=d_expr, k=k2)

    o = spark.read.parquet(
        "%s/orders.parquet" % __import__("conftest").SF_DIR
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(s_expr)).cast("bigint").alias("s"),
        F.min(F.expr(s_expr)).cast("bigint").alias("mn"),
        F.max(F.expr(s_expr)).cast("bigint").alias("mx"),
    ]
    agg_sql = (
        "CAST(count(*) AS BIGINT) AS n,"
        f" CAST(sum({d_expr}) AS BIGINT) AS s,"
        f" CAST(min({d_expr}) AS BIGINT) AS mn,"
        f" CAST(max({d_expr}) AS BIGINT) AS mx"
    )
    if group is None:
        sdf = o.agg(*aggs)
        sql = f"SELECT {agg_sql} FROM orders"
    else:
        sdf = o.groupBy(group).agg(*aggs)
        sql = f"SELECT {group}, {agg_sql} FROM orders GROUP BY {group}"
    assert_matches_oracle(sdf, duck, sql)


def test_fractional_string_try_cast_diverges_and_double_hop_heals(spark, duck):
    """Pin: try_cast('12.7' AS INT) is NULL in Spark (strict integer
    grammar) but 13 in DuckDB (parse-as-numeric then round). Portable
    spelling: hop through DOUBLE and take floor explicitly."""
    sv = spark.sql("SELECT try_cast('12.7' AS INT) AS v").first()["v"]
    dv = duck.execute("SELECT TRY_CAST('12.7' AS INT) AS v").fetchone()[0]
    assert sv is None and dv == 13  # the trap, pinned
    heal = "SELECT CAST(floor(try_cast('12.7' AS DOUBLE)) AS INT) AS v"
    heal_d = "SELECT CAST(floor(TRY_CAST('12.7' AS DOUBLE)) AS INT) AS v"
    assert (
        spark.sql(heal).first()["v"]
        == duck.execute(heal_d).fetchone()[0]
        == 12
    )


def test_odd_half_double_to_bigint_cast_diverges_and_floor_heals(spark, duck):
    """Pin: CAST(3.5E0 AS BIGINT) truncates to 3 in Spark but
    round-half-EVENs to 4 in DuckDB (2.5 agrees on 2 by accident —
    even — which is why the decimal pin alone wasn't enough). The
    floor(x + 0.5) spelling agrees everywhere."""
    sv = spark.sql("SELECT CAST(3.5E0 AS BIGINT) AS v").first()["v"]
    dv = duck.execute("SELECT CAST(3.5E0 AS BIGINT) AS v").fetchone()[0]
    assert sv == 3 and dv == 4  # the trap, pinned
    s = spark.sql("SELECT CAST(floor(3.5E0 + 0.5) AS BIGINT) AS v").first()["v"]
    d = duck.execute("SELECT CAST(floor(3.5E0 + 0.5) AS BIGINT) AS v").fetchone()[0]
    assert s == d == 4


def test_shift_amount_64_plus_diverges_and_mod_heals(spark, duck):
    """Pin: Java (hence Spark) masks bigint shift amounts mod 64, so
    1 << 65 == 2; DuckDB range-errors. Portable spelling: reduce the
    shift amount mod 64 explicitly before shifting."""
    sv = spark.sql("SELECT shiftleft(CAST(1 AS BIGINT), 65) AS v").first()["v"]
    assert sv == 2  # Java mask semantics, pinned
    import duckdb as _dd

    try:
        duck.execute("SELECT CAST(1 AS BIGINT) << 65").fetchone()
        raised = False
    except _dd.Error:
        raised = True
    assert raised  # DuckDB refuses, pinned
    s = spark.sql(
        "SELECT shiftleft(CAST(1 AS BIGINT), 65 % 64) AS v"
    ).first()["v"]
    d = duck.execute("SELECT CAST(1 AS BIGINT) << (65 % 64) AS v").fetchone()[0]
    assert s == d == 2


def test_double_division_by_zero_diverges_and_try_divide_heals(spark, duck):
    """Pin: 1.0/0.0 raises in Spark (ANSI) but is NULL in DuckDB
    (which never produces inf from division). Portable spelling:
    Spark try_divide ≡ DuckDB's native NULL-on-zero division."""
    from pyspark.errors import ArithmeticException

    # catch ONLY the divide-by-zero class: a broad except would also
    # swallow unrelated failures and mask the regression this pin
    # exists to catch (Spark 4.1 ANSI raises ArithmeticException here)
    with pytest.raises(ArithmeticException):
        spark.sql("SELECT 1.0E0 / 0.0E0 AS v").first()
    assert duck.execute("SELECT 1.0E0 / 0.0E0 AS v").fetchone()[0] is None
    s = spark.sql("SELECT try_divide(1.0E0, 0.0E0) AS v").first()["v"]
    assert s is None  # try_divide matches DuckDB's NULL


def test_pmod_negative_divisor_asymmetry_pinned(spark, duck):
    """Pin: Spark pmod(a, k) applies the +k re-mod ONLY when a % k is
    negative, so with a NEGATIVE divisor it is not 'always
    non-negative' — pmod(7, -3) = 1 but pmod(-7, -3) = -1 — and the
    plain ((a%k)+k)%k spelling diverges for positive dividends. The
    faithful portable spelling is the conditional itself."""
    assert spark.sql("SELECT pmod(7, -3) AS v").first()["v"] == 1
    assert spark.sql("SELECT pmod(-7, -3) AS v").first()["v"] == -1
    for a in (-8, -7, -1, 0, 1, 6, 7):
        for k in (-4, -3, 3, 4):
            s = spark.sql(f"SELECT pmod({a}, {k}) AS v").first()["v"]
            d = duck.execute(
                f"SELECT CASE WHEN ({a} % {k}) < 0"
                f" THEN (({a} % {k}) + {k}) % {k}"
                f" ELSE {a} % {k} END AS v"
            ).fetchone()[0]
            assert s == d, (a, k, s, d)


# --- string-function edge fuzzing (round-10 sixth family) ---------------
# Positional string ops over o_orderpriority/o_orderstatus: negative
# substr starts,
# over-length takes, lpad truncation, instr, left/right with
# non-negative counts all agree exactly (probed, not assumed) and are
# fuzzed as chains below. The DIVERGENT boundaries — substr at start 0
# (clamp-to-1 vs consume-length-from-0), rpad with an empty pad
# (truncate vs error), left/right with NEGATIVE counts (empty vs
# drop-from-other-end), and upper('ß') (Java full case mapping 'SS' vs
# simple mapping 'ẞ') — are pinned with their portable spellings.

_STRFN_OPS = [
    # (spark_fmt, duck_fmt) over {a} (string expr) and {p} {q} (ints >= 1)
    ("substr({a}, {p}, {q})", "substr({a}, {p}, {q})"),
    ("substr({a}, -{p})", "substr({a}, -{p})"),
    ("lpad({a}, {p}, 'x')", "lpad({a}, {p}, 'x')"),
    ("rpad({a}, {p}, 'yz')", "rpad({a}, {p}, 'yz')"),
    ("left({a}, {p})", "left({a}, {p})"),
    ("right({a}, {p})", "right({a}, {p})"),
    ("reverse({a})", "reverse({a})"),
]


@st.composite
def _strfn_specs(draw):
    col = draw(st.sampled_from(["o_orderpriority", "o_orderstatus"]))
    op1 = draw(st.integers(0, len(_STRFN_OPS) - 1))
    p1 = draw(st.integers(1, 12))
    q1 = draw(st.integers(1, 12))
    chain = draw(st.booleans())
    op2 = draw(st.integers(0, len(_STRFN_OPS) - 1))
    p2 = draw(st.integers(1, 12))
    q2 = draw(st.integers(1, 12))
    return col, op1, p1, q1, chain, op2, p2, q2


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_strfn_specs())
def test_generated_string_pipeline_matches_duckdb(spark, duck, spec):
    """Chained positional string ops aggregated as exact integers
    (length sums, distinct counts, instr positions) — any drift in
    1-based indexing, negative-start anchoring, padding, or take
    semantics fails the hash."""
    col, op1, p1, q1, chain, op2, p2, q2 = spec
    s_fmt1, d_fmt1 = _STRFN_OPS[op1]
    s_expr = s_fmt1.format(a=col, p=p1, q=q1)
    d_expr = d_fmt1.format(a=col, p=p1, q=q1)
    if chain:
        s_fmt2, d_fmt2 = _STRFN_OPS[op2]
        s_expr = s_fmt2.format(a=f"({s_expr})", p=p2, q=q2)
        d_expr = d_fmt2.format(a=f"({d_expr})", p=p2, q=q2)

    o = spark.read.parquet(
        "%s/orders.parquet" % __import__("conftest").SF_DIR
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.length(F.expr(s_expr))).cast("bigint").alias("len_sum"),
        F.countDistinct(F.expr(s_expr)).cast("bigint").alias("n_distinct"),
        # 'E' occurs in the sampled values (URGENT/MEDIUM/SPECIFIED) —
        # a character absent from the corpus would make this signal
        # identically zero and the instr drift check vacuous
        F.sum(F.expr(f"instr({s_expr}, 'E')")).cast("bigint").alias("pos_sum"),
    ]
    agg_sql = (
        "CAST(count(*) AS BIGINT) AS n,"
        f" CAST(sum(length({d_expr})) AS BIGINT) AS len_sum,"
        f" CAST(count(DISTINCT {d_expr}) AS BIGINT) AS n_distinct,"
        f" CAST(sum(instr({d_expr}, 'E')) AS BIGINT) AS pos_sum"
    )
    sdf = o.agg(*aggs)
    sql = f"SELECT {agg_sql} FROM orders"
    assert_matches_oracle(sdf, duck, sql)


def test_substr_start_zero_diverges_and_clamp_heals(spark, duck):
    """Pin: substr(s, 0, n) clamps start to 1 in Spark but consumes a
    length unit at position 0 in DuckDB ('abcdef',0,3 -> 'abc' vs
    'ab'). Portable spelling: greatest(start, 1)."""
    sv = spark.sql("SELECT substr('abcdef', 0, 3) AS v").first()["v"]
    dv = duck.execute("SELECT substr('abcdef', 0, 3) AS v").fetchone()[0]
    assert sv == "abc" and dv == "ab"  # the trap, pinned
    heal = "SELECT substr('abcdef', greatest(0, 1), 3) AS v"
    assert (
        spark.sql(heal).first()["v"]
        == duck.execute(heal).fetchone()[0]
        == "abc"
    )


def test_left_right_negative_count_diverges_and_clamp_heals(spark, duck):
    """Pin: left/right with a negative count is '' in Spark but
    drop-from-the-other-end in DuckDB (Python-slice semantics:
    left('abcdef', -2) = 'abcd'). Portable spelling:
    greatest(n, 0)."""
    assert spark.sql("SELECT left('abcdef', -2) AS v").first()["v"] == ""
    assert duck.execute("SELECT left('abcdef', -2) AS v").fetchone()[0] == "abcd"
    assert spark.sql("SELECT right('abcdef', -2) AS v").first()["v"] == ""
    assert duck.execute("SELECT right('abcdef', -2) AS v").fetchone()[0] == "cdef"
    heal = "SELECT left('abcdef', greatest(-2, 0)) AS v"
    assert (
        spark.sql(heal).first()["v"]
        == duck.execute(heal).fetchone()[0]
        == ""
    )


def test_rpad_empty_pad_diverges(spark, duck):
    """Pin: rpad(s, n, '') truncates-or-returns s in Spark but ERRORS
    in DuckDB. Portable contract: never pass an empty pad (guard or
    coalesce the pad string to a space)."""
    import duckdb as _dd

    assert spark.sql("SELECT rpad('ab', 5, '') AS v").first()["v"] == "ab"
    try:
        duck.execute("SELECT rpad('ab', 5, '') AS v").fetchone()
        raised = False
    except _dd.Error:
        raised = True
    assert raised


def test_upper_eszett_case_mapping_diverges(spark, duck):
    """Pin: Java (Spark) applies the FULL Unicode case mapping
    (upper('ß') = 'SS'); DuckDB applies the simple mapping ('ẞ').
    ASCII-only text is safe; localized corpora must normalize before
    cross-engine comparison (the PII/langid keys already operate on
    codepoints, not case-folded text)."""
    assert spark.sql("SELECT upper('straße') AS v").first()["v"] == "STRASSE"
    assert duck.execute("SELECT upper('straße') AS v").fetchone()[0] == "STRAẞE"


# --- DECIMAL division / overflow boundary fuzzing (round-11 family) ----
# The remaining divergence zone after the round-8 +,-,× family: DuckDB
# evaluates DECIMAL ÷ DECIMAL in DOUBLE while Spark divides exactly at
# DECIMAL(p,s), so the naive floor(a/b * 10^k + 0.5) spelling silently
# loses half-boundary quotients in one engine only; and at the
# precision ceiling Spark's ANSI sum raises ARITHMETIC_OVERFLOW where
# DuckDB raises its own HUGEINT out-of-range. The portable spellings —
# integer-domain rounded division (scaled BIGINT, DIV vs //) and the
# width-budget aggregate — are fuzzed; each raw divergence is pinned.

@st.composite
def _div_specs(draw):
    # divisor in tenths, never zero (zero-divisor semantics pinned
    # separately); round scale 0..2; optional group
    dt = draw(st.integers(1, 99))
    k = draw(st.integers(0, 2))
    group = draw(st.sampled_from([None, "o_orderstatus"]))
    return dt, k, group


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_div_specs())
def test_generated_decimal_division_int_domain_matches_duckdb(spark, duck, spec):
    """round(price / d, k) computed ENTIRELY in the integer domain —
    cents = price*100 as BIGINT, then half-up rounding as
    (cents*10^k*2 + d_cents) DIV (2*d_cents) — must be bit-identical
    cross-engine (Spark DIV and DuckDB // both truncate toward zero;
    operands here are non-negative). This is the division spelling the
    engine's discipline prescribes; the naive double path it replaces
    is pinned divergent below."""
    dt, k, group = spec
    d_cents = dt * 10  # divisor in cents
    p = 10 ** k

    o = spark.read.parquet(
        "%s/orders.parquet" % __import__("conftest").SF_DIR
    )
    # cents via the mirrored floor spelling (o_totalprice is DOUBLE;
    # a bare CAST truncates in Spark and rounds in DuckDB — the round-8
    # family's pinned divergence class)
    cents = F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    q = F.expr(
        f"(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * {p} * 2 + {d_cents})"
        f" DIV ({2 * d_cents})"
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q).cast("bigint").alias("s_q"),
        F.min(q).cast("bigint").alias("mn_q"),
        F.max(q).cast("bigint").alias("mx_q"),
        F.sum(cents).cast("bigint").alias("s_cents"),
    ]
    sql_q = (
        f"(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * {p} * 2 + {d_cents})"
        f" // ({2 * d_cents})"
    )
    agg_sql = (
        "CAST(count(*) AS BIGINT) AS n,"
        f" CAST(sum({sql_q}) AS BIGINT) AS s_q,"
        f" CAST(min({sql_q}) AS BIGINT) AS mn_q,"
        f" CAST(max({sql_q}) AS BIGINT) AS mx_q,"
        " CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s_cents"
    )
    if group is None:
        sdf = o.agg(*aggs)
        sql = f"SELECT {agg_sql} FROM orders"
    else:
        sdf = o.groupBy(group).agg(*aggs)
        sql = f"SELECT {group}, {agg_sql} FROM orders GROUP BY {group}"
    assert_matches_oracle(sdf, duck, sql)


def test_decimal_division_naive_double_diverges_and_int_domain_heals(spark, duck):
    """Pin the divergence the integer-domain spelling exists for:
    0.09 / 0.4 = 0.225 exactly — Spark divides at DECIMAL scale and
    the naive floor(q*100 + 0.5) lands 23, but DuckDB evaluates the
    quotient in DOUBLE (0.22499999…) and lands 22. The scaled-BIGINT
    half-up spelling agrees at 23 in both."""
    naive = "CAST(floor(CAST(0.09 AS DECIMAL(18,2)) / CAST(0.4 AS DECIMAL(4,1)) * 100 + 0.5) AS BIGINT)"
    s_naive = spark.sql(f"SELECT {naive} AS v").first()["v"]
    d_naive = duck.execute(f"SELECT {naive} AS v").fetchone()[0]
    assert s_naive == 23 and d_naive == 22  # the trap, pinned

    s_int = spark.sql(
        "SELECT (9 * 100 * 2 + 40) DIV (2 * 40) AS v"
    ).first()["v"]
    d_int = duck.execute(
        "SELECT (9 * 100 * 2 + 40) // (2 * 40) AS v"
    ).fetchone()[0]
    assert s_int == d_int == 23


def test_decimal_division_by_zero_portable_spelling(spark, duck):
    """Zero-divisor semantics: Spark ANSI `/` and `DIV` RAISE on a
    zero divisor where DuckDB yields NULL — the portable spelling is
    Spark try_divide ≡ DuckDB `/` (NULL in both). Pinned in both
    directions so neither engine's behavior drifts unnoticed."""
    import pyspark.errors as pe

    with pytest.raises(pe.exceptions.captured.ArithmeticException):
        spark.sql(
            "SELECT CAST(7.3 AS DECIMAL(18,2)) / CAST(0 AS DECIMAL(4,1)) AS v"
        ).collect()
    with pytest.raises(pe.exceptions.captured.ArithmeticException):
        spark.sql("SELECT 7 DIV 0 AS v").collect()

    s = spark.sql(
        "SELECT try_divide(CAST(7.3 AS DECIMAL(18,2)), CAST(0 AS DECIMAL(4,1))) AS v"
    ).first()["v"]
    d = duck.execute(
        "SELECT CAST(7.3 AS DECIMAL(18,2)) / CAST(0 AS DECIMAL(4,1)) AS v"
    ).fetchone()[0]
    assert s is None and d is None
    # DuckDB's integer // is NULL on zero too (no raise to pin there)
    assert duck.execute("SELECT 7 // 0 AS v").fetchone()[0] is None


def test_decimal_sum_overflow_boundary_and_width_budget(spark, duck):
    """The precision ceiling: summing ten 38-digit DECIMAL(38,0)
    values overflows BOTH engines but through DIFFERENT channels —
    Spark ANSI raises ARITHMETIC_OVERFLOW (try_sum yields NULL),
    DuckDB's HUGEINT accumulator raises Out of Range — so no portable
    spelling exists AT the ceiling; the discipline is the width
    budget: values bounded one decade below (10 × 1e36 < 1e38) must
    aggregate bit-identically. Exact-integer literals via repeat()
    (a 1e36 DOUBLE literal is inexact and poisons the decimal in both
    engines — also pinned)."""
    import pyspark.errors as pe

    big = "CAST('9' || repeat('9', 37) AS DECIMAL(38,0))"  # 38 nines
    with pytest.raises(pe.exceptions.captured.ArithmeticException):
        spark.sql(
            f"SELECT sum(v) FROM (SELECT {big} AS v FROM range(10))"
        ).collect()
    s_try = spark.sql(
        f"SELECT try_sum(v) AS v FROM (SELECT {big} AS v FROM range(10))"
    ).first()["v"]
    assert s_try is None
    with pytest.raises(Exception, match="Out of Range"):
        duck.execute(
            f"SELECT sum(v) FROM (SELECT {big} AS v FROM range(10))"
        ).fetchall()

    # width budget honored: one decade of headroom, exact literals
    ok = "CAST('1' || repeat('0', 36) AS DECIMAL(38,0))"
    s = spark.sql(
        f"SELECT CAST(sum(v) AS STRING) AS v FROM (SELECT {ok} AS v FROM range(10))"
    ).first()["v"]
    d = duck.execute(
        f"SELECT CAST(sum(v) AS VARCHAR) AS v FROM (SELECT {ok} AS v FROM range(10))"
    ).fetchone()[0]
    assert s == d == "1" + "0" * 37

    # the double-literal trap: CAST(1e36 AS DECIMAL) is NOT 10^36
    d_lit = duck.execute(
        "SELECT CAST(CAST(1e36 AS DECIMAL(38,0)) AS VARCHAR)"
    ).fetchone()[0]
    assert d_lit != "1" + "0" * 36  # inexact — why exact strings are used
