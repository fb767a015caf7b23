"""Modern SQL-surface operators: recursive CTEs, VARIANT-typed JSON,
multi-match regex extraction, and map construction/transformation.

The reference's entire SQL surface is ``spark.read``/``write`` (no
queries exist in it at all, SURVEY.md §2.2); this module rounds out
the engine's dialect with the Spark-4 features a user migrating a
modern warehouse workload expects, each checked against DuckDB's
spelling of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround, sql_dround
from ..sources import load_table
from .registry import query

# Identical text runs on both engines (the sql_surface pattern,
# plans/relational.py:813): the portable-recursion subset — UNION ALL,
# integer arithmetic, || concat.  The seed/step tree is a binary heap
# over nation keys (parent(k) = floor((k-1)/2)), so the recursion is
# data-driven and its depth (log2 n) is the number of self-join rounds
# Spark's recursive-CTE executor runs.
_RECURSIVE_SQL = """
WITH RECURSIVE tree AS (
  SELECT n_nationkey AS key, n_name AS name, 0 AS depth, n_name AS path
  FROM {nation} WHERE n_nationkey = 0
  UNION ALL
  SELECT n.n_nationkey AS key, n.n_name AS name, t.depth + 1 AS depth,
         t.path || '/' || n.n_name AS path
  FROM {nation} n JOIN tree t
    ON CAST(floor((n.n_nationkey - 1) / 2.0) AS BIGINT) = t.key
  WHERE n.n_nationkey > 0
)
SELECT key, name, depth, path FROM tree
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_SQL.format(nation="nation"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 recursive CTE): hierarchy expansion —
    per-row depth and root path over a parent-child tree derived from
    the nation table. Each recursion round is one distributed
    hash-join of the frontier against the (broadcastable) parent
    table, so a 100 TB hierarchy walk is O(depth) joins, not a
    driver-side loop."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("rg_rec_nation")
    return spark.sql(_RECURSIVE_SQL.format(nation="rg_rec_nation"))


@query(
    "json_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed JSON path access (Spark 4): parse_json once into
    a binary VARIANT column, then typed variant_get extraction and a
    filter on the extracted value. Contrast json_extract
    (plans/relational.py:622), which re-parses with get_json_object:
    VARIANT parses each row once into a navigable binary — the scale
    answer for multi-path access over 100 TB of event JSON."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_id", k.alias("k"))
        .filter(F.col("k") % 7 == 0)
    )


@query(
    "regexp_extract_all",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\b(?:table|query|scan)\b')) AS n_hits,
           coalesce(array_to_string(
             list_sort(list_distinct(
               regexp_extract_all(text, '\b(?:table|query|scan)\b'))),
             ','), '') AS distinct_hits
    FROM documents
    """,
)
def regexp_extract_all_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction: every occurrence of a term set
    per document, as count + sorted-distinct CSV. All JVM-codegen
    (regexp_extract_all + array exprs) — one scan, zero shuffles,
    zero Python."""
    docs = load_table(spark, sf_dir, "documents")
    hits = F.regexp_extract_all("text", F.lit(r"\b(?:table|query|scan)\b"), 0)
    return docs.select(
        "doc_id",
        F.size(hits).alias("n_hits"),
        F.array_join(F.array_sort(F.array_distinct(hits)), ",").alias(
            "distinct_hits"
        ),
    )


@query(
    "map_fns",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.user_id, c.event_type, c.n,
           {sql_dround("c.n / CAST(t.tot AS DOUBLE)", 6)} AS share
    FROM c JOIN t USING (user_id)
    WHERE c.n >= 2
    """,
)
def map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per-user event-type histogram built
    as map<string,bigint> (map_from_entries), thresholded with
    map_filter, normalized with transform_values, flattened back to
    rows with explode(map_entries) — the flat output is what DuckDB
    states relationally. The map never leaves the executor: one
    partial-agg shuffle on (user, type), one per-user collect."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_user = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    tot = F.aggregate(F.map_values("m"), F.lit(0).cast("bigint"), lambda a, x: a + x)
    kept = F.map_filter(F.col("m"), lambda k, v: v >= 2)
    shares = F.transform_values(
        kept, lambda k, v: dround(v / tot.cast("double"), 6)
    )
    entry = F.explode(F.map_entries(F.map_zip_with(
        kept, shares, lambda k, n, s: F.struct(n.alias("n"), s.alias("share"))
    )))
    return per_user.select("user_id", entry.alias("e")).select(
        "user_id",
        F.col("e.key").alias("event_type"),
        F.col("e.value.n").alias("n"),
        F.col("e.value.share").alias("share"),
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4, `|>`): the linear FROM → WHERE →
    AGGREGATE spelling of a filtered grouped aggregate. Pure dialect
    surface — the parser lowers it to the identical logical plan as
    the GROUP BY form (the oracle), so Catalyst's optimizations apply
    unchanged; the key pins that the pipe dialect is available and
    produces value-identical results."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("rg_pipe_li")
    return spark.sql(
        """
        FROM rg_pipe_li
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |> AGGREGATE count(*) AS n,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty
           GROUP BY l_returnflag
        |> SELECT l_returnflag, n, sum_qty
        """
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (Spark 4 `spark.sql(..., args=...)`): the
    injection-safe spelling of a templated query — parameters bind as
    typed literals in the parser, never string-spliced, and constant
    folding then treats them exactly like inline literals (same plan,
    so partition pruning on a parameterized date still works). The
    oracle is the same query with the literals inlined."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rg_param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM rg_param_orders
        WHERE o_orderdate >= :cutoff AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"cutoff": "1996-01-01 00:00:00", "status": "O"},
    )


# Identical text runs on both engines (the sql_surface pattern): the
# DuckDB-originated GROUP BY ALL / ORDER BY ALL dialect that Spark
# adopted — every non-aggregate select item becomes a grouping key, so
# the query can't silently drop a key when the projection evolves.
_GROUP_BY_ALL_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*) AS n_rows
FROM {lineitem}
GROUP BY ALL
ORDER BY ALL
"""


@query("sql_group_by_all", oracle=_GROUP_BY_ALL_SQL.format(lineitem="lineitem"))
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark ≥3.4 dialect, shared with
    DuckDB): the grouping keys are inferred from the projection, so
    adding a dimension to the SELECT list can never produce the
    classic silently-wrong partial grouping. Pure parser sugar — the
    resolved plan is the identical partial-agg hash aggregate as the
    explicit GROUP BY spelling, so the 100 TB cost model is unchanged.
    The exact same SQL text executes on both engines (the strongest
    portability attestation this harness supports); DECIMAL-exact
    sums make the values bit-comparable."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("rg_gba_lineitem")
    return spark.sql(_GROUP_BY_ALL_SQL.format(lineitem="rg_gba_lineitem"))


# ==========================================================================
# Round-5 SQL-surface batch: aggregate FILTER clause, TRY_CAST error-safe
# parsing. Both keys run IDENTICAL SQL text on Spark and DuckDB (the
# sql_surface / sql_group_by_all portability pattern).
# ==========================================================================

_AGG_FILTER_SQL = """
SELECT l_returnflag,
       count(*) AS n_all,
       count(*) FILTER (WHERE l_discount > 0.05) AS n_high_disc,
       count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
            FILTER (WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00')
            AS DOUBLE) AS qty_96_on
FROM {lineitem}
GROUP BY l_returnflag
"""


@query("sql_agg_filter_clause", oracle=_AGG_FILTER_SQL.format(lineitem="lineitem"))
def sql_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-SQL aggregate FILTER clause: per-aggregate predicates
    inside ONE grouping pass — the portable replacement for the
    sum(CASE WHEN ...) idiom, and the single-scan replacement for N
    filtered subqueries (at 100 TB, one partial-agg pass instead of N
    scans is the whole game). The identical SQL text executes on both
    engines; DECIMAL-exact sums keep the filtered aggregate
    bit-comparable. A filtered aggregate still participates in
    map-side partial aggregation — the filter applies pre-partial, so
    the shuffle still carries one row per (flag, aggregate)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("rg_af_lineitem")
    return spark.sql(_AGG_FILTER_SQL.format(lineitem="rg_af_lineitem"))


_TRY_CAST_SQL = """
WITH by_prio AS (
  SELECT o_orderpriority AS p, count(*) AS n,
         CAST(sum(try_cast(substr(CAST(o_orderkey AS STRING), 1, 3)
                           AS BIGINT)) AS BIGINT) AS skp
  FROM {orders}
  GROUP BY 1
)
SELECT try_cast(substr(p, 1, 1) AS INT) AS prio_num,
       CAST(sum(n) AS BIGINT) AS n_orders,
       CAST(coalesce(sum(CASE WHEN try_cast(p AS INT) IS NOT NULL
                              THEN n END), 0) AS BIGINT) AS n_full_parse,
       CAST(coalesce(sum(CASE WHEN try_cast(substr(p, 3) AS INT) IS NOT NULL
                              THEN n END), 0) AS BIGINT) AS n_word_parse,
       CAST(sum(skp) AS BIGINT) AS sum_key_prefix
FROM by_prio
GROUP BY 1
"""


@query("sql_try_cast_safe", oracle=_TRY_CAST_SQL.format(orders="orders"))
def sql_try_cast_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST error-safe parsing — the dirty-input contract every
    ingest of external text needs: a malformed value yields NULL
    instead of failing the job (ANSI mode on) or silently corrupting
    (legacy mode off). Exercised three ways against the same strings:
    a prefix that always parses, a full string that never does
    (count stays 0), and a suffix that never does
    ('1-URGENT' → 'URGENT'). Identical SQL text on both engines.

    Scale note (measured): Spark's try_cast failure path costs ~8 µs
    per failing row (an internal JVM exception per parse miss) vs
    ~1 µs when the parse succeeds — a mostly-unparseable column makes
    the naive per-row form exception-bound (1.3 s per failing cast on
    just 150k rows, single thread). The fix used here is
    PARSE-ONCE-PER-DISTINCT-VALUE: pre-aggregate the low-cardinality
    dirty column (5 distinct priorities), run the failing casts on the
    5 distinct strings, and weight by the group counts — at 100 TB
    that is 5 parse attempts instead of 1.5 B, while the
    high-cardinality cast that succeeds (orderkey prefix) stays
    per-row in the first partial-agg pass. Both aggregations remain
    map-side partial; results are identical to the per-row form."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rg_tc_orders")
    return spark.sql(_TRY_CAST_SQL.format(orders="rg_tc_orders"))


# --------------------------------------------------------------------------
# Round 6: correlated existence predicates, DISTINCT ON / QUALIFY
# dialect forms, inline VALUES dims, multiset (ALL) set ops, and
# positional explode — the remaining dialect surface a warehouse
# migration exercises.
# --------------------------------------------------------------------------

# Identical text on both engines (the sql_surface pattern): correlated
# EXISTS / NOT EXISTS — the canonical semi/anti-join spelling.  Spark
# rewrites both into LeftSemi/LeftAnti joins; the DataFrame twins are
# join_semi / join_anti, this key pins the SQL front door.
_EXISTS_SQL = """
SELECT c.c_custkey, c.c_name
FROM {customer} c
WHERE EXISTS (SELECT 1 FROM {orders} o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
  AND NOT EXISTS (SELECT 1 FROM {orders} o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_totalprice > 250000)
"""


@query(
    "sql_exists_not_exists",
    oracle=_EXISTS_SQL.format(customer="customer", orders="orders"),
)
def sql_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one predicate: customers with
    at least one fulfilled order and no quarter-million-dollar order.
    Catalyst rewrites the pair into a LeftSemi join followed by a
    LeftAnti join on the same key — two hash joins, no subquery
    re-execution per row (the .explain shape test asserts no
    nested-loop). Both joins shuffle on c_custkey once under AQE;
    at 100 TB the semi/anti pair is the cheapest existence check
    there is (build side is just the key column)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("rg_ex_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rg_ex_orders")
    return spark.sql(_EXISTS_SQL.format(customer="rg_ex_customer", orders="rg_ex_orders"))


@query(
    "sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey,
           o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS latest_order_date,
           CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer — DuckDB/Postgres spell it DISTINCT
    ON, the engine spells it row_number()=1 over (key ORDER BY ts
    DESC, id DESC): same semantics, and the deterministic tiebreak
    (orderkey) is what makes the answer engine-independent. At scale
    this is ONE hash shuffle on the key with the sort confined to
    each partition; for top-1 Spark can also use max_by, but the
    window form generalizes to top-n and carries whole rows."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_order_date"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
    )


@query(
    "sql_qualify_topn",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC,
                                            o_orderkey ASC) AS BIGINT) AS rn
    FROM orders
    QUALIFY rn <= 3
    """,
)
def sql_qualify_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority — the QUALIFY clause (DuckDB/
    Snowflake/BigQuery dialect) filtering on a window function without
    a subquery. Spark has no QUALIFY; the engine's canonical rewrite
    is window → filter, which Catalyst executes identically to the
    QUALIFY plan: one shuffle on the partition key, per-partition
    TopK sort (the WindowGroupLimit optimization prunes each
    partition to 3 rows BEFORE the full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "sql_values_inline_lookup",
    oracle="""
    SELECT m.label,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o
    JOIN (VALUES ('O', 'open'), ('F', 'fulfilled'), ('P', 'pending'))
         m(status, label)
      ON m.status = o.o_orderstatus
    GROUP BY m.label
    """,
)
def sql_values_inline_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES dimension — the literal lookup table (status code
    → label) every pipeline embeds for code-to-name mapping. The
    engine builds it with createDataFrame and BROADCASTS it: a
    literal dim never shuffles the fact side, the join is map-side at
    any fact scale. The decimal-exact sum crosses engines as one
    double cast at the end."""
    o = load_table(spark, sf_dir, "orders")
    m = spark.createDataFrame(
        [("O", "open"), ("F", "fulfilled"), ("P", "pending")],
        "status string, label string",
    )
    return (
        o.join(F.broadcast(m), o.o_orderstatus == m.status)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@query(
    "set_ops_all",
    oracle="""
    WITH a AS (SELECT c_nationkey AS nk FROM customer),
         b AS (SELECT s_nationkey AS nk FROM supplier),
         u AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_union_all
               FROM (SELECT nk FROM a UNION ALL SELECT nk FROM b)
               GROUP BY nk),
         i AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_intersect_all
               FROM (SELECT nk FROM a INTERSECT ALL SELECT nk FROM b)
               GROUP BY nk),
         e AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_except_all
               FROM (SELECT nk FROM a EXCEPT ALL SELECT nk FROM b)
               GROUP BY nk)
    SELECT u.nk,
           u.n_union_all,
           coalesce(i.n_intersect_all, 0) AS n_intersect_all,
           coalesce(e.n_except_all, 0) AS n_except_all
    FROM u
    LEFT JOIN i ON i.nk = u.nk
    LEFT JOIN e ON e.nk = u.nk
    """,
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — UNION ALL / INTERSECT ALL /
    EXCEPT ALL, where multiplicity matters: INTERSECT ALL keeps
    min(count_a, count_b) copies, EXCEPT ALL keeps count_a − count_b.
    Spark's intersectAll/exceptAll implement exactly these SQL:2003
    semantics (hash-aggregate on (value, side-count) internally — one
    shuffle each, no join explosion). The per-key multiplicity
    summary makes the bag semantics hash-checkable without comparing
    raw multisets row-by-row."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    u = c.unionAll(s).groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union_all")
    )
    i = c.intersectAll(s).groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intersect_all")
    )
    e = c.exceptAll(s).groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_except_all")
    )
    return (
        u.join(i, "nk", "left")
        .join(e, "nk", "left")
        .select(
            "nk",
            "n_union_all",
            F.coalesce("n_intersect_all", F.lit(0)).alias("n_intersect_all"),
            F.coalesce("n_except_all", F.lit(0)).alias("n_except_all"),
        )
    )


@query(
    "explode_posexplode",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
      FROM documents WHERE doc_id % 20 = 0
    )
    SELECT doc_id,
           CAST(generate_subscripts(w, 1) AS BIGINT) AS pos,
           unnest(w) AS tok
    FROM toks
    """,
)
def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (UNNEST WITH ORDINALITY): every token of a
    document with its 1-based position — the array-to-rows primitive
    that keeps ORDER, which plain explode loses and sequence models
    need (position-aware n-grams, alignment joins). posexplode is
    codegen'd generator expansion: no shuffle at all, output rows
    stream out of the scan stage; the doc_id%20 slice bounds fixture
    output, the operator itself is linear in tokens at any scale."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("w"),
    )
    return toks.select(
        "doc_id", F.posexplode("w").alias("pos0", "tok")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok"
    )


# --------------------------------------------------------------------------
# Round-7 dialect surface: named WINDOW clause, ORDER BY ALL,
# SELECT * EXCEPT, IS DISTINCT FROM
# --------------------------------------------------------------------------
_NAMED_WINDOW_SQL = """
SELECT o_custkey, o_orderkey,
       rank() OVER w AS rk,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS run_spend
FROM {orders}
WHERE o_custkey % 50 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("sql_window_clause_named", oracle=_NAMED_WINDOW_SQL.format(orders="orders"))
def sql_window_clause_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause (SQL:2003): ONE window specification
    declared once and shared by several window functions — the
    dialect feature that keeps multi-function window queries DRY and,
    in Spark, guarantees the shared spec compiles to a single
    sort+Window operator instead of one per spelling drift. Identical
    text runs on both engines (the sql_surface pattern). Running
    DECIMAL sum cast to double once at the end — exact at any scale."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rg_nw_orders")
    return spark.sql(_NAMED_WINDOW_SQL.format(orders="rg_nw_orders"))


_ORDER_BY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM {orders}
GROUP BY ALL
ORDER BY ALL
"""


@query("sql_order_by_all", oracle=_ORDER_BY_ALL_SQL.format(orders="orders"))
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL (the DuckDB-originated shorthand
    Spark 4 adopted): group on every non-aggregate select item, order
    on every select item left-to-right. Complements the existing
    sql_group_by_all key with the ORDER BY half — together the full
    'repeat no column list' dialect. Identical text on both
    engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rg_oba_orders")
    return spark.sql(_ORDER_BY_ALL_SQL.format(orders="rg_oba_orders"))


@query(
    "sql_star_except",
    oracle="""
    SELECT * EXCLUDE (c_name, c_acctbal) FROM customer
    WHERE c_custkey % 20 = 0
    """,
)
def sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT(...) — star projection minus named columns,
    the ergonomic spelling for wide tables where 'everything but the
    PII / blob columns' beats a 200-name list. Dialect boundary
    documented by this key: Spark 4 spells it EXCEPT, DuckDB spells
    it EXCLUDE — same semantics, so the oracle uses DuckDB's keyword.
    Column pruning still reaches the scan (ReadSchema drops the
    excluded names — no wasted I/O at 100 TB)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("rg_se_customer")
    return spark.sql(
        "SELECT * EXCEPT (c_name, c_acctbal) FROM rg_se_customer "
        "WHERE c_custkey % 20 = 0"
    )


_IS_DISTINCT_SQL = """
SELECT o_orderkey,
       nullif(o_orderkey % 3, 0) IS DISTINCT FROM nullif(o_orderkey % 5, 0)
         AS pair_differs,
       count(*) OVER () AS n_total
FROM {orders}
WHERE o_orderkey % 11 = 0
  AND nullif(o_orderkey % 3, 0) IS NOT DISTINCT FROM nullif(o_orderkey % 5, 0)
   OR o_orderkey % 11 = 0 AND o_orderkey % 7 = 0
"""


@query("sql_is_distinct_from", oracle=_IS_DISTINCT_SQL.format(orders="orders"))
def sql_is_distinct_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] DISTINCT FROM — null-safe equality as a scalar
    predicate (the projection/filter counterpart of join_null_safe's
    <=> join): NULL compares equal to NULL and unequal to every
    value, so the predicate is total and filters never silently drop
    null rows the way `=` does. Identical text on both engines;
    nullif() manufactures the null cases deterministically."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rg_idf_orders")
    return spark.sql(_IS_DISTINCT_SQL.format(orders="rg_idf_orders"))


@query(
    "nested_struct_array_ops",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             list(struct_pack(
                    d := strftime(o_orderdate, '%Y-%m-%d'),
                    k := o_orderkey,
                    p := CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  ORDER BY strftime(o_orderdate, '%Y-%m-%d'), o_orderkey)
               AS hist
      FROM orders WHERE o_custkey % 20 = 0
      GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(len(hist) AS BIGINT) AS n_orders,
           hist[1].d AS first_date,
           hist[1].p AS first_cents,
           hist[len(hist)].d AS last_date,
           hist[len(hist)].p AS last_cents
    FROM per
    """,
)
def nested_struct_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type surface: build an ordered ARRAY<STRUCT> order
    history per customer (collect → canonical sort), then navigate it
    — length, first/last element field access. This is the
    denormalized 'events as a nested column' data model every
    document-shaped pipeline uses (one row per entity, history
    nested), exercised natively rather than via JSON strings
    (json_extract's territory). Struct fields are ordered (date
    string, key, cents) so Spark's sort_array lexicographic struct
    compare equals the oracle's explicit ORDER BY — collect_list is
    unordered on both engines, so the CANONICAL SORT is what makes
    nested aggregation deterministic (the agg_collect_ordered
    discipline applied to structs). Per-customer arrays are bounded
    by per-key fan-in; the shuffle carries each order once."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    hist = o.groupBy("o_custkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
                    F.col("o_orderkey").alias("k"),
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                    .cast("bigint")
                    .alias("p"),
                )
            )
        ).alias("hist")
    )
    n = F.size("hist")
    return hist.select(
        "o_custkey",
        n.cast("bigint").alias("n_orders"),
        F.element_at("hist", 1).getField("d").alias("first_date"),
        F.element_at("hist", 1).getField("p").alias("first_cents"),
        F.element_at("hist", n).getField("d").alias("last_date"),
        F.element_at("hist", n).getField("p").alias("last_cents"),
    )


@query(
    "sql_pivot_clause",
    oracle="""
    SELECT o_orderstatus,
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '1-URGENT'
                 THEN 1 END), 0) AS BIGINT) AS urgent_n,
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
                 THEN 1 END), 0) AS BIGINT) AS medium_n,
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '5-LOW'
                 THEN 1 END), 0) AS BIGINT) AS low_n
    FROM orders GROUP BY o_orderstatus
    """,
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (Spark's `FROM ... PIVOT (agg FOR col IN
    (...))` syntax) — the dialect spelling of pivot_event_matrix's
    DataFrame `.pivot()`: same plan (one partial-aggregable groupBy,
    pivot columns resolved at compile time from the IN list — never a
    second distinct-scan), different API surface. The oracle spells
    the portable CASE-sum equivalence, which is also exactly what
    Catalyst lowers PIVOT to."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rg_pv_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               coalesce(`1-URGENT`, 0) AS urgent_n,
               coalesce(`3-MEDIUM`, 0) AS medium_n,
               coalesce(`5-LOW`, 0) AS low_n
        FROM (
          SELECT o_orderstatus, o_orderpriority FROM rg_pv_orders
        )
        PIVOT (
          CAST(count(*) AS BIGINT)
          FOR o_orderpriority IN ('1-URGENT', '3-MEDIUM', '5-LOW')
        )
        """
    )


@query(
    "agg_string_concat_ordered",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segs
    FROM (
      SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    )
    GROUP BY c_nationkey
    """,
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg ... ORDER BY)
    — the report-friendly 'roll the group's values into one delimited
    string' aggregate. Determinism rule this key pins: an UNORDERED
    string_agg is nondeterministic under any parallel execution, so
    the engine spelling is sort_array(collect_list()) → concat_ws —
    canonical order imposed BEFORE concatenation (the
    agg_collect_ordered discipline); the oracle uses DuckDB's native
    ORDER BY clause for the same contract. Distinct-reduced input
    keeps the strings bounded; the aggregate itself is one partial-agg
    shuffle."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_nationkey", "c_mktsegment")
        .distinct()
        .groupBy("c_nationkey")
        .agg(
            F.concat_ws(
                "|", F.sort_array(F.collect_list("c_mktsegment"))
            ).alias("segs")
        )
    )
