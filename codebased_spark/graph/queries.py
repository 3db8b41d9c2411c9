"""Analytics query library over the provided test tables.

Each function takes (spark, sf_dir) and returns a DataFrame; each has an
ANSI-SQL twin in __spark_entry__.oracle_sql() run by DuckDB. Together they
re-express the reference's query surface (SURVEY.md §2.4-2.6: hash aggs,
edge-pattern joins, anti-joins, top-k, distinct aggs, windows) over the
driver's TPC-H-ish tables, plus KG-style extraction queries over `documents`.

Column-aliasing discipline: every computed column is aliased identically in
the DataFrame code and the SQL so the driver's order-insensitive value-hash
lines up. Doubles are rounded to fixed decimals on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codebased_spark.util import round_stable

# Small gazetteer over the documents vocabulary — the broadcast dimension for
# KG mention queries (analog of the reference's node-type tables,
# javascript.py:25-46). Inlined as VALUES in the oracle SQL.
DOC_GAZETTEER = [
    ("spark", "ent:concept:spark", "Tech"),
    ("join", "ent:op:join", "Operator"),
    ("merge", "ent:op:merge", "Operator"),
    ("filter", "ent:op:filter", "Operator"),
    ("window", "ent:op:window", "Operator"),
    ("hash", "ent:op:hash", "Operator"),
    ("scan", "ent:op:scan", "Operator"),
    ("customer", "ent:table:customer", "Table"),
    ("vector", "ent:concept:vector", "Tech"),
    ("stream", "ent:concept:stream", "Tech"),
    # deliberately absent from the corpus vocabulary → exercises the
    # unused-entity anti-join (Q2) with a non-empty result
    ("catalyst", "ent:concept:catalyst", "Tech"),
]

GAZ_SQL_VALUES = ", ".join(f"('{w}', '{c}', '{t}')" for w, c, t in DOC_GAZETTEER)


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _gaz_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        DOC_GAZETTEER, ["surface_form", "canonical_id", "entity_type"]
    )


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents exploded to (doc_id, word) — the mention-scan primitive.

    split+explode is JVM-side whole-stage-codegen; at scale the subsequent
    gazetteer join broadcasts the dimension (a few KB) so the fact table
    never shuffles.
    """
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).where(F.col("word") != "")


def kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc gazetteer mention counts (E13/E16 analog: dictionary scan)."""
    gaz = F.broadcast(_gaz_df(spark))
    return (
        _tokens(spark, sf_dir)
        .join(gaz, F.col("word") == gaz.surface_form)
        .groupBy("doc_id", "canonical_id", "entity_type")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


def kg_top_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-mentioned entities, top-20 (A4: join + groupBy + top-k)."""
    gaz = F.broadcast(_gaz_df(spark))
    return (
        _tokens(spark, sf_dir)
        .join(gaz, F.col("word") == gaz.surface_form)
        .groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .orderBy(F.desc("n_mentions"), F.asc("canonical_id"))
        .limit(20)
    )


def kg_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity co-occurrence edges: pairs in the same doc (Q1 edge join)."""
    gaz = F.broadcast(_gaz_df(spark))
    m = (
        _tokens(spark, sf_dir)
        .join(gaz, F.col("word") == gaz.surface_form)
        .select("doc_id", "canonical_id")
        .distinct()
    )
    a = m.alias("a")
    b = m.alias("b")
    return (
        a.join(b, "doc_id")
        .where(F.col("a.canonical_id") < F.col("b.canonical_id"))
        .groupBy(
            F.col("a.canonical_id").alias("src"),
            F.col("b.canonical_id").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def kg_entity_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-mention PMI edge weighting — the knowledge-fusion scorer.

    Raw co-occurrence counts (kg_cooccurrence) over-weight head entities;
    PMI(a,b) = ln(P(a,b) / (P(a)P(b))) normalizes by marginal frequency,
    which is the standard relatedness weight a KG pipeline attaches to
    co-mention edges before thresholding.

    The value-checked surface is the exact integer-ratio `lift` (pmi =
    ln(lift) is a bijection of it): natural log is transcendental, and
    JVM vs DuckDB libm can differ in the last ulp, which could flip the
    4-decimal rounding at a boundary value and flake the hash gate
    (ADVICE r3). The log itself stays available as
    ``with_pmi(df)``, pytest-checked with a tolerance.

    Scale shape: the doc-keyed pair join is bounded by per-doc entity-set
    size; both marginal-count joins broadcast (vocabulary-sized); the
    corpus total is one scalar. No corpus-sized shuffle beyond the
    distinct mention set that kg_cooccurrence already pays.
    """
    gaz = F.broadcast(_gaz_df(spark))
    docs = _read(spark, sf_dir, "documents")
    n_total = docs.count()
    m = (
        _tokens(spark, sf_dir)
        .join(gaz, F.col("word") == gaz.surface_form)
        .select("doc_id", "canonical_id")
        .distinct()
    )
    cnt = m.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("c"))
    a, b = m.alias("a"), m.alias("b")
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("a.canonical_id") < F.col("b.canonical_id"))
        .groupBy(
            F.col("a.canonical_id").alias("src"),
            F.col("b.canonical_id").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    ratio = (F.col("n_docs") * F.lit(n_total)).cast("double") / (
        F.col("ca") * F.col("cb")
    ).cast("double")
    return (
        pairs.join(
            F.broadcast(cnt.select(F.col("canonical_id").alias("src"), F.col("c").alias("ca"))),
            "src",
        )
        .join(
            F.broadcast(cnt.select(F.col("canonical_id").alias("dst"), F.col("c").alias("cb"))),
            "dst",
        )
        .select(
            "src",
            "dst",
            "n_docs",
            round_stable(ratio).alias("lift"),
        )
    )


def kg_entity_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, entity) salience scoring — the feature table an entity
    linker ranks by before picking a page's topical entities.

    Classic salience features (position + frequency, the backbone of
    every salience system since Dunietz & Gillick 2014): n_mentions,
    first_pos (1-based token position of the first mention), is_lead
    (first mention inside the lead 10% of the doc — the web analog of
    headline/first-paragraph weighting), and salience_rank (the per-doc
    ordering by mentions desc, earliest-first, entity asc — fully
    deterministic, so the window is cross-engine exact).

    All features are integers or integer comparisons — no floats near
    the hash gate. Scale shape: one posexplode (map-side), the broadcast
    gazetteer join (fact table never shuffles for the join), one
    (doc, entity) agg with map-side combine, one doc-keyed agg for
    n_words, a doc-keyed join, and one window partitioned by doc_id —
    every key is per-document, so skew is bounded by the longest doc.
    """
    gaz = F.broadcast(_gaz_df(spark))
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "word"),
    ).where(F.col("word") != "")
    toks = toks.select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    n_words = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_words"))
    m = (
        toks.join(gaz, F.col("word") == gaz.surface_form)
        .groupBy("doc_id", "canonical_id")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.min("pos").alias("first_pos"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("n_mentions"), F.asc("first_pos"), F.asc("canonical_id")
    )
    return m.join(n_words, "doc_id").select(
        "doc_id",
        F.col("canonical_id").alias("entity"),
        "n_mentions",
        "first_pos",
        (F.col("first_pos") * 10 <= F.col("n_words")).cast("int").alias("is_lead"),
        F.row_number().over(w).alias("salience_rank"),
    )


def with_pmi(scored: DataFrame, lift_col: str = "lift") -> DataFrame:
    """Attach pmi = ln(lift). Kept OUT of the exact cross-engine hash gate
    (see kg_entity_pmi docstring); covered by a tolerance test instead."""
    return scored.withColumn("pmi", F.log(F.col(lift_col)))


def kg_unlinked_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gazetteer entries never mentioned (Q2 anti-join: unused entities)."""
    gaz = _gaz_df(spark)
    mentioned = (
        _tokens(spark, sf_dir)
        .join(F.broadcast(gaz), F.col("word") == gaz.surface_form)
        .select("canonical_id")
        .distinct()
    )
    return gaz.join(mentioned, "canonical_id", "left_anti").select(
        "canonical_id", "surface_form", "entity_type"
    )


def kg_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash id per doc (E11/S8: sha2 identity)."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.length("text").alias("text_len"),
    )


# ---------------------------------------------------------------------------
# relational operator coverage over the TPC-H-ish tables (SURVEY.md §2.4-2.6)
# ---------------------------------------------------------------------------


def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped hash aggregation (A1/A2: grouped counters)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_stable(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_stable(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            round_stable(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + groupBy + top-k (A4 most-called analog). Dim side broadcast."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(round_stable(F.sum("o_totalprice"), 2).alias("total_spent"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


def q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (Q2: unused entities — customers with no high-value order).

    The filter goes on the right side BEFORE the anti-join so Catalyst pushes
    it into the orders scan (PushedFilters) instead of materializing all
    orders."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join with two broadcast dims + hash agg (Q1 pattern)."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    nation = _read(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            round_stable(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number window (J2/J6 priority-dedup pattern)."""
    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


def q_distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) agg (A5 most-imported-modules analog)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join + grouped count (TPC-H Q4 shape; F4/Q1)."""
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            li.select("l_orderkey").distinct(),
            orders.o_orderkey == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events rollup (A1 counters): count + rounded mean per type."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        round_stable(F.avg("value"), 4).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_self_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with events of both types (Q3 self-join shape)."""
    ev = _read(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id").distinct()
    b = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    return a.join(b, "user_id").select("user_id")
