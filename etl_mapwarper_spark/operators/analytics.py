"""Event-analytics operators: funnel conversion and cohort retention.

The product-analytics query family over the ``events`` stream table —
distinct from the windowed rollups in ``relational.py`` (q20/q21)
because both need a per-entity anchor timestamp (first click, first
activity) correlated against the entity's other events. The scalable
shape for that correlation is ONE shuffle on the entity key: compute
the anchor with a partition-window (or carry it through the same
aggregation), never a fact-to-fact self-join — at 100 TB the
anchor-join alternative shuffles the fact twice and joins it against
itself.

Conventions as in ``relational.py``: every column aliased identically
in Spark and oracle SQL; timestamps are µs-truncated on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table

QUERIES = {}
ORACLE = {}


def _register(name, fn, sql=None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


# ---------------------------------------------------------------------------
# q53 — click→purchase funnel. Per user: first click, first purchase AT
# OR AFTER that click, and whether conversion happened within 1 hour.
# The anchor (first click) is a conditional window-min over the user
# partition; the conditional aggregate then filters purchases against
# it row-wise. One shuffle total (window + same-key groupBy collapse
# into a single exchange); no self-join of events against events.
# ---------------------------------------------------------------------------


def q53_click_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    with_fc = ev.withColumn(
        "fc",
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    ).filter(F.col("fc").isNotNull())
    per_user = with_fc.groupBy("user_id").agg(
        F.max("fc").alias("first_click"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("fc")),
                F.col("ts"),
            )
        ).alias("first_purchase_after"),
    )
    return per_user.withColumn(
        "converted_1h",
        F.coalesce(
            F.col("first_purchase_after")
            <= F.col("first_click") + F.expr("INTERVAL 1 HOUR"),
            F.lit(False),
        ),
    )


_register(
    "q53_click_purchase_funnel",
    q53_click_purchase_funnel,
    """
    WITH fc AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'click') AS first_click
      FROM events GROUP BY 1
    )
    SELECT f.user_id,
           f.first_click,
           min(e.ts) FILTER (
             WHERE e.event_type = 'purchase' AND e.ts >= f.first_click
           ) AS first_purchase_after,
           coalesce(min(e.ts) FILTER (
             WHERE e.event_type = 'purchase' AND e.ts >= f.first_click
           ) <= f.first_click + INTERVAL 1 HOUR, false) AS converted_1h
    FROM fc f JOIN events e USING (user_id)
    WHERE f.first_click IS NOT NULL
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# q54 — cohort retention. Cohort = week of the user's first event
# (both engines truncate weeks to Monday); each event then lands in
# (cohort_week, weeks_since) and the cell value is distinct active
# users. Same single-shuffle anchor pattern: the cohort week is a
# window-min over the user partition, so the fact is scanned once and
# shuffled once on user_id before the small (weeks × weeks)
# distinct-count aggregate. weeks_since divides the day gap between
# truncated weeks — exact, since both ends are week-aligned.
# ---------------------------------------------------------------------------


def q54_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    cohorted = ev.withColumn(
        "cohort_week", F.date_trunc("week", F.min("ts").over(w))
    ).withColumn(
        "weeks_since",
        (
            F.datediff(
                F.date_trunc("week", F.col("ts")).cast("date"),
                F.col("cohort_week").cast("date"),
            )
            / 7
        ).cast("int"),
    )
    return cohorted.groupBy("cohort_week", "weeks_since").agg(
        F.count_distinct("user_id").alias("active_users")
    )


_register(
    "q54_cohort_retention",
    q54_cohort_retention,
    """
    WITH fu AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    )
    SELECT f.cohort_week,
           (datediff('day', f.cohort_week::DATE,
                     date_trunc('week', e.ts)::DATE) / 7)::INT AS weeks_since,
           count(DISTINCT e.user_id) AS active_users
    FROM fu f JOIN events e USING (user_id)
    GROUP BY 1, 2
    """,
)
