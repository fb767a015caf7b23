"""T1/T2 streaming registrations with batch-equivalent SQL oracles.

The streaming queries execute (availableNow → memory sink) inside the
builder and return the materialized result, so the driver's harness
compares real streaming output against batch SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import stream_dedup_keys, stream_tumbling_agg
from .registry import query


@query(
    "stream_tumbling_agg",
    oracle="""
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + to_seconds(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming 10-min tumbling windows ≡ batch GROUP BY
    on the epoch-aligned window start."""
    return stream_tumbling_agg(spark, sf_dir)


@query(
    "stream_dedup_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates ≡ batch DISTINCT on the key columns."""
    return stream_dedup_keys(spark, sf_dir)
