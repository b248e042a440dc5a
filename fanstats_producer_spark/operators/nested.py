"""Deep nested-struct navigation (SURVEY.md §1.2: the tweet record's
struct-of-arrays-of-structs shape — entities.hashtags[{start,end,tag}],
context_annotations[{domain{...}, entity{...}}]).

The fixtures are flat, so q44 first *builds* a tweet-shaped nested
record from events (struct with a metrics struct and an array of tag
structs), then queries through it: dotted-path access, array-of-struct
field extraction, explode, and re-aggregation — the exact access
patterns Athena users run over the reference's landed JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query


def events_as_tweets(events: DataFrame) -> DataFrame:
    """events → tweet-shaped nested records (deterministic synthesis)."""
    return events.select(
        F.col("event_id").alias("id"),
        F.struct(
            F.col("value").alias("like_count"),
            (F.col("event_id") % 7).alias("retweet_count"),
        ).alias("public_metrics"),
        F.struct(
            F.array(
                F.struct(
                    F.lit(0).alias("start"),
                    F.col("event_type").alias("tag"),
                ),
                F.struct(
                    F.lit(1).alias("start"),
                    F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("tag"),
                ),
            ).alias("hashtags")
        ).alias("entities"),
    )


@query(
    "q44_nested",
    oracle="""
    -- mirror of the synthesized nested record, queried flat
    SELECT tag,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_likes,
           CAST(SUM(event_id % 7) AS BIGINT) AS sum_retweets
    FROM (
      SELECT event_id, value, event_type AS tag FROM events
      UNION ALL
      SELECT event_id, value, 'u' || CAST(user_id AS VARCHAR) AS tag FROM events)
    GROUP BY 1
    """,
)
def q44_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode entities.hashtags.tag and roll up the nested metrics —
    the canonical 'top hashtags by engagement' analytic over the
    reference's record shape."""
    tweets = events_as_tweets(load(spark, sf_dir, "events"))
    return (
        tweets.select(
            F.explode(F.col("entities.hashtags.tag")).alias("tag"),
            F.col("public_metrics.like_count").alias("likes"),
            F.col("public_metrics.retweet_count").alias("retweets"),
        )
        .groupBy("tag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("likes").cast("decimal(18,6)")).cast("double").alias("sum_likes"),
            F.sum("retweets").cast("bigint").alias("sum_retweets"),
        )
    )
