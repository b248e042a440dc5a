"""P-layer tests (SURVEY.md §2A): tweet NDJSON ingest, source predicates,
pagination/cap semantics, partition layout, config version gates.

Fixture requirements from FIXTURES.md §B: ≥2 topics × ≥3 days, rows each
predicate removes, missing entities, an overflow set for the cap, and
versioned YAML configs incl. unsupported variants.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from fanstats_producer_spark.sources import config as cfg
from fanstats_producer_spark.sources.ndjson import (
    TWEET_SCHEMA,
    default_source_filters,
    read_tweets,
    with_partition_columns,
    write_partitioned,
)
from fanstats_producer_spark.sources.rest import PaginatedSource


def _tweet(i: int, day: int, lang="en", rt=False, hashtags=None, topic="NBA"):
    t = {
        "id": str(i),
        "text": ("RT @x " if rt else "") + f"game tonight {topic} #{i}",
        "created_at": f"2024-01-{day:02d}T12:00:{i % 60:02d}.000Z",
        "lang": lang,
        "public_metrics": {
            "retweet_count": i % 7,
            "reply_count": i % 5,
            "like_count": i * 3 % 100,
            "quote_count": i % 3,
        },
    }
    if hashtags is not None:
        t["entities"] = {"hashtags": [{"start": 0, "end": 5, "tag": h} for h in hashtags]}
    t["context_annotations"] = [
        {
            "domain": {"id": "46", "name": "Brand", "description": "d"},
            "entity": {"id": str(i), "name": topic, "description": "d"},
        }
    ]
    return t


@pytest.fixture(scope="module")
def landing_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("landing")
    rows = []
    for i in range(30):
        day = 10 + (i % 3)
        topic = "NBA" if i % 2 == 0 else "NFL"
        rows.append(_tweet(i, day, topic=topic))
    rows.append(_tweet(100, 10, lang="es"))  # dropped by lang:en
    rows.append(_tweet(101, 10, rt=True))  # dropped by -is:retweet
    rows.append(_tweet(102, 10, hashtags=["nbatopshot"]))  # dropped by -#nbatopshot
    rows.append(_tweet(103, 10, hashtags=["playoffs"]))  # kept
    with open(d / "batch.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(d)


def test_read_pinned_schema(spark, landing_dir):
    df = read_tweets(spark, landing_dir)
    assert df.schema == TWEET_SCHEMA
    assert df.count() == 34


def test_schema_inference_parity(spark, landing_dir):
    """Glue-crawler-style inference (main.tf:304-314) still reads every row."""
    df = read_tweets(spark, landing_dir, infer_schema=True)
    assert df.count() == 34
    assert "public_metrics" in df.columns


def test_default_source_filters(spark, landing_dir):
    df = read_tweets(spark, landing_dir)
    kept = default_source_filters(df)
    ids = {r.id for r in kept.select("id").collect()}
    assert {"100", "101", "102"}.isdisjoint(ids)
    assert "103" in ids  # non-matching hashtag not dropped
    assert kept.count() == 31  # 30 base + id 103


def test_topic_predicate(spark, landing_dir):
    df = default_source_filters(read_tweets(spark, landing_dir), topic="NBA")
    names = df.select(F.explode("context_annotations.entity.name").alias("n")).distinct()
    assert {r.n for r in names.collect()} == {"NBA"}


def test_partitioned_layout(spark, landing_dir, tmp_path):
    """Named Hive layout mirrors main.py:70-73 `Twitter/<topic>/YYYY/MM/DD`."""
    out = str(tmp_path / "lake")
    df = default_source_filters(read_tweets(spark, landing_dir))
    wrote = write_partitioned(
        with_partition_columns(df, platform="Twitter", topic="NBA"), out
    )
    assert wrote
    assert os.path.isdir(os.path.join(out, "platform=Twitter", "topic=NBA",
                                      "year=2024", "month=01", "day=10"))
    back = spark.read.json(out)
    assert back.count() == df.count()
    # partition pruning works on the named layout
    one_day = back.filter((F.col("year") == "2024") & (F.col("day") == "11"))
    assert one_day.count() == df.filter(F.col("created_at").contains("2024-01-11")).count()


def test_empty_result_guard(spark, tmp_path):
    """main.py:183-194: no data → no write, no error."""
    empty = spark.createDataFrame([], TWEET_SCHEMA)
    out = str(tmp_path / "never")
    assert not write_partitioned(
        with_partition_columns(empty, platform="Twitter", topic="NBA"), out
    )
    assert not os.path.exists(out)


# --- pagination / cap (P1/P4, main.py:122-160) --------------------------------
def _fake_fetch(pages: dict[str, list[list[dict]]]):
    def fetch(topic, start_time, next_token, page_size):
        chunks = pages[topic]
        idx = 0 if next_token is None else int(next_token)
        rows = chunks[idx][:page_size]
        nxt = str(idx + 1) if idx + 1 < len(chunks) else None
        return rows, nxt

    return fetch


def test_pagination_follows_next_token(spark):
    pages = {"NBA": [[_tweet(i, 10) for i in range(j * 10, j * 10 + 10)] for j in range(4)]}
    src = PaginatedSource(spark, _fake_fetch(pages), page_size=10, max_results=1000)
    df = src.scan(["NBA"], "2024-01-01T00:00:00Z")
    assert df.count() == 40


def test_result_cap(spark):
    pages = {"NBA": [[_tweet(i, 10) for i in range(j * 100, j * 100 + 100)] for j in range(5)]}
    src = PaginatedSource(spark, _fake_fetch(pages), max_results=250)
    assert src.scan(["NBA"], "t0").count() == 250  # stops at the cap (main.py:136)


def test_multi_topic_fanout_union(spark):
    pages = {
        "NBA": [[_tweet(i, 10, topic="NBA") for i in range(20)]],
        "NFL": [[_tweet(i, 11, topic="NFL") for i in range(30)]],
    }
    src = PaginatedSource(spark, _fake_fetch(pages))
    assert src.scan(["NBA", "NFL"], "t0").count() == 50


# --- config loading / version gates (P8/P10) -----------------------------------
def _write_yaml(path, text):
    path.write_text(text)
    return str(path)


def test_datafile_load(spark, tmp_path):
    p = _write_yaml(
        tmp_path / "nba.yaml",
        "version: 1.0\n---\nTopic: NBA\nType: League\nAliases:\n  - National Basketball Association\n",
    )
    c = cfg.load_data_file(p)
    assert (c.topic, c.type, c.partition_key) == ("NBA", "League", "NBA")
    dim = cfg.topics_dimension(spark, [c])
    assert dim.count() == 2  # topic + 1 alias


def test_team_type_requires_league(tmp_path):
    c = cfg.load_data_file(
        _write_yaml(
            tmp_path / "team.yaml",
            "version: 1.0\n---\nTopic: Lakers\nType: Team\nLeague: NBA\n",
        )
    )
    assert c.partition_key == "NBA"  # main.py:185-186
    broken = cfg.load_data_file(
        _write_yaml(tmp_path / "team2.yaml", "version: 1.0\n---\nTopic: Lakers\nType: Team\n")
    )
    with pytest.raises(ValueError, match="League"):
        _ = broken.partition_key


def test_unsupported_version_raises(tmp_path):
    """Real ValueError, not the reference's string-raise (main.py:196-200)."""
    p = _write_yaml(tmp_path / "v2.yaml", "version: 2.0\n---\nTopic: NBA\nType: League\n")
    with pytest.raises(ValueError, match="unsupported datafile version"):
        cfg.load_data_file(p)
    p2 = _write_yaml(tmp_path / "p2.yaml", "version: 9.9\n---\nPlatforms:\n  - Twitter\n")
    with pytest.raises(ValueError, match="unsupported platformfile version"):
        cfg.load_platforms(p2)


def test_platforms_load(tmp_path):
    p = _write_yaml(
        tmp_path / "platforms.yaml", "version: 1.0\n---\nPlatforms:\n  - Twitter\n"
    )
    assert cfg.load_platforms(p).platforms == ["Twitter"]


# --- multi-platform dispatch (P9, main.py:203-219) ------------------------------
def test_platform_dispatch_union(spark):
    from fanstats_producer_spark.sources.dispatch import PlatformRegistry

    reg = PlatformRegistry()
    reg.register("Twitter", lambda s: s.createDataFrame(
        [("t1", "hello")], "id string, text string"))
    reg.register("Reddit", lambda s: s.createDataFrame(
        [("r1", "world", 5)], "id string, text string, upvotes int"))
    out = reg.collect_all(spark, ["Twitter", "Reddit"])
    rows = {r.id: (r.platform, r.upvotes) for r in out.collect()}
    assert rows == {"t1": ("Twitter", None), "r1": ("Reddit", 5)}  # schema drift tolerated


def test_platform_dispatch_unsupported(spark):
    from fanstats_producer_spark.sources.dispatch import PlatformRegistry

    reg = PlatformRegistry()
    reg.register("Twitter", lambda s: s.range(1))
    with pytest.raises(ValueError, match="platform not supported: 'Facebook'"):
        reg.collect_all(spark, ["Facebook"])


def _fake_reddit(posts_per_sub: int):
    """Deterministic Reddit listing fake: pages of `kind: t3` envelopes
    with an `after` fullname cursor, plus one non-t3 child per page
    that must be skipped."""

    def fetch(subreddit, after, limit):
        start = int(after.split("_")[1]) + 1 if after else 0
        ids = range(start, min(start + limit, posts_per_sub))
        children = [
            {
                "kind": "t3",
                "data": {
                    "id": f"{subreddit}_{i}",
                    "subreddit": subreddit,
                    "title": f"post {i}",
                    "selftext": "body" if i % 2 else "",
                    "author": f"u{i % 7}",
                    "created_utc": 1700000000.0 + i,
                    "score": i,
                    "num_comments": i % 3,
                },
            }
            for i in ids
        ]
        children.append({"kind": "t1", "data": {"id": "comment-noise"}})
        last = max(ids, default=None)
        nxt = f"t3_{last}" if last is not None and last + 1 < posts_per_sub else None
        return children, nxt

    return fetch


def test_reddit_listing_pagination_and_envelope(spark):
    """P9 second platform: `after`-cursor pagination, per-request limit
    clamp, t3-envelope unwrap, epoch-seconds timestamps, result cap."""
    from fanstats_producer_spark.sources.reddit import RedditListingSource

    src = RedditListingSource(spark, _fake_reddit(250), limit=500, max_posts=220)
    assert src.limit == 100  # clamped to Reddit's per-request max
    out = src.scan(["nba"]).collect()
    assert len(out) == 220  # cap enforced mid-listing (3 pages fetched)
    ids = [r.post_id for r in out]
    assert ids[0] == "nba_0" and ids[-1] == "nba_219"  # cursor chain in order
    assert all(r.created_utc == 1700000000.0 + i for i, r in enumerate(out))
    assert not any("comment" in r.post_id for r in out)  # non-t3 skipped


def test_reddit_listing_liveness_and_row_tolerance(spark):
    """A server that keeps handing back a cursor over pages with no
    usable rows (or a repeating cursor) must terminate the scan, and a
    malformed numeric field nulls/zeroes that field instead of killing
    the whole listing."""
    from fanstats_producer_spark.sources.reddit import RedditListingSource

    calls = {"n": 0}

    def hostile(subreddit, after, limit):
        calls["n"] += 1
        # page 1: one good row + one row with garbage numerics;
        # afterwards: endless non-t3 noise with a live cursor
        if after is None:
            return (
                [
                    {"kind": "t3", "data": {
                        "id": "ok", "created_utc": 1700000000.0, "score": 3}},
                    {"kind": "t3", "data": {
                        "id": "bad", "created_utc": "not-a-number",
                        "score": "NaNish", "num_comments": None}},
                ],
                "t3_cursor",
            )
        return [{"kind": "t1", "data": {"id": "noise"}}], "t3_cursor"

    src = RedditListingSource(spark, hostile, max_posts=50)
    out = {r.post_id: r for r in src.scan(["nba"]).collect()}
    assert calls["n"] <= 3  # zero-progress page broke the loop
    assert set(out) == {"ok", "bad"}
    assert out["bad"].created_utc is None and out["bad"].score == 0
    assert out["ok"].created_utc == 1700000000.0 and out["ok"].score == 3

    # repeated-cursor variant: pages always add a row but the cursor
    # never advances — the seen-cursor guard must stop the chain
    def repeater(subreddit, after, limit):
        return (
            [{"kind": "t3", "data": {"id": f"r{len(after or '')}"}}],
            "t3_same",
        )

    out2 = RedditListingSource(spark, repeater, max_posts=50).scan(["nba"])
    assert out2.count() <= 2


def test_reddit_collector_unions_with_twitter(spark):
    """The normalized Reddit collector dispatches through
    PlatformRegistry next to a Twitter-shaped collector: column names
    align on id/text/created_at/author_id, platform-specific columns
    null-fill across, and created_at is RFC-3339 like the Twitter arm."""
    from fanstats_producer_spark.sources.dispatch import PlatformRegistry
    from fanstats_producer_spark.sources.reddit import (
        RedditListingSource,
        collector,
    )

    reg = PlatformRegistry()
    reg.register("Twitter", lambda s: s.createDataFrame(
        [("t1", "hello", "2024-01-01T00:00:00.000Z", "a9")],
        "id string, text string, created_at string, author_id string"))
    src = RedditListingSource(spark, _fake_reddit(3))
    reg.register("Reddit", collector(src, ["nba"]))
    out = reg.collect_all(spark, ["Twitter", "Reddit"])
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 4
    assert rows["t1"].platform == "Twitter" and rows["t1"].subreddit is None
    r1 = rows["nba_1"]
    assert r1.platform == "Reddit" and r1.subreddit == "nba"
    assert r1.text == "post 1\n\nbody"  # title+selftext merge
    assert rows["nba_2"].text == "post 2"  # empty selftext -> title only
    assert r1.created_at.startswith("2023-11-14T") and r1.created_at.endswith("Z")
    assert r1.author_id == "u1"


def _fake_facebook(posts_per_page: int):
    """Deterministic Graph-API feed fake: flat `data` arrays with
    nested from/reactions/comments/shares objects and an opaque
    `paging.cursors.after` token, plus one id-less stub per page that
    must be skipped."""

    def fetch(page_id, after, limit):
        start = int(after.split(":")[1]) + 1 if after else 0
        ids = range(start, min(start + limit, posts_per_page))
        data = [
            {
                "id": f"{page_id}_{i}",
                "message": f"update {i}",
                "created_time": "2024-03-05T08:30:00+0000",
                "from": {"id": f"pg{i % 4}", "name": f"Page Author {i % 4}"},
                "reactions": {"summary": {"total_count": i * 2}},
                "comments": {"summary": {"total_count": i % 5}},
                "shares": {"count": i % 3},
            }
            for i in ids
        ]
        data.append({"created_time": "2024-03-05T08:30:00+0000"})  # id-less stub
        last = max(ids, default=None)
        nxt = (
            f"cur:{last}"
            if last is not None and last + 1 < posts_per_page
            else None
        )
        return data, nxt

    return fetch


def test_facebook_feed_pagination_and_flatten(spark):
    """P9 third platform: opaque `after`-cursor pagination, per-request
    limit clamp, nested from/summary flattening, +0000-offset
    timestamps, result cap."""
    from fanstats_producer_spark.sources.facebook import FacebookFeedSource

    src = FacebookFeedSource(spark, _fake_facebook(250), limit=500, max_posts=220)
    assert src.limit == 100  # clamped to the Graph API per-request max
    out = src.scan(["espn"]).collect()
    assert len(out) == 220  # cap enforced mid-feed (3 pages fetched)
    ids = [r.post_id for r in out]
    assert ids[0] == "espn_0" and ids[-1] == "espn_219"  # cursor chain in order
    r7 = next(r for r in out if r.post_id == "espn_7")
    assert r7.author_id == "pg3" and r7.author_name == "Page Author 3"
    assert r7.reactions == 14 and r7.comments == 2 and r7.shares == 1
    assert r7.created_time == "2024-03-05T08:30:00+0000"


def test_facebook_feed_liveness_and_row_tolerance(spark):
    """Same liveness/tolerance contract as the Reddit arm: zero-
    progress and repeated cursors terminate the feed; malformed nested
    counts land as 0 instead of killing the scan."""
    from fanstats_producer_spark.sources.facebook import FacebookFeedSource

    calls = {"n": 0}

    def hostile(page_id, after, limit):
        calls["n"] += 1
        if after is None:
            return (
                [
                    {"id": "ok", "reactions": {"summary": {"total_count": 4}}},
                    {"id": "bad",
                     "reactions": {"summary": {"total_count": "many"}},
                     "shares": {"count": "viral"},
                     "from": "not-a-dict-free-pass"},
                ],
                "cur:x",
            )
        return [{"no_id": True}], "cur:x"

    src = FacebookFeedSource(spark, hostile, max_posts=50)
    out = {r.post_id: r for r in src.scan(["espn"]).collect()}
    assert calls["n"] <= 3  # zero-progress page broke the loop
    assert set(out) == {"ok", "bad"}
    assert out["bad"].reactions == 0 and out["bad"].shares == 0
    assert out["ok"].reactions == 4

    def repeater(page_id, after, limit):
        return [{"id": f"p{len(after or '')}"}], "cur:same"

    out2 = FacebookFeedSource(spark, repeater, max_posts=50).scan(["espn"])
    assert out2.count() <= 2


def test_three_platform_union(spark):
    """Architecture.png's full planned source set: Twitter + Reddit +
    Facebook collectors union by name through PlatformRegistry, each
    platform's extra columns null-filling across the others, all
    created_at values RFC-3339 Z-suffixed UTC."""
    from fanstats_producer_spark.sources.dispatch import PlatformRegistry
    from fanstats_producer_spark.sources import facebook, reddit

    reg = PlatformRegistry()
    reg.register("Twitter", lambda s: s.createDataFrame(
        [("t1", "hello", "2024-01-01T00:00:00.000Z", "a9")],
        "id string, text string, created_at string, author_id string"))
    reg.register("Reddit", reddit.collector(
        reddit.RedditListingSource(spark, _fake_reddit(2)), ["nba"]))
    reg.register("Facebook", facebook.collector(
        facebook.FacebookFeedSource(spark, _fake_facebook(2)), ["espn"]))
    out = reg.collect_all(spark, ["Twitter", "Reddit", "Facebook"])
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 5
    fb = rows["espn_1"]
    assert fb.platform == "Facebook" and fb.page == "espn"
    assert fb.text == "update 1" and fb.author_id == "pg1"
    assert fb.reactions == 2 and fb.subreddit is None
    # +0000 offset parsed as a real instant, re-rendered in UTC
    assert fb.created_at == "2024-03-05T08:30:00.000Z"
    assert rows["t1"].page is None and rows["nba_1"].shares is None


def test_corrupt_records_tolerated(spark, tmp_path):
    """PERMISSIVE ingest: malformed NDJSON lines land in _corrupt_record
    instead of failing the job (the reference appends API responses
    blindly, main.py:151-153 — garbage would poison its whole file)."""
    from pyspark.sql.types import StringType, StructField, StructType

    p = tmp_path / "mixed.json"
    p.write_text(
        '{"id": "1", "text": "good", "lang": "en"}\n'
        "this is not json at all\n"
        '{"id": "2", "text": "also good", "lang": "en"}\n'
    )
    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = spark.read.schema(schema).json(str(p)).cache()
    assert df.count() == 3
    assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert df.filter(F.col("id").isNotNull()).count() == 2
    df.unpersist()


def test_kafka_record_decode(spark):
    """decode_kafka_records: Kafka wire rows decode through TWEET_SCHEMA;
    corrupt payloads are dropped; lineage columns survive."""
    import datetime

    from fanstats_producer_spark.sources.kafka import decode_kafka_records

    tweet = json.dumps(
        {
            "id": "1",
            "text": "lakers win #nba",
            "created_at": "2024-01-01T00:00:00.000Z",
            "lang": "en",
            "public_metrics": {
                "retweet_count": 2,
                "reply_count": 0,
                "like_count": 5,
                "quote_count": 1,
            },
        }
    )
    ts = datetime.datetime(2024, 1, 1, 0, 0, 1)
    wire = spark.createDataFrame(
        [
            (b"k1", tweet.encode(), "posts", 0, 17, ts),
            (b"k2", b"{not json", "posts", 1, 3, ts),
        ],
        "key binary, value binary, topic string, partition int, offset long, timestamp timestamp",
    )
    got = decode_kafka_records(wire).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id, r.lang, r.topic, r.kafka_partition, r.kafka_offset) == (
        "1", "en", "posts", 0, 17,
    )
    assert r.public_metrics.like_count == 5

    kept = decode_kafka_records(wire, drop_undecodable=False)
    assert kept.count() == 2  # dead-letter path keeps the corrupt row


def test_kafka_decode_does_not_mutate_shared_schema(spark):
    """Calling the decoder twice must not grow TWEET_SCHEMA (StructType.add
    mutates in place; the decoder must copy)."""
    from fanstats_producer_spark.sources.kafka import decode_kafka_records
    from fanstats_producer_spark.sources.ndjson import TWEET_SCHEMA

    n_before = len(TWEET_SCHEMA.fields)
    wire = spark.createDataFrame(
        [(b"k", b"{}", "t", 0, 0, None)],
        "key binary, value binary, topic string, partition int, offset long, timestamp timestamp",
    )
    decode_kafka_records(wire).collect()
    decode_kafka_records(wire).collect()
    assert len(TWEET_SCHEMA.fields) == n_before
    assert "_corrupt_record" not in [f.name for f in TWEET_SCHEMA.fields]


def test_kafka_dead_letter_split(spark):
    """split_decoded routes corrupt payloads to a quarantine frame with
    lineage while good rows decode normally."""
    import datetime

    from fanstats_producer_spark.sources.kafka import split_decoded

    ts = datetime.datetime(2024, 1, 1)
    wire = spark.createDataFrame(
        [
            (b"k1", b'{"id": "7", "text": "ok", "lang": "en"}', "posts", 0, 1, ts),
            (b"k2", b"<binary garbage>", "posts", 2, 9, ts),
        ],
        "key binary, value binary, topic string, partition int, offset long, timestamp timestamp",
    )
    good, dead = split_decoded(wire)
    g = good.collect()
    assert [r.id for r in g] == ["7"]
    assert "_corrupt_record" not in good.columns
    d = dead.collect()
    assert len(d) == 1
    assert d[0].raw_payload == "<binary garbage>"
    assert (d[0].kafka_partition, d[0].kafka_offset) == (2, 9)
