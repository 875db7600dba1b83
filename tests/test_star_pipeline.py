"""End-to-end star-schema pipeline test (SURVEY.md §5.2-5.3).

Synthesizes reference-shaped song/log fixtures (FIXTURES.md Part B) with
every edge case the reference semantics demand, runs the full two-phase
pipeline, and verifies each output table — users via an independent DuckDB
oracle for the paid-over-free dedup.
"""

from __future__ import annotations

import json

import duckdb
import pytest
from pyspark.sql import functions as F

from projectdatalake_spark.pipelines import star_schema as P

N_SONGS = 40


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("star")
    song_dir = root / "song_data"
    log_dir = root / "log_data"
    song_dir.mkdir()
    log_dir.mkdir()

    # --- songs: one JSON object per file (reference etl.py:37) ---
    for i in range(N_SONGS):
        artist = i % 10
        (song_dir / f"song{i}.json").write_text(
            json.dumps(
                {
                    "song_id": f"S{i:03d}",
                    "title": f"Title {i}",
                    "artist_id": f"A{artist:02d}",
                    "year": 2000 + (i % 20),
                    "duration": 180.5 + i,
                    "artist_name": f"Artist {artist}",
                    "artist_location": f"City {artist}",
                    "artist_latitude": 10.0 + artist,
                    "artist_longitude": -20.0 - artist,
                }
            )
        )

    # --- logs: JSON lines (reference etl.py:78) with edge cases ---
    logs = []
    base_ms = 1704067200000  # 2024-01-01 UTC

    def log(i, user, level, song_idx=None, page="NextSong", ts=None, name=None):
        return {
            "page": page,
            # non-zero millisecond fraction (F1 precision edge)
            "ts": ts if ts is not None else base_ms + i * 60_000 + 123,
            "userId": str(user),
            "firstName": name or f"First{user}",
            "lastName": f"Last{user}",
            "gender": "F" if user % 2 else "M",
            "level": level,
            # half the events match no song → null FKs (etl.py:152-155)
            "song": f"Title {song_idx}" if song_idx is not None else f"Unknown {i}",
            "artist": f"Artist {song_idx % 10}" if song_idx is not None else "Nobody",
            "sessionId": 1000 + i // 5,
            "location": f"Loc{user % 3}",
            "userAgent": "agent/1.0",
        }

    i = 0
    for user in range(12):
        for j in range(8):
            level = "paid" if (user % 3 == 0 and j >= 4) else "free"
            logs.append(log(i, user, level, song_idx=i % N_SONGS if i % 2 == 0 else None))
            i += 1
    # user 50: two distinct name rows at the SAME level — both must survive
    logs.append(log(i, 50, "free", name="Alice")); i += 1
    logs.append(log(i, 50, "free", name="Alicia")); i += 1
    # non-NextSong pages must be filtered out
    logs.append(log(i, 1, "free", page="Home")); i += 1
    # year-boundary timestamp (Dec 30) — week-year vs calendar-year edge (F7)
    logs.append(log(i, 2, "free", ts=1703894400123)); i += 1

    (log_dir / "events.json").write_text("\n".join(json.dumps(r) for r in logs))
    out = root / "warehouse"
    return str(song_dir / "*.json"), str(log_dir / "*.json"), str(out)


def test_pipeline_end_to_end(spark, fixture_dirs):
    song_glob, log_glob, out = fixture_dirs
    P.run_pipeline(spark, song_glob, log_glob, out)

    songs = spark.read.parquet(f"{out}/songs")
    artists = spark.read.parquet(f"{out}/artists")
    users = spark.read.parquet(f"{out}/users")
    time = spark.read.parquet(f"{out}/time")
    fact = spark.read.parquet(f"{out}/songplays")

    # songs: all rows, partition cols survive the round trip
    assert songs.count() == N_SONGS
    assert {"song_id", "title", "artist_id", "year", "duration"} == set(songs.columns)

    # artists: 10 distinct after full-row dedup of 40 source rows
    assert artists.count() == 10

    # users oracle: reference paid-over-free semantics via independent SQL
    con = duckdb.connect()
    users_pd = users.toPandas()
    con.register("users_out", users_pd)
    plays = spark.read.json(log_glob).filter(F.col("page") == "NextSong")
    con.register(
        "raw",
        plays.select(
            F.col("userId").alias("user_id"),
            F.col("firstName").alias("first_name"),
            F.col("lastName").alias("last_name"),
            "gender",
            "level",
        ).toPandas(),
    )
    expected = con.execute(
        """
        WITH u AS (SELECT DISTINCT * FROM raw)
        SELECT * FROM u
        WHERE level = 'paid'
           OR user_id NOT IN (SELECT user_id FROM u WHERE level = 'paid')
        """
    ).fetchall()
    got = con.execute("SELECT * FROM users_out").fetchall()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
    # the same-level duplicate-name user keeps both rows
    assert users.filter("user_id = '50'").count() == 2

    # time: distinct timestamps with fractional millis preserved
    row = time.filter(F.col("start_time").isNotNull()).first()
    assert row.start_time.microsecond == 123000
    # Dec-30 row: calendar year (2023), not week-year (2024) — F7 deviation
    dec = time.filter(F.month("start_time") == 12).collect()
    assert dec and all(r.year == 2023 for r in dec)

    # fact: every NextSong event lands exactly once; null FKs preserved
    assert fact.count() == plays.count()
    assert fact.filter(F.col("song_id").isNull()).count() > 0
    assert fact.filter(F.col("song_id").isNotNull()).count() > 0
    # songplay_id unique
    assert fact.select("songplay_id").distinct().count() == fact.count()
    # partition columns match calendar parts of start_time
    bad = fact.filter(
        (F.year("start_time") != F.col("year")) | (F.month("start_time") != F.col("month"))
    )
    assert bad.count() == 0
