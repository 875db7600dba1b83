"""The star-schema ETL pipeline, generalized from the reference.

Reference parity (SURVEY.md §3): two JSON sources → five tables —
dims ``songs``, ``artists``, ``users``, ``time`` and fact ``songplays`` —
written as (partitioned) Parquet. Same semantics, different dataflow:

- the reference scans each JSON source once per output table (song data
  twice, log data three times — SURVEY.md §4 'redundant scan
  elimination'); we cache the filtered scan prefix once per phase.
- the reference's users dedup is a theta-join + manual anti-join
  (etl.py:104-116); we use the single-shuffle window form
  (operators.relational.dedup_prefer) with identical output.
- the fact table's partition year uses calendar ``year()``, not the
  reference's week-year ``date_format('YYYY')`` bug (documented deviation,
  SURVEY.md §2.5 F7).
- phase 2 still consumes phase 1's *written* tables, preserving the
  reference's materialization-barrier design (tables as the interface
  between stages — reference etl.py:141-146, README.md:47-50's
  fault-tolerance story).

Output schema per table: SURVEY.md §1.2.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from projectdatalake_spark import schemas
from projectdatalake_spark.functions.scalar import epoch_millis_to_ts, weekday_name
from projectdatalake_spark.operators.relational import dedup_prefer, dedup_rows, rename
from projectdatalake_spark.sources.readers import read_json
from projectdatalake_spark.sources.writers import write_parquet, write_partitioned


def build_songs_dim(song_df: DataFrame) -> DataFrame:
    """songs(song_id, title, artist_id, year, duration) — reference etl.py:46."""
    return song_df.select("song_id", "title", "artist_id", "year", "duration")


def build_artists_dim(song_df: DataFrame) -> DataFrame:
    """artists(artist_id, name, location, latitude, longitude), full-row
    dedup — reference etl.py:56-61."""
    return dedup_rows(
        rename(
            song_df,
            {
                "artist_id": "artist_id",
                "artist_name": "name",
                "artist_location": "location",
                "artist_latitude": "latitude",
                "artist_longitude": "longitude",
            },
        )
    )


def build_users_dim(plays: DataFrame) -> DataFrame:
    """users(user_id, first_name, last_name, gender, level) with the
    paid-over-free conditional dedup — reference etl.py:96-116 semantics
    via the single-shuffle window form (SURVEY.md §2.3 note)."""
    users = dedup_rows(
        rename(
            plays,
            {
                "userId": "user_id",
                "firstName": "first_name",
                "lastName": "last_name",
                "gender": "gender",
                "level": "level",
            },
        )
    )
    return dedup_prefer(users, ["user_id"], F.col("level") == "paid")


def build_time_dim(plays: DataFrame) -> DataFrame:
    """time(start_time, hour, day, week, month, year, weekday) distinct —
    reference etl.py:124-132."""
    ts = F.col("start_time")
    return dedup_rows(
        plays.select(F.col("ts").alias("start_time")).select(
            "start_time",
            F.hour(ts).alias("hour"),
            F.dayofmonth(ts).alias("day"),
            F.weekofyear(ts).alias("week"),
            F.month(ts).alias("month"),
            F.year(ts).alias("year"),
            weekday_name(ts).alias("weekday"),
        )
    )


def build_songplays_fact(
    plays: DataFrame, songs: DataFrame, artists: DataFrame
) -> DataFrame:
    """songplays fact: enrich events with (song_id, artist_id) by
    (title, artist-name) left join — reference etl.py:141-168.

    The song⋈artist lookup is dimension-sized → broadcast; unmatched plays
    keep null FKs (soft foreign keys, SURVEY.md §1.2). songplay_id is a
    deterministic row_number over a stable ordering rather than
    monotonically_increasing_id (F9 nondeterminism, SURVEY.md §2.5).
    """
    lookup = (
        songs.select("song_id", "title", "artist_id")
        .join(
            artists.select(F.col("artist_id").alias("artist_id_r"), "name"),
            F.col("artist_id") == F.col("artist_id_r"),
        )
        .select("song_id", "title", "artist_id", "name")
    )
    enriched = plays.join(
        F.broadcast(lookup),
        (plays["song"] == lookup["title"]) & (plays["artist"] == lookup["name"]),
        "left",
    ).select(
        F.col("ts").alias("start_time"),
        F.col("userId").alias("user_id"),
        "level",
        "song_id",
        "artist_id",
        F.col("sessionId").alias("session_id"),
        "location",
        F.col("userAgent").alias("user_agent"),
    )
    # Deterministic surrogate id without a global-window single-partition
    # bottleneck: per-(year,month)-group numbering + broadcast cumulative
    # offsets (operators.relational.deterministic_id). The reference's
    # monotonically_increasing_id is distributed but run-nondeterministic
    # (SURVEY.md §2.5 F9).
    from projectdatalake_spark.operators.relational import deterministic_id

    keyed = enriched.withColumn("__y", F.year("start_time")).withColumn(
        "__m", F.month("start_time")
    )
    with_id = deterministic_id(
        keyed,
        ["__y", "__m"],
        ["start_time", "user_id", "session_id"],
        out="songplay_id",
    ).withColumn("songplay_id", F.col("songplay_id").cast("int"))
    return with_id.drop("__y", "__m").select(
        "songplay_id",
        "start_time",
        "user_id",
        "level",
        "song_id",
        "artist_id",
        "session_id",
        "location",
        "user_agent",
        F.year("start_time").alias("year"),
        F.month("start_time").alias("month"),
    )


def process_song_data(spark: SparkSession, song_glob: str, out_dir: str) -> None:
    """Phase 1 (reference etl.py:28-66): one cached scan, two table writes."""
    raw = read_json(spark, song_glob, schemas.SONG_DATA, multiline=True).cache()
    try:
        write_partitioned(
            build_songs_dim(raw), os.path.join(out_dir, "songs"), ["year", "artist_id"]
        )
        write_parquet(build_artists_dim(raw), os.path.join(out_dir, "artists"))
    finally:
        raw.unpersist()


def process_log_data(spark: SparkSession, log_glob: str, out_dir: str) -> None:
    """Phase 2 (reference etl.py:69-174): filtered+cached log scan feeds
    users, time and songplays; song/artist dims re-read from phase 1's
    parquet (materialization barrier, reference etl.py:141-146)."""
    raw = read_json(spark, log_glob, schemas.LOG_DATA)
    plays = (
        raw.filter(F.col("page") == "NextSong")
        .withColumn("ts", epoch_millis_to_ts(F.col("ts")))
        .cache()
    )
    try:
        write_parquet(build_users_dim(plays), os.path.join(out_dir, "users"))
        write_partitioned(
            build_time_dim(plays), os.path.join(out_dir, "time"), ["year", "month"]
        )
        songs = spark.read.parquet(os.path.join(out_dir, "songs"))
        artists = spark.read.parquet(os.path.join(out_dir, "artists"))
        write_partitioned(
            build_songplays_fact(plays, songs, artists),
            os.path.join(out_dir, "songplays"),
            ["year", "month"],
        )
    finally:
        plays.unpersist()


def run_pipeline(spark: SparkSession, song_glob: str, log_glob: str, out_dir: str) -> None:
    """The full two-phase DAG (reference etl.py:177-188)."""
    process_song_data(spark, song_glob, out_dir)
    process_log_data(spark, log_glob, out_dir)
