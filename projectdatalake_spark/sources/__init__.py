"""Sources & sinks: scans S1-S3, sinks S4-S5, connectors S6 (SURVEY.md §2.1)."""

from projectdatalake_spark.sources.readers import (  # noqa: F401
    load_table,
    normalize_events,
    read_json,
    read_parquet,
    table_path,
)
from projectdatalake_spark.sources.writers import (  # noqa: F401
    write_parquet,
    write_partitioned,
)
