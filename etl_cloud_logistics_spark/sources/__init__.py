"""Sources & sinks (SURVEY.md §2.1).

The reference's IO surface — Snowflake ``write_pandas`` bulk loads (S4),
JSON→VARIANT staging (S5), the date-partitioned S3 lake (S7), DynamoDB
point upserts (S8) — re-expressed as native Spark readers/writers.
"""

from .lake import read_lake, write_partitioned_lake
from .staging import read_json_staging, write_json_staging
from .upsert import foreach_batch_upsert, upsert_parquet

__all__ = [
    "write_partitioned_lake",
    "read_lake",
    "write_json_staging",
    "read_json_staging",
    "upsert_parquet",
    "foreach_batch_upsert",
]
