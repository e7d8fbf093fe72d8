"""Raw text-file corpus ingestion — JSONL and CSV with corrupt-record
quarantine (source-format breadth for the LLM-data pipeline: web-scale text
corpora arrive as JSONL shards; operational drops arrive as CSV).

Design: read the file as PLAIN LINES (``spark.read.text`` — splittable,
trivially parallel) and parse each line JVM-side with ``from_json`` /
``from_csv`` in PERMISSIVE mode with a ``_corrupt_record`` sentinel field
appended to the parse schema.  The sentinel catches BOTH failure shapes —
an unparseable line and a line that parses but has a type-corrupt field
(PERMISSIVE alone would silently null the bad field and let the row
through).  This deliberately avoids the DataFrameReader's own
corrupt-record path, which cannot be filtered without caching the parsed
frame (Spark refuses queries that project only the internal corrupt
column; the documented workaround is ``.cache()`` — a non-starter at
100 TB).  Line-parse gives ONE narrow pass: good rows expand the parsed
struct, quarantine rows keep the verbatim raw line (replayable after a
fix) plus the source file — no cache, no second read, no shuffle.

A parsed line that violates a declared required (NOT NULL) column is
quarantined too — the schema gate at the edge, mirroring
``catalog.validate_schema``'s role for parquet.

Reference parity: the reference ingests operational rows with pandas +
manual try/except cleaning (scripts/05_etl_pipeline/etl_pipeline.py
extract helpers, which drop bad rows silently); this module is the
distributed twin with an explicit, replayable quarantine instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"


def _read_lines(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.text(path)
        .select(
            F.col("value").alias("raw_line"),
            F.input_file_name().alias("src_file"),
        )
        # blank lines are format noise (JSONL writers commonly end shards
        # with one), not corrupt data — skip, don't quarantine
        .filter(F.trim(F.col("raw_line")) != "")
    )


def _split_quarantine(
    parsed: DataFrame, schema: T.StructType, required: list[str]
) -> tuple[DataFrame, DataFrame]:
    """parsed carries (raw_line, src_file, rec struct incl. _corrupt_record)."""
    is_bad = F.col("rec").isNull() | F.col("rec")[_CORRUPT].isNotNull()
    missing_req = F.lit(False)
    for col in required:
        missing_req = missing_req | F.col("rec")[col].isNull()
    good = parsed.filter(~(is_bad | missing_req)).select(
        "src_file", *[F.col("rec")[f.name].alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(is_bad | missing_req).select(
        "src_file",
        "raw_line",
        F.when(is_bad, F.lit("malformed")).otherwise(F.lit("missing_required")).alias(
            "reason"
        ),
    )
    return good, quarantine


def _with_corrupt_sentinel(schema: T.StructType) -> T.StructType:
    if _CORRUPT in schema.fieldNames():
        raise ValueError(f"schema must not declare {_CORRUPT!r}")
    return T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus → (good, quarantine).

    good: one row per clean line, columns = schema fields + ``src_file``
    (lineage).  quarantine: verbatim raw line + src_file + reason
    (``malformed`` | ``missing_required``) — re-ingestable after repair.
    """
    parse_schema = _with_corrupt_sentinel(schema)
    lines = _read_lines(spark, path)
    parsed = lines.withColumn(
        "rec",
        F.from_json(
            "raw_line",
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ),
    )
    return _split_quarantine(parsed, schema, required or [])


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: list[str] | None = None,
    header: bool = False,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of ``read_jsonl_corpus`` — same line-parse + quarantine
    contract via ``from_csv``.  With ``header=True`` the FIRST PHYSICAL
    LINE of each file is dropped (a header line would otherwise quarantine
    as malformed in every shard).  Positional, not textual: matching the
    header by text would silently swallow any legitimate data row that
    happens to equal the joined field names, while missing a real header
    written with different spacing/case/quoting (which, under an all-string
    schema, would then parse fine and ingest as data).

    The first line is located without giving up splittable reads: the task
    reading byte offset 0 of a file owns its first line (Hadoop line-reader
    contract — every later split skips its leading partial line), so
    ``min(monotonically_increasing_id)`` over that file's offset-0 rows
    pins it; the drop is a broadcast anti-condition on (file, id) over ONE
    checkpointed materialization of the tagged scan (the ids are
    nondeterministic across re-executions, so both consumers must read the
    same physical pass)."""
    parse_schema = _with_corrupt_sentinel(schema)
    lines = _read_lines(spark, path)
    if header:
        # localCheckpoint (eager) BEFORE deriving first_per_file:
        # monotonically_increasing_id is documented nondeterministic across
        # re-executions, and the agg subtree and the probe subtree below
        # would otherwise run the scan twice — any partition-layout
        # divergence between the two runs (config change, listing order,
        # AQE) silently re-admits the header or drops a real data row.
        # Same recompute hazard the prefix-sum operators pin
        # (operators/curation.budget_select); one materialized pass feeds
        # both subtrees.
        tagged = (
            lines.withColumn("_bs", F.input_file_block_start())
            .withColumn("_mid", F.monotonically_increasing_id())
            .localCheckpoint(eager=True)
        )
        first_per_file = (
            tagged.filter(F.col("_bs") == 0)
            .groupBy("src_file")
            .agg(F.min("_mid").alias("_header_id"))
        )
        lines = (
            tagged.join(F.broadcast(first_per_file), "src_file", "left")
            .filter(F.col("_mid") != F.col("_header_id"))
            .select("raw_line", "src_file")
        )
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in parse_schema.fields
    )
    parsed = lines.withColumn(
        "rec",
        F.from_csv(
            "raw_line",
            ddl,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT, "sep": sep},
        ),
    )
    return _split_quarantine(parsed, schema, required or [])


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Export as JSON-lines shards (the interchange format training loaders
    consume) — ``to_json`` runs JVM-side; one file per partition, so the
    writer inherits the frame's partitioning (repartition upstream to pick
    shard count, as write_shards does for parquet)."""
    df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.mode(mode).text(
        path
    )
