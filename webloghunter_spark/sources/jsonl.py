"""JSONL document ingestion with a parse-failure side channel.

Training corpora ship as JSON-lines far more often than parquet; the
ingestion step needs the same discipline as the log scanner
(sources/logparse.py): never drop a malformed line silently — route it
to an errors frame the pipeline can count, sample, and alert on.

Built on `spark.read.text` + `from_json` rather than
`spark.read.json`'s PERMISSIVE/_corrupt_record machinery: referencing
the corrupt-record column requires caching the frame (a documented
Spark limitation), while the text+from_json form gives the same
split — parsed struct NULL = bad line — as one codegen projection
with no caching requirement and no schema-inference pass over 100 TB
(the schema is explicit, always).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    id_field: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """(docs, errors): docs = one row per well-formed line (fields from
    `schema`, plus `source_file`); errors = (source_file, raw) for
    every non-blank line that failed to parse OR parsed without the
    required `id_field` (a JSON object with no id is not a document).
    Blank lines are skipped, matching the log scanner's comment/blank
    rule. One text scan, one codegen projection — the split is a
    filter, not a second pass."""
    raw = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("source_file"),
            F.col("value").alias("raw"),
        )
        .filter(F.length(F.trim(F.col("raw"))) > 0)
    )
    parsed = raw.select(
        "source_file", "raw", F.from_json("raw", schema).alias("_j")
    )
    ok_pred = F.col("_j").isNotNull() & F.col(f"_j.{id_field}").isNotNull()
    docs = parsed.filter(ok_pred).select("_j.*", "source_file")
    errors = parsed.filter(~ok_pred).select("source_file", "raw")
    return docs, errors


def write_jsonl_documents(df: DataFrame, path: str, mode: str = "error") -> None:
    """JSONL writer twin (one object per line, Spark's json sink —
    partitioned files, no driver funnel)."""
    df.write.mode(mode).json(path)
