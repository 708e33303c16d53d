"""Presentation sinks (reference K1/K2/K3 — dataframe.py:391-600,
utils/email.py).

Engine-side work (projection, emptiness aggregation, ordering) stays
distributed; only the final limited result is collected for terminal
rendering. CSV export writes distributed (`df.write.csv`) or to a
single local file for parity with the reference's one-file output.
"""

from __future__ import annotations

import csv
import io
from email.message import EmailMessage

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Risk-band ANSI colors (dataframe.py:529-541).
_BANDS = [
    (95, "\x1b[97;41m"),   # white on red
    (90, "\x1b[31m"),      # red
    (80, "\x1b[35m"),      # magenta
    (70, "\x1b[34m"),      # blue
    (60, "\x1b[36m"),      # cyan
]
_RESET = "\x1b[0m"

DISPLAY_COLS = [
    "source", "ip", "timestamp", "method_path", "status", "resp_size",
    "request_count", "cluster", "risk_score", "rule_applied", "tool",
]


def display_projection(df: DataFrame, drop_empty: bool = True) -> DataFrame:
    """P1/P2: method_path concat + drop of all-empty/zero columns
    (computed in ONE aggregate pass, dataframe.py:424-435)."""
    if "method" in df.columns and "request_uri" in df.columns:
        df = df.withColumn(
            "method_path", F.concat_ws(" ", F.col("method"), F.col("request_uri"))
        )
    cols = [c for c in DISPLAY_COLS if c in df.columns]
    out = df.select(*cols)
    if drop_empty and cols:
        checks = []
        for c in cols:
            dt = dict(out.dtypes)[c]
            if dt in ("string",):
                nonempty = (F.col(c) != "") & (F.col(c) != "-")
            elif dt in ("double", "float"):
                nonempty = F.col(c) != 0.0
            elif dt in ("int", "bigint", "smallint"):
                nonempty = F.col(c) != 0
            else:
                nonempty = F.col(c).isNotNull()
            checks.append(F.max(nonempty.cast("int")).alias(c))
        flags = out.agg(*checks).collect()[0].asDict()
        keep = [c for c in cols if flags.get(c)]
        out = out.select(*(keep or cols))
    return out


def _truncate(value: str, width: int, from_tail: bool) -> str:
    if len(value) <= width:
        return value
    return (".." + value[-(width - 2):]) if from_tail else (value[: width - 2] + "..")


def render_table(
    df: DataFrame,
    max_rows: int = 1000,
    color: bool = True,
    truncate_width: int = 60,
) -> str:
    """K1: collect a bounded result and format a fixed-width table with
    risk-band coloring. Row cap guards the driver (the reference only
    warns at 30k rows; we hard-limit and say so)."""
    pdf = df.limit(max_rows + 1).toPandas()
    truncated = len(pdf) > max_rows
    pdf = pdf.head(max_rows)
    cols = list(pdf.columns)
    rows = []
    for _, r in pdf.iterrows():
        cells = [
            _truncate(str(r[c]), truncate_width, from_tail=(c == "method_path"))
            for c in cols
        ]
        code = ""
        if color and "risk_score" in cols:
            try:
                score = float(r["risk_score"])
                for threshold, ansi in _BANDS:
                    if score >= threshold:
                        code = ansi
                        break
            except (TypeError, ValueError):
                pass
        rows.append((code, cells))
    widths = [
        max(len(c), *(len(cells[i]) for _, cells in rows)) if rows else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    lines = [sep, "| " + " | ".join(c.ljust(w) for c, w in zip(cols, widths)) + " |", sep]
    for code, cells in rows:
        body = "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"
        lines.append(f"{code}{body}{_RESET}" if code else body)
    lines.append(sep)
    if truncated:
        lines.append(f"(output truncated at {max_rows} rows)")
    return "\n".join(lines)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """K2: distributed CSV by default; single local file for reference
    parity (small filtered results only)."""
    if single_file:
        pdf = df.toPandas()
        with open(path, "w", newline="") as fp:
            pdf.to_csv(fp, index=False, quoting=csv.QUOTE_MINIMAL)
    else:
        df.write.mode("overwrite").option("header", "true").csv(path)


def write_parquet_store(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ("source",)
) -> None:
    """Normalized columnar store partitioned by source (SURVEY §4.2's
    physical layout: downstream queries prune partitions by source and
    push predicates into parquet)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def build_email(
    df: DataFrame,
    sender: str,
    recipient: str,
    subject: str = "WebLog results",
    body: str = "Attached results.",
    attachment_name: str = "results.csv",
) -> EmailMessage:
    """K3: compose (not send) the results email with CSV attachment.
    Sending is the caller's ``smtplib.SMTP(...).send_message(msg)`` —
    kept out of the engine so tests never touch the network."""
    buf = io.StringIO()
    df.toPandas().to_csv(buf, index=False)
    msg = EmailMessage()
    msg["From"], msg["To"], msg["Subject"] = sender, recipient, subject
    msg.set_content(body)
    msg.add_attachment(
        buf.getvalue().encode(), maintype="text", subtype="csv",
        filename=attachment_name,
    )
    return msg
