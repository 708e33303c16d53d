"""`spark.read.format("weblog")` — a Python DataSource packaging of the
multi-format access-log reader (PySpark 4 DataSource API).

This is the COMPATIBILITY surface: one InputPartition per file, rows
parsed by the same format table as the native path (sources/logparse),
so `spark.read.format("weblog").load("/var/log/httpd")` works anywhere
a format string is expected (including readStream-style tooling that
composes sources by name).

The FAST path for bulk ingestion remains `read_access_logs` — a fully
JVM-side regex projection with whole-stage codegen; this source runs
Python per partition (still streaming per file, never materializing a
file in memory). Same schema, same parse semantics, same defaults
(parser.py:143-153 parity), plus the grep-prefix/trailing-junk/comment
handling (parser.py:112-134).

Unparseable lines are surfaced in-band with parse_ok=false and the raw
line in `raw` (a DataSource cannot return two frames; filter on
parse_ok to split entries from the errors side-channel).
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from webloghunter_spark.sources.logparse import (
    GREP_PREFIX_RE,
    LOG_FORMATS,
    TRAILING_JUNK_RE,
)

WEBLOG_SCHEMA = (
    "ip string, timestamp string, method string, request_uri string, "
    "status int, resp_size bigint, referrer string, user_agent string, "
    "extra string, time_taken int, log_format string, source string, "
    "ordinal bigint, parse_ok boolean, raw string"
)

_COMPILED = [
    (name, re.compile(pattern), groups) for name, pattern, groups in LOG_FORMATS
]
_GREP_RE = re.compile(GREP_PREFIX_RE)
_JUNK_RE = re.compile(TRAILING_JUNK_RE)


def _parse_line(line: str):
    stripped = _GREP_RE.sub("", line)
    line = (stripped if stripped else line).strip()
    line = _JUNK_RE.sub(r"\1", line)
    if not line or line.startswith("#"):
        return None
    for name, rx, groups in _COMPILED:
        m = rx.match(line)
        if not m:
            continue
        g = {f: m.group(i) for f, i in groups.items()}
        status_raw = g.get("status")
        resp_raw = g.get("resp_size")
        return (
            g.get("ip") or "",
            g.get("timestamp") or "",
            g.get("method") or "INVALID",
            g.get("request_uri") or "",
            int(status_raw) if status_raw and status_raw.isdigit() else 0,
            int(resp_raw) if resp_raw and resp_raw.isdigit() else 0,
            g.get("referrer") or "-",
            g.get("user_agent") or "-",
            g.get("extra") or "",
            int(g["time_taken"]) if g.get("time_taken", "").isdigit() else 0,
            name,
        )
    return False  # non-skippable, matched no format


class _FilePartition(InputPartition):
    def __init__(self, path: str, index: int):
        self.path = path
        self.index = index


class WeblogReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("weblog source requires a path")
        self.paths = self._expand(path)

    @staticmethod
    def _expand(path: str) -> list[str]:
        import glob as _glob

        if os.path.isdir(path):
            return sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if os.path.isfile(os.path.join(path, f))
            )
        matches = sorted(_glob.glob(path))
        return matches or [path]

    def partitions(self) -> Sequence[InputPartition]:
        # One partition per file: line ordinals stay file-local and the
        # cluster parallelizes across files (the dominant axis for logs).
        return [_FilePartition(p, i) for i, p in enumerate(self.paths)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        source = os.path.basename(partition.path)
        # File-local ordinal offset by partition index in the high bits
        # keeps (source, ordinal) globally ordered per file without
        # cross-partition coordination (same idea as
        # monotonically_increasing_id).
        base = partition.index << 40
        with open(partition.path, "rb") as fp:
            for lineno, bline in enumerate(fp):
                line = bline.decode("utf-8", "replace").rstrip("\r\n")
                parsed = _parse_line(line)
                if parsed is None:
                    continue
                ordinal = base + lineno
                if parsed is False:
                    yield ("", "", "INVALID", "", 0, 0, "-", "-", "", 0,
                           "", source, ordinal, False, line)
                else:
                    yield (*parsed, source, ordinal, True, "")


class WeblogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weblog"

    def schema(self) -> str:
        return WEBLOG_SCHEMA

    def reader(self, schema) -> WeblogReader:
        return WeblogReader(self.options)


def register_weblog_source(spark) -> None:
    """Idempotent registration of the `weblog` format."""
    spark.dataSource.register(WeblogDataSource)
