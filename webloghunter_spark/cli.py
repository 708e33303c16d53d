"""Command-line interface mirroring the reference's triage.py surface.

Usage:
    python -m webloghunter_spark.cli LOGPATH [LOGPATH ...] [options]

Every reference CLI flag has an equivalent here (including the
reference's dead --ignore-uripath-keyword, implemented properly), plus
engine extensions (--output parquet, --store for the partitioned
columnar store).
"""

from __future__ import annotations

import argparse
import sys

from webloghunter_spark.engine import EngineConfig, build_pipeline, query
from webloghunter_spark.functions.risk import load_shells
from webloghunter_spark.render import (
    display_projection,
    render_table,
    write_csv,
    write_parquet_store,
)
from webloghunter_spark.rules.sigma import load_rules
from webloghunter_spark.session import get_spark


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="webloghunter-spark")
    p.add_argument("paths", nargs="+", help="log files/dirs/globs (.csv = Splunk export)")
    p.add_argument("--start-time")
    p.add_argument("--end-time")
    p.add_argument("--time-offset", type=int, default=0)
    p.add_argument("--cluster-threshold", type=int, default=60)
    p.add_argument("--risk-score", type=float, default=0)
    p.add_argument("--request-count", type=int, default=0)
    p.add_argument("--status-include", type=int, nargs="*")
    p.add_argument("--status-ignore", type=int, nargs="*")
    p.add_argument("--method-include", nargs="*")
    p.add_argument("--method-ignore", nargs="*")
    p.add_argument("--uripath-keyword", nargs="*")
    p.add_argument("--ignore-uripath-keyword", nargs="*")
    p.add_argument("--ip-include", nargs="*")
    p.add_argument("--ip-ignore", nargs="*")
    p.add_argument("--useragent-keyword", nargs="*")
    p.add_argument("--ignore-useragent-keyword", nargs="*")
    p.add_argument("--referrer-keyword", nargs="*")
    p.add_argument("--ignore-referrer-keyword", nargs="*")
    p.add_argument("--cluster-include", type=int, nargs="*")
    p.add_argument("--cluster-ignore", type=int, nargs="*")
    p.add_argument("--resp-size-min", type=int)
    p.add_argument("--resp-size-max", type=int)
    p.add_argument("--all-extension", action="store_true")
    p.add_argument("--tool-focus", action="store_true")
    p.add_argument("--rules", help="Sigma-style rules YAML path")
    p.add_argument("--shells", help="webshell filename list path")
    p.add_argument("--output", choices=["table", "csv", "parquet"], default="table")
    p.add_argument("--output-path", help="csv/parquet destination")
    p.add_argument("--store", help="write the full scored table as a parquet store")
    p.add_argument("--max-rows", type=int, default=1000)
    p.add_argument("--no-color", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)
    cfg = EngineConfig(
        session_gap_seconds=args.cluster_threshold,
        time_offset=args.time_offset,
    )
    if args.rules:
        cfg.rules = load_rules(args.rules)
    if args.shells:
        cfg.shells = load_shells(args.shells)

    spark = get_spark(app_name="webloghunter-cli")
    scored, errors = build_pipeline(spark, args.paths, cfg)
    if args.store:
        write_parquet_store(scored, args.store)

    result = query(
        scored,
        start_time=args.start_time,
        end_time=args.end_time,
        risk_score=args.risk_score,
        request_count=args.request_count,
        status_include=args.status_include,
        status_ignore=args.status_ignore,
        method_include=args.method_include,
        method_ignore=args.method_ignore,
        uripath_keyword=args.uripath_keyword,
        ignore_uripath_keyword=args.ignore_uripath_keyword,
        ip_include=args.ip_include,
        ip_ignore=args.ip_ignore,
        useragent_keyword=args.useragent_keyword,
        ignore_useragent_keyword=args.ignore_useragent_keyword,
        referrer_keyword=args.referrer_keyword,
        ignore_referrer_keyword=args.ignore_referrer_keyword,
        cluster_include=args.cluster_include,
        cluster_ignore=args.cluster_ignore,
        resp_size_min=args.resp_size_min,
        resp_size_max=args.resp_size_max,
        all_extensions=args.all_extension,
        tool_focus=args.tool_focus,
    )

    n_errors = errors.count()
    if n_errors:
        print(f"[!] {n_errors} unparseable lines (errors side-channel)", file=sys.stderr)

    if args.output == "table":
        print(render_table(display_projection(result), max_rows=args.max_rows,
                           color=not args.no_color))
    elif args.output == "csv":
        if not args.output_path:
            print("--output-path required for csv", file=sys.stderr)
            return 2
        write_csv(result, args.output_path, single_file=True)
        print(f"wrote {args.output_path}")
    else:
        if not args.output_path:
            print("--output-path required for parquet", file=sys.stderr)
            return 2
        result.write.mode("overwrite").parquet(args.output_path)
        print(f"wrote {args.output_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
