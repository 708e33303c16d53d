"""Sigma-style rule engine: YAML rule dicts -> Catalyst Column predicates.

Reference semantics (/root/reference/WebLogTriage/risk.py:86-187):
- each rule has a single `detection.selection` whose items AND together;
- field names may carry a `|op` modifier; bare `status`/`method`/
  `user_agent` mean list membership;
- matched rows take the rule's `tags[0].risk_score` and its title in
  `rule_applied`, but only when the rule's score is STRICTLY greater
  than the row's current score (risk.py:177) — so on ties the earlier
  rule in file order wins; rules are evaluated in file order.

Operators (risk.py:113-173):
  gte gt lte lt eq ne          — numeric compare (condition coerced float)
  contains                     — case-insensitive substring
  startswith / endswith        — case-sensitive prefix/suffix
  regex                        — case-insensitive regex search
  contains|all                 — AND of case-insensitive substrings
  in / notin                   — list membership
  cidr                         — IP within any CIDR (invalid net skipped)

The whole engine compiles to ONE projection: a chain of
``when(match & score > cur, ...)`` per rule, evaluated in a single
codegen'd pass — no per-rule scans, no shuffles.

Python `re` vs Java regex dialect drift for the `regex` op is a
documented caveat: patterns using Java-incompatible constructs should
be rewritten; the common subset behaves identically.
"""

from __future__ import annotations

import ipaddress
import re
from typing import Any

import yaml
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webloghunter_spark.errors import EngineStageError
from webloghunter_spark.functions.cidr import ip_in_cidr

BARE_LIST_FIELDS = ("status", "method", "user_agent")


def _ci_contains(col: Column, needle: str) -> Column:
    # Reference parity: pandas str.contains defaults to regex=True
    # (risk.py:132), so `contains` conditions are case-insensitive
    # REGEX searches — '.php' also matches 'xphp', 'a|b' is an
    # alternation. The Python-vs-Java regex dialect caveat from the
    # module docstring applies here too.
    return col.rlike(f"(?i){needle}")


def _numeric(cond: Any, field: str) -> float:
    try:
        return float(cond)
    except (TypeError, ValueError):
        raise EngineStageError(f"Invalid condition value for {field}: {cond}")


def compile_predicate(field: str, condition: Any) -> Column:
    """Compile one selection item to a boolean Column."""
    if "|" in field:
        name, op = field.split("|", 1)
        col = F.col(name)
        if op in ("gt", "gte", "lt", "lte", "eq", "ne"):
            v = _numeric(condition, field)
            return {
                "gte": col >= v,
                "gt": col > v,
                "lte": col <= v,
                "lt": col < v,
                "eq": col == v,
                "ne": col != v,
            }[op]
        if op == "contains":
            return _ci_contains(col, condition)
        if op == "startswith":
            return col.startswith(str(condition))
        if op == "endswith":
            return col.endswith(str(condition))
        if op == "regex":
            return col.rlike(f"(?i){condition}")
        if op == "contains|all":
            if not isinstance(condition, list):
                raise EngineStageError(
                    f"contains|all condition must be a list: {condition}"
                )
            out = F.lit(True)
            for v in condition:
                out = out & _ci_contains(col, v)
            return out
        if op == "in":
            return col.isin(condition)
        if op == "notin":
            return ~col.isin(condition)
        if op == "cidr":
            if isinstance(condition, str):
                condition = [condition]
            elif not isinstance(condition, list):
                raise EngineStageError(f"Invalid CIDR condition value: {condition}")
            # Validate: all-invalid list means no row can match.
            valid = []
            for item in condition:
                try:
                    ipaddress.ip_network(item, strict=False)
                    valid.append(item)
                except ValueError:
                    continue
            if not valid:
                return F.lit(False)
            return ip_in_cidr(name, valid)
        raise EngineStageError(f"Unsupported sigma operator: {op}")
    if field in BARE_LIST_FIELDS:
        return F.col(field).isin(condition)
    # Unknown bare field: reference silently ignores it (no-op True).
    return F.lit(True)


def compile_selection(selection: dict[str, Any]) -> Column:
    mask = F.lit(True)
    for field, condition in selection.items():
        mask = mask & compile_predicate(field, condition)
    return mask


def apply_rules(
    df: DataFrame,
    rules: list[dict],
    score_col: str = "risk_score",
    rule_col: str = "rule_applied",
) -> DataFrame:
    """Evaluate rules with highest-score-wins, file-order tiebreak.

    The reference iterates in file order applying a rule only when its
    score is strictly greater than the current one (risk.py:177). The
    end state is therefore: the matching rule with the maximum score,
    earliest in file order on ties. We compile that directly as ONE
    when-chain over rules sorted by (-score, file_position) — linear
    expression size (an iterative fold that references the running
    score inside each condition doubles the expression tree per rule
    and destroys codegen).
    """
    order = sorted(
        range(len(rules)),
        key=lambda i: (-float(rules[i]["tags"][0]["risk_score"]), i),
    )
    score: Column | None = None
    title: Column | None = None
    for i in order:
        rule = rules[i]
        mask = compile_selection(rule["detection"]["selection"])
        rscore = float(rule["tags"][0]["risk_score"])
        if score is None:
            score = F.when(mask, F.lit(rscore))
            title = F.when(mask, F.lit(rule["title"]))
        else:
            score = score.when(mask, F.lit(rscore))
            title = title.when(mask, F.lit(rule["title"]))
    if score is None:
        score, title = F.lit(0.0), F.lit("")
    else:
        score, title = score.otherwise(F.lit(0.0)), title.otherwise(F.lit(""))
    return df.withColumn(score_col, score.cast("double")).withColumn(rule_col, title)


def load_rules(path: str) -> list[dict]:
    with open(path) as fp:
        return yaml.safe_load(fp.read()) or []


def _rule(title: str, score: float, selection: dict[str, Any]) -> dict:
    return {
        "title": title,
        "detection": {"selection": selection},
        "tags": [{"risk_score": score}],
    }


# Default shipped rule set — thresholds/scores mirror the reference's
# rules.yaml:29-150 (7 active rules + status-code catch-all), expressed
# as data so no YAML file is required.
DEFAULT_RULES: list[dict] = [
    _rule(
        "Large Request Count & Server Error",
        80.0,
        {"request_count|gte": 500, "status": [500, 502, 503, 504], "resp_size|gte": 25},
    ),
    _rule(
        "Suspicious URI & OK Status",
        75.0,
        {"uri_risk|gte": 70, "status": [200, 201, 202], "resp_size|gte": 25},
    ),
    _rule(
        "Shell Command & Status Success",
        71.1,
        {"status": [200, 201, 202], "resp_size|gte": 25, "request_uri|contains": "whoami"},
    ),
    _rule(
        "Moderately suspicious URI & Server Error",
        68.0,
        {"resp_size|gte": 25, "uri_risk|gte": 40, "status": [500, 502, 503, 504]},
    ),
    _rule("Suspicious Referrer", 67.5, {"referrer|contains": "fofa.info"}),
    _rule(
        "Repeating Requests & Server Error",
        42.0,
        {
            "resp_size|gte": 25,
            "request_count|gte": 200,
            "request_count|lt": 500,
            "status": [500, 502, 503, 504],
        },
    ),
    _rule(
        "Repeating POST Requests Status OK or Forbidden",
        41.0,
        {
            "request_count|gte": 200,
            "resp_size|gte": 25,
            "status": [200, 201, 202, 403],
            "method": ["POST"],
        },
    ),
    _rule("Status Code Risk", 40.0, {"status_risk|gte": 70}),
]
