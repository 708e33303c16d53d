"""config.yaml ingestion with reference-schema parity.

Loads the exact YAML shape the reference's ConfigOptions reads
(/root/reference/WebLogTriage/config.py:6-48, schema
/root/reference/config.yaml): rules_path, webshell_path,
ignore_extensions, ignore_ip, email.{sender,smtp_server,smtp_port,
body}, tool_signatures (keyword/time_window required per entry),
uri_risk.{sensitive_paths,sensitive_extensions}.

One deliberate deviation, called out in SURVEY §1.2: the reference
loads `webshell_path` from the `rules_path` key (config.py:19 — a
copy-paste bug, both attributes end up pointing at rules.yaml); here
it is read from the intended `webshell_path` key (config.yaml:9).

`engine_config()` turns a ConfigOptions into a ready EngineConfig:
rules and shells are loaded from their files (paths resolved relative
to the config file, so the reference's own config.yaml works verbatim
from any cwd), tool signatures and URI-risk knobs are wired through,
and ignore_extensions / ignore_ip become the filter-stage defaults the
reference applies via its argparse defaults (triage.py:164,191).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import yaml


class ConfigOptionsError(Exception):
    pass


@dataclass
class ConfigOptions:
    rules_path: str | None = None
    webshell_path: str | None = None
    ignore_extensions: tuple = ()
    ignore_ip: tuple = ()
    email_sender: str = ""
    email_smtp_server: str = ""
    email_smtp_port: int = 25
    email_body: str = ""
    tool_signatures: list = field(default_factory=list)
    uri_risk_paths: list = field(default_factory=list)
    uri_risk_extensions: list = field(default_factory=list)
    # Directory of the source YAML; '' when built programmatically.
    base_dir: str = ""


def load_config(path: str) -> ConfigOptions:
    """Parse a reference-format config.yaml into ConfigOptions."""
    try:
        try:
            with open(path) as fp:
                data = yaml.safe_load(fp) or {}
        except yaml.YAMLError as e:
            raise ConfigOptionsError(f"Invalid yaml configuration {path}: {e}") from e

        opts = ConfigOptions(base_dir=os.path.dirname(os.path.abspath(path)))
        opts.rules_path = data.get("rules_path")
        opts.webshell_path = data.get("webshell_path")
        opts.ignore_extensions = tuple(data.get("ignore_extensions", []) or [])
        opts.ignore_ip = tuple(data.get("ignore_ip", []) or [])

        email = data.get("email") or {}
        opts.email_sender = email.get("sender", "")
        opts.email_smtp_server = email.get("smtp_server", "")
        opts.email_smtp_port = email.get("smtp_port", 25)
        opts.email_body = email.get("body", "")

        opts.tool_signatures = data.get("tool_signatures") or []
        required = {"keyword", "time_window"}
        for sig in opts.tool_signatures:
            if not required.issubset(sig):
                raise ValueError(
                    f"Missing required tool_signature keys: {required - set(sig)}"
                )
            sig["keyword"] = tuple(sig.get("keyword", []))

        uri_risk = data.get("uri_risk") or {}
        opts.uri_risk_paths = list(uri_risk.get("sensitive_paths", []) or [])
        # Same regex form the reference builds (config.py:43-45).
        opts.uri_risk_extensions = [
            rf"\.{str(ext).lstrip('.')}"
            for ext in uri_risk.get("sensitive_extensions", []) or []
        ]
        return opts
    except ConfigOptionsError:
        raise
    except Exception as e:
        raise ConfigOptionsError(f"ConfigOptions: error: {e}") from e


def _resolve(path: str | None, base_dir: str) -> str | None:
    if not path:
        return None
    if os.path.isabs(path) or os.path.exists(path):
        return path
    candidate = os.path.join(base_dir, path)
    return candidate if os.path.exists(candidate) else path


def engine_config(opts: ConfigOptions, **overrides):
    """ConfigOptions -> EngineConfig with rules/shells loaded from the
    referenced files and all detector/filter knobs wired through.
    Keyword overrides win over config-file values."""
    from webloghunter_spark.engine import EngineConfig
    from webloghunter_spark.functions.risk import load_shells
    from webloghunter_spark.rules.sigma import load_rules

    kwargs: dict = {}
    rules_path = _resolve(opts.rules_path, opts.base_dir)
    if rules_path and os.path.exists(rules_path):
        kwargs["rules"] = load_rules(rules_path)
    shells_path = _resolve(opts.webshell_path, opts.base_dir)
    if shells_path and os.path.exists(shells_path):
        kwargs["shells"] = load_shells(shells_path)
    if opts.tool_signatures:
        kwargs["tool_signatures"] = [dict(s) for s in opts.tool_signatures]
    if opts.uri_risk_paths:
        kwargs["sensitive_paths"] = tuple(opts.uri_risk_paths)
    if opts.uri_risk_extensions:
        kwargs["risky_extensions"] = tuple(opts.uri_risk_extensions)
    if opts.ignore_extensions:
        kwargs["ignore_extensions"] = opts.ignore_extensions
    if opts.ignore_ip:
        kwargs["ignore_ip"] = opts.ignore_ip
    kwargs.update(overrides)
    return EngineConfig(**kwargs)
