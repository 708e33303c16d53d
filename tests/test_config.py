"""config.yaml ingestion parity (reference config.py:6-48)."""

import os
import textwrap

import pytest

from webloghunter_spark.config import ConfigOptionsError, engine_config, load_config

REF_CONFIG = "/root/reference/config.yaml"


@pytest.mark.skipif(not os.path.exists(REF_CONFIG), reason="reference not present")
def test_loads_reference_config_verbatim():
    opts = load_config(REF_CONFIG)
    assert opts.rules_path == "rules.yaml"
    # Reference bug fixed (SURVEY §1.2): webshell_path comes from the
    # `webshell_path` key, NOT from rules_path (ref config.py:19).
    assert opts.webshell_path == "shells.txt"
    assert opts.ignore_extensions == (
        ".js", ".gif", ".css", ".woff", ".woff2", ".ttf", ".svg", ".ico",
        ".map", ".eot", ".jpg", ".jpeg", ".png", ".bmp", ".webp",
    )
    assert opts.ignore_ip == ("10.10.10.10",)
    assert opts.uri_risk_paths == ["/admin", "/login", "/config", "/setup", "/upload"]
    assert opts.uri_risk_extensions == [r"\.exe", r"\.sql", r"\.cgi", r"\.pl"]
    # email block is commented out in the shipped file -> defaults
    assert opts.email_sender == "" and opts.email_smtp_port == 25
    assert len(opts.tool_signatures) == 1
    sig = opts.tool_signatures[0]
    assert sig["tool"] == "DS01" and sig["time_window"] == 7200
    assert sig["keyword"] == (
        "/.access", ".bak_0.log", ".chef/config.rb", ".isort.cfg",
        ".spacemacs", "/~xfs",
    )


@pytest.mark.skipif(not os.path.exists(REF_CONFIG), reason="reference not present")
def test_engine_config_from_reference_yaml():
    cfg = engine_config(load_config(REF_CONFIG))
    # rules.yaml + shells.txt resolved relative to the config file
    assert len(cfg.rules) > 0
    assert len(cfg.shells) > 100
    assert cfg.sensitive_paths == ("/admin", "/login", "/config", "/setup", "/upload")
    assert cfg.risky_extensions == (r"\.exe", r"\.sql", r"\.cgi", r"\.pl")
    assert cfg.tool_signatures[0]["name"] == "DirSearch"
    assert cfg.ignore_ip == ("10.10.10.10",)
    assert ".css" in cfg.ignore_extensions


def test_full_yaml_with_email_and_validation(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(textwrap.dedent("""
        rules_path: nope.yaml
        webshell_path: nope.txt
        ignore_extensions: [.css]
        ignore_ip: [192.168.0.0/16]
        email:
          sender: a@b.c
          smtp_server: smtp.b.c
          smtp_port: 2525
          body: hi
        tool_signatures:
          - tool: T1
            name: Tool
            description: d
            keyword: [/x, /y]
            time_window: 10
        uri_risk:
          sensitive_paths: [/secret]
          sensitive_extensions: [exe, .sql]
    """))
    opts = load_config(str(p))
    assert opts.email_sender == "a@b.c" and opts.email_smtp_port == 2525
    assert opts.uri_risk_extensions == [r"\.exe", r"\.sql"]
    assert opts.tool_signatures[0]["keyword"] == ("/x", "/y")
    cfg = engine_config(opts)
    # missing rules/shells files -> engine defaults kept
    assert cfg.sensitive_paths == ("/secret",)
    assert cfg.ignore_extensions == (".css",)
    assert cfg.ignore_ip == ("192.168.0.0/16",)

    bad = tmp_path / "bad.yaml"
    bad.write_text("tool_signatures:\n  - tool: T1\n    keyword: [/x]\n")
    with pytest.raises(ConfigOptionsError):
        load_config(str(bad))


def test_query_applies_config_defaults(spark):
    from webloghunter_spark.engine import EngineConfig, query

    cfg = EngineConfig(ignore_ip=("10.0.0.0/8",), ignore_extensions=(".css",))
    df = spark.createDataFrame(
        [
            ("10.1.2.3", "/keep.html"),
            ("172.16.0.1", "/style.css"),
            ("172.16.0.1", "/keep.html"),
        ],
        "ip string, request_uri string",
    )
    got = [r.ip for r in query(df, cfg, order_result=False).collect()]
    assert got == ["172.16.0.1"]
    # explicit override beats config defaults
    assert query(df, cfg, ip_ignore=["192.0.2.0/24"],
                 all_extensions=True, order_result=False).count() == 3
