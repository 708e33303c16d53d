"""CIDR membership as a Column expression.

Spark SQL has no builtin CIDR test. For IPv4 networks we build a pure
native expression: parse dotted-quad to a 32-bit integer with
split/try_cast (invalid rows -> NULL -> False) and compare the masked
prefix — fully codegen'd, no Python in the hot path, which matters at
100 TB. IPv6 (rare in access logs) falls back to a vectorized pandas
UDF using the stdlib `ipaddress` module for exact parity with the
reference (risk.py:149-168, dataframe.py:377-385: invalid IPs are
simply False, invalid networks are skipped).
"""

from __future__ import annotations

import ipaddress
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_IPV4_CAPTURE = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"


def _ipv4_aton(col: Column) -> Column:
    """Dotted-quad -> long, NULL when not a valid IPv4.

    Four regexp_extract captures (empty on non-match -> try_cast NULL)
    keep the codegen expression small; a split-based form duplicates
    the split per octet reference and bloats the generated code.
    """
    octets = [
        F.regexp_extract(col, _IPV4_CAPTURE, i + 1).try_cast("long") for i in range(4)
    ]
    valid = octets[0].isNotNull()
    for o in octets:
        valid = valid & (o <= 255)
    num = octets[0] * 16777216 + octets[1] * 65536 + octets[2] * 256 + octets[3]
    return F.when(valid, num)


def ip_in_cidr(col: Column | str, cidrs: Sequence[str] | str) -> Column:
    """True iff the string IP in `col` is inside ANY of `cidrs`.

    Invalid CIDR strings are skipped; invalid row IPs are False.
    """
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(cidrs, str):
        cidrs = [cidrs]

    v4_nets: list[ipaddress.IPv4Network] = []
    v6_nets: list[ipaddress.IPv6Network] = []
    for raw in cidrs:
        try:
            net = ipaddress.ip_network(raw, strict=False)
        except ValueError:
            continue
        (v4_nets if net.version == 4 else v6_nets).append(net)

    result = F.lit(False)
    if v4_nets:
        aton = _ipv4_aton(c)
        for net in v4_nets:
            base = int(net.network_address)
            mask = int(net.netmask)
            result = result | (aton.bitwiseAND(F.lit(mask)) == F.lit(base))
    if v6_nets:
        nets = tuple(str(n) for n in v6_nets)

        @F.pandas_udf(T.BooleanType())
        def _v6(ips: pd.Series) -> pd.Series:
            parsed = [ipaddress.ip_network(n) for n in nets]

            def check(x):
                try:
                    ip = ipaddress.ip_address(x)
                except (ValueError, TypeError):
                    return False
                return any(ip in n for n in parsed)

            return ips.map(check)

        result = result | F.coalesce(_v6(c), F.lit(False))
    return F.coalesce(result, F.lit(False))
