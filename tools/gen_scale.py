"""Generate the N× scale-up fixture used by the SCALING.md probe.

Unions N id-offset copies of the sf parquet tables so group/key
cardinality scales with row count (a naive row-duplication would keep
the same ids and collapse every group-by into N-deep groups, which
tests skew, not scale):

- every id column (event_id/user_id/doc_id/vec_id/order keys) gets
  `copy * stride` added, stride = 10^ceil(log10(max_id)+1), so copies
  never collide;
- `documents.text` is salted with a per-copy tag appended to the text
  (" cN") — copies of one doc stay NEAR-duplicates of each other
  (shingle overlap ≈ 1) instead of exact duplicates, preserving the
  LSH/CC stress structure documented in SCALING.md;
- `--no-neardup` switches documents to the NON-SATURATED control:
  every token gets a per-copy suffix, so copies share NO shingles —
  the corpus is N× bigger with sf0.1's NATURAL dup density (each
  copy's internal near-dup families replicate, families don't merge
  across copies). This separates "the machinery scales" from "the
  dup-stress edge volume scales" for the dup-sensitive operators;
- `embeddings.embedding` is kept bit-identical across copies: ANN
  probes measure candidate-generation volume, and identical vectors
  are the dup-saturated worst case there too.

Usage: python tools/gen_scale.py [--sf /root/testdata/sf0.1]
                                 [--out /tmp/sf0.1_x32] [--n 32]
                                 [--tables documents,embeddings,...]
"""

from __future__ import annotations

import argparse
import math
import os

import duckdb

ID_COLS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": [],
    "region": [],
}


def stride_for(con: duckdb.DuckDBPyConnection, path: str, col: str) -> int:
    mx = con.sql(f"SELECT max({col}) FROM '{path}'").fetchone()[0] or 0
    return 10 ** (int(math.log10(mx)) + 2) if mx else 10


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--tables", default="documents,embeddings,events")
    ap.add_argument(
        "--no-neardup",
        action="store_true",
        help="non-saturated control: per-token copy suffix — copies "
        "share no shingles, dup density stays at the source sf's "
        "natural level",
    )
    args = ap.parse_args()
    suffix = f"_x{args.n}" + ("_ctl" if args.no_neardup else "")
    out = args.out or f"/tmp/{os.path.basename(args.sf.rstrip('/'))}{suffix}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    tables = [t.strip() for t in args.tables.split(",") if t.strip()]
    for t in tables:
        src = f"{args.sf}/{t}.parquet"
        ids = ID_COLS.get(t, [])
        strides = {c: stride_for(con, src, c) for c in ids}
        parts = []
        for k in range(args.n):
            sel = []
            for c, typ, *_ in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall():
                if c in strides:
                    sel.append(f"({c} + {k * strides[c]}) AS {c}")
                elif t == "documents" and c == "text" and k > 0:
                    if args.no_neardup:
                        # per-token suffix: zero cross-copy shingle
                        # overlap; within-copy dup structure intact
                        sel.append(
                            "regexp_replace(text, '(\\S+)', "
                            f"'\\1~c{k}', 'g') AS text"
                        )
                    else:
                        sel.append(f"(text || ' c{k}') AS text")
                elif t == "customer" and c == "c_name" and k > 0:
                    # distinct per-copy names WITHOUT shifting string
                    # alignment: overwrite two leading zero digits
                    # (inside any prefix-block key) with the copy tag.
                    # A same-length in-block edit scales block COUNT
                    # with copies while block depth stays constant —
                    # the shape a genuinely 32x-bigger entity table
                    # has. (A 'cK' prefix shifts digits out of a
                    # 16-char block key and block depth explodes
                    # 100-1000x instead.)
                    sel.append(
                        "(substr(c_name, 1, 9) || "
                        f"lpad('{k}', 2, '0') || "
                        "substr(c_name, 12)) AS c_name"
                    )
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM '{src}'")
        q = " UNION ALL ".join(parts)
        con.sql(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows -> {out}/{t}.parquet")
    # passthrough for tables not scaled (so bench.py finds all views)
    for t in ID_COLS:
        if t not in tables and not os.path.exists(f"{out}/{t}.parquet"):
            con.sql(
                f"COPY (SELECT * FROM '{args.sf}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    print(f"done: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
