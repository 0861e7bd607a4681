#!/usr/bin/env python
"""Synthesize an sf10 fixture (100x sf0.1) for the two-decade scaling study.

scripts/gen_sf1.py bought the first measured decade (SCALING.md's sf1
column); this derives the SECOND — sf10, 100x the committed sf0.1
test data — so the heaviest queries can show two consecutive measured
decades of linear ratios (0.1 -> 1 -> 10), i.e. a 1000x span from the
sf0.01 correctness scale.  Written to ``.scaling/sf10/`` (gitignored,
~2.4 GB derived data; the committed artifact is docs/SCALING_SF10.md
measured on it by scripts/gen_scaling_sf10.py).

Same anti-degeneration rules as gen_sf1.py, with one upgrade: 100
replicas need 100 DISTINCT text transforms, and the alphabet only has
26 rotations — so documents.text goes through a per-replica letter
PERMUTATION (deterministic seeded Fisher-Yates, identity for r=0),
which preserves length, whitespace structure, and char-class mix
exactly like a rotation while giving every replica distinct shingles
and vocabulary.  Keys offset by r * 10_000_000 in lockstep across fact
tables (join integrity and fan-outs preserved), supplier names
regenerated from the offset key in TPC-H's own format, embeddings
regenerated as replica-seeded ORTHOGONAL ROTATIONS of the source
vectors (structure-preserving — norms, within-replica distances, and
cluster/near-dup density scale 1:1 with the corpus; see
scripts/_embed_replicas.py, ADVICE r09).

Usage: python scripts/gen_sf10.py   (writes .scaling/sf10/*.parquet)
"""

from __future__ import annotations

import os
import string
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _embed_replicas import write_embedding_replicas  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".scaling", "sf10")
OFF = 10_000_000
N_REPLICAS = 99  # + the untouched original = 100x


def _perm(r: int) -> str:
    """Deterministic letter permutation for replica r (identity at 0):
    Fisher-Yates driven by a fixed-parameter LCG so the fixture is
    reproducible without RNG state.  All 100 permutations are pairwise
    distinct (asserted in main)."""
    letters = list(string.ascii_lowercase)
    if r == 0:
        return "".join(letters)
    state = r * 2654435761 % 2**32
    for i in range(25, 0, -1):
        state = (state * 1664525 + 1013904223) % 2**32
        j = state % (i + 1)
        letters[i], letters[j] = letters[j], letters[i]
    return "".join(letters)


def _replica_select(table: str, r: int) -> str | None:
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    off = r * OFF
    if table in ("region", "nation"):
        return None  # shared dimensions: original rows only
    if table == "supplier":
        return (
            f"SELECT s_suppkey + {off} AS s_suppkey, "
            f"'Supplier#' || lpad(CAST(s_suppkey + {off} AS VARCHAR), 9, '0') "
            "AS s_name, s_nationkey, s_acctbal FROM src"
        )
    if table == "customer":
        return (
            f"SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey, "
            "c_acctbal, c_mktsegment FROM src"
        )
    if table == "part":
        return (
            f"SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type, "
            "p_size, p_retailprice FROM src"
        )
    if table == "orders":
        return (
            f"SELECT o_orderkey + {off} AS o_orderkey, o_custkey + {off} AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM src"
        )
    if table == "lineitem":
        return (
            f"SELECT l_orderkey + {off} AS l_orderkey, l_partkey + {off} AS l_partkey, "
            f"l_suppkey + {off} AS l_suppkey, l_linenumber, l_quantity, "
            "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
            "l_shipdate FROM src"
        )
    if table == "events":
        return (
            f"SELECT event_id + {off} AS event_id, ts, user_id + {off} AS user_id, "
            "event_type, value, props FROM src"
        )
    if table == "documents":
        p = _perm(r)
        pu = p.upper()
        return (
            f"SELECT doc_id + {off} AS doc_id, "
            f"translate(text, '{lower}{upper}', '{p}{pu}') AS text, "
            "lang, source, n_chars FROM src"
        )
    raise ValueError(table)


def main() -> None:
    perms = {_perm(r) for r in range(N_REPLICAS + 1)}
    assert len(perms) == N_REPLICAS + 1, "letter permutations must be distinct"
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        dst_t = os.path.join(OUT, f"{t}.parquet")
        if t == "embeddings":
            # structure-preserving rotated replicas (ADVICE r09), not
            # hash noise — see scripts/_embed_replicas.py
            n = write_embedding_replicas(
                f"{SRC}/{t}.parquet", dst_t, N_REPLICAS, OFF
            )
            print(f"{t}: {n} rows -> {dst_t}", flush=True)
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{t}.parquet'"
        )
        parts = ["SELECT * FROM src"]
        for r in range(1, N_REPLICAS + 1):
            sel = _replica_select(t, r)
            if sel:
                parts.append(sel)
        union = "\nUNION ALL\n".join(parts)
        dst = os.path.join(OUT, f"{t}.parquet")
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}", flush=True)


if __name__ == "__main__":
    main()
