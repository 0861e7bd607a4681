#!/usr/bin/env python
"""Synthesize an sf1 decade (10x sf0.1) for the scaling study.

Round-6 VERDICT item #4: the committed scaling table stops at sf0.1,
where fixed overhead still dominates — the most expensive queries need
one more decade to show whether their ratios flatten toward linear.
The driver provides no sf1 fixture, so this script derives one from
sf0.1 deterministically (no RNG, pure hash/translate transforms) into
``.scaling/sf1/`` (gitignored — ~170 MB of derived data has no place in
history; the committed artifact is the SCALING.md table measured on it).

Replication is NOT naive row duplication — exact copies would fake the
workload (near-dup/semdedup pair spaces explode quadratically on
identical rows, dedup survivors collapse, sketch distinct-counts stay
flat).  Each replica r in 1..9 gets:

- fact keys offset by r * 10_000_000 (orderkey/custkey/partkey/suppkey/
  event_id/user_id/doc_id/vec_id) with foreign keys offset in lockstep,
  so per-replica join integrity and fan-outs match the original;
- ``documents.text`` passed through a per-replica letter rotation
  (translate), keeping lengths, whitespace structure, and char-class
  mix identical while making shingles/vocabulary distinct per replica
  (10x distinct content, not 10 copies);
- ``embeddings.embedding`` regenerated as replica-seeded ORTHOGONAL
  ROTATIONS of the source vectors (structure-preserving: norms,
  within-replica distances, cluster/near-dup density all scale 1:1
  with the corpus; cross-replica orientation random so no degenerate
  near-dup chains are invented — see scripts/_embed_replicas.py,
  ADVICE r09);
- dimensions (region, nation) shared, as at any scale.

Usage: python scripts/gen_sf1.py   (writes .scaling/sf1/*.parquet)
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
OUT = os.path.join(REPO, ".scaling", "sf1")
OFF = 10_000_000
N_REPLICAS = 9  # + the untouched original = 10x


def _rot(s: str, r: int) -> str:
    return s[r % 26 :] + s[: r % 26]


def _replica_select(table: str, r: int) -> str:
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    off = r * OFF
    if table in ("region", "nation"):
        return None  # shared dimensions: original rows only
    if table == "supplier":
        # regenerate s_name from the offset key in TPC-H's own
        # 'Supplier#%09d' format: a real 10x corpus has DISTINCT entity
        # names, and verbatim replication made every name a 10-way exact
        # duplicate — the fuzzy-match pair space (f9) degenerated the
        # same way un-rotated documents would have for dedup (round 9)
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
        rot_l = _rot(lower, r)
        rot_u = _rot(upper, r)
        return (
            f"SELECT doc_id + {off} AS doc_id, "
            f"translate(text, '{lower}{upper}', '{rot_l}{rot_u}') AS text, "
            "lang, source, n_chars FROM src"
        )
    raise ValueError(table)


def main() -> None:
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
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
