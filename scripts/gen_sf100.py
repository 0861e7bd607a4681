#!/usr/bin/env python
"""Synthesize the sf100 SUBSET fixture (1000x sf0.1) for the
third-decade scaling study.

gen_sf1.py bought the first measured decade and gen_sf10.py the second;
this buys the THIRD (sf10 -> sf100) for the structurally riskiest
heads, so the linearity claim rests on three CONSECUTIVE measured
decades — a 1000x measured span, 10000x above the sf0.01 correctness
scale.  Only the tables that third-decade panel touches are generated
(documents, embeddings, supplier — see scripts/gen_scaling_sf100.py's
PANEL); the full-table fixture at this scale would be ~24 GB of mostly
unexercised fact rows.

Same anti-degeneration rules as gen_sf10.py, at 1000 replicas:

- documents.text goes through a per-replica letter PERMUTATION
  (seeded Fisher-Yates, identity at r=0, all 1000 asserted pairwise
  distinct) — length, whitespace, and char-class mix preserved while
  every replica has distinct shingles and vocabulary;
- embeddings are replica-seeded ORTHOGONAL ROTATIONS of the source
  vectors (scripts/_embed_replicas.py): norms, within-replica
  distances, and cluster/near-dup density scale 1:1 with the corpus;
- supplier names are regenerated from the offset key in TPC-H's own
  format, so f9's prefix-blocking key keeps its bounded-block-size
  property (block cardinality grows with the corpus).

Keys offset by r * 10_000_000 (> any sf0.1 key, and the synthetic
near-dup injection's +1_000_000 stays below the first replica's
offset, so no collisions).

Usage: python scripts/gen_sf100.py   (writes .scaling/sf100/*.parquet,
gitignored, ~6 GB)
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
OUT = os.path.join(REPO, ".scaling", "sf100")
OFF = 10_000_000
N_REPLICAS = 999  # + the untouched original = 1000x


def _perm(r: int) -> str:
    """Deterministic letter permutation for replica r (identity at 0) —
    the gen_sf10 generator, unchanged, so sf100's first 100 replicas
    match sf10's exactly (nested fixtures: sf100 is a superset)."""
    letters = list(string.ascii_lowercase)
    if r == 0:
        return "".join(letters)
    state = r * 2654435761 % 2**32
    for i in range(25, 0, -1):
        state = (state * 1664525 + 1013904223) % 2**32
        j = state % (i + 1)
        letters[i], letters[j] = letters[j], letters[i]
    return "".join(letters)


def _replica_select(table: str, r: int) -> str:
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    off = r * OFF
    if table == "supplier":
        # lpad width 11, NOT TPC-H's 9: sf100 keys reach 10 digits
        # (999 * 10M + 1000), and DuckDB's lpad TRUNCATES to the target
        # width — the first fixture build chopped the last key digit,
        # collapsing 1M names onto 181k and exploding f9's prefix blocks
        # quadratically (52.7x measured in the third-decade panel).  A
        # real corpus at this cardinality widens the id the same way.
        return (
            f"SELECT s_suppkey + {off} AS s_suppkey, "
            f"'Supplier#' || lpad(CAST(s_suppkey + {off} AS VARCHAR), 11, '0') "
            "AS s_name, s_nationkey, s_acctbal FROM src"
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
    # a 1000-branch UNION ALL trips the default parser depth limit
    con.execute("SET max_expression_depth TO 10000")
    for t in ("supplier", "documents"):
        dst_t = os.path.join(OUT, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{t}.parquet'"
        )
        parts = ["SELECT * FROM src"] + [
            _replica_select(t, r) for r in range(1, N_REPLICAS + 1)
        ]
        union = "\nUNION ALL\n".join(parts)
        con.execute(f"COPY ({union}) TO '{dst_t}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{dst_t}'").fetchone()[0]
        if t == "supplier":
            d = con.execute(
                f"SELECT COUNT(DISTINCT s_name) FROM '{dst_t}'"
            ).fetchone()[0]
            assert d == n, (
                f"supplier names must stay unique ({d} distinct of {n}): "
                "a truncating lpad here degenerates f9's prefix blocks"
            )
        print(f"{t}: {n} rows -> {dst_t}", flush=True)
    dst_e = os.path.join(OUT, "embeddings.parquet")
    n = write_embedding_replicas(
        f"{SRC}/embeddings.parquet", dst_e, N_REPLICAS, OFF
    )
    print(f"embeddings: {n} rows -> {dst_e}", flush=True)


if __name__ == "__main__":
    main()
