"""Structure-preserving embedding replicas for the scaling fixtures.

ADVICE r09: gen_sf1/gen_sf10 regenerated replica embeddings as
replica-seeded uniform hash noise — distinct vectors, but (a) a
DIFFERENT distribution than the source (uniform-in-cube, norm ~2.3,
vs the source's unit-norm vectors), so cosine/L2 distance regimes and
IVF/LSH cell occupancy at sf1/sf10 measured a corpus unlike the one
the queries are specified on; and (b) no relation to the source
geometry, so whatever cluster/near-dup density the source has does
not scale with the corpus.

Fix: each replica is the SOURCE corpus under a replica-seeded random
ORTHOGONAL rotation (QR of a seeded Gaussian, sign-fixed for a unique
deterministic factorization).  Rotations preserve every norm and every
within-replica pairwise distance EXACTLY — cluster geometry, near-dup
density, and IVF/LSH occupancy statistics all scale 1:1 with the
corpus — while distinct replicas sit in random relative orientation,
so no cross-replica near-dup pairs are invented (the same design rule
as the per-replica letter PERMUTATION on documents.text: within-replica
structure identical, across-replica content distinct).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def rotation(r: int, dim: int) -> np.ndarray:
    """Deterministic random orthogonal matrix for replica r (identity at
    r=0).  QR of a seeded standard Gaussian; columns sign-fixed so the
    factorization (hence the fixture) is unique and reproducible."""
    if r == 0:
        return np.eye(dim)
    rng = np.random.default_rng(1_000_003 * r + 42)
    a = rng.standard_normal((dim, dim))
    q, rr = np.linalg.qr(a)
    return q * np.sign(np.diag(rr))


def write_embedding_replicas(
    src_path: str, dst_path: str, n_replicas: int, off: int
) -> int:
    """Write ``dst_path`` = source embeddings plus ``n_replicas`` rotated
    copies (vec_id offset by ``r * off``, label kept, float32 list column
    — the exact source schema).  Returns the row count written."""
    t = pq.read_table(src_path, columns=["vec_id", "embedding", "label"])
    vec_id = t["vec_id"].to_numpy()
    label = t["label"].to_numpy()
    v = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    dim = v.shape[1]
    ids, vecs, labels = [], [], []
    for r in range(n_replicas + 1):
        ids.append(vec_id + r * off)
        vecs.append((v @ rotation(r, dim)).astype(np.float32))
        labels.append(label)
    flat = np.concatenate(vecs, axis=0)
    n = flat.shape[0]
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(flat.reshape(-1)), dim
    ).cast(pa.list_(pa.float32()))
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "embedding": emb,
            "label": pa.array(np.concatenate(labels), type=pa.int32()),
        }
    )
    pq.write_table(out, dst_path)
    return n
