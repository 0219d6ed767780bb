"""Derive an sf1 fixture set from the driver's sf0.1 tables (VERDICT
r10 ask #5): one more decade of scale for the production-catalog
sweep, without touching the read-only /root/testdata.

Derivation = 10 key-offset copies of each SCALING table concatenated
(pyarrow, schema preserved bit-for-bit), with the TPC-H fixed
dimensions (region, nation) kept single-copy — the same shape real
TPC-H scaling has. Every foreign key offsets together with its
primary key (orders.o_custkey with customer.c_custkey, etc.), so join
cardinalities scale linearly like real growth; timestamps are left
unchanged, so time-window densities scale 10x (the interesting case
for window/sweep-line operators).

Document text gets a DETERMINISTIC per-copy word permutation (md5 of
(copy, position) as the sort key; copy 0 stays verbatim). Verbatim
replication would make every doc a 10-way near-duplicate clique —
shingles identical across copies — which blows the dedup families'
candidate sets up ~45x beyond anything organic growth produces (a
first sweep attempt spent 20+ min inside dedup_keep_best alone). The
permutation preserves each doc's token MULTISET (language-ID, quality
ratios, token counts, vocab and unigram LM stats all see organic 10x
growth) while rewriting its n-gram/shingle space, so MinHash/SimHash
see distinct documents, as real growth would. The correctness gate is
indifferent either way — the DuckDB oracle runs on the SAME derived
parquet.

Embedding vectors get the same treatment for the same reason (r14 —
this fixes the one red row of SF1_SWEEP_r13): copies c > 0 apply a
DETERMINISTIC per-copy coordinate permutation (numpy PCG64 seeded
[3, c]; copy 0 verbatim). Verbatim replication planted a 10-way
exact-duplicate clique at every point of the vector space — geometry
no organic growth produces — which collapsed each IVF anchor's true
top-3 from 3 distinct vectors spread over up to 3 cells into 3 copies
of ONE vector in ONE cell, so a single unprobed cell zeroed the
anchor's recall and hard_negatives_ivf_contract's corpus hit-rate
fell through its 0.9 floor at sf1 (49/50 sweep). A coordinate
permutation preserves every per-vector invariant (component multiset,
norm, quantization error) and the verbatim copy-0 anchors, while
cross-copy vectors become fresh near-uniform draws — the same
distribution the base fixture samples, i.e. organic 10x growth for a
near-uniform corpus. DuckDB oracles run on the same derived parquet,
so correctness is indifferent; only the measured-recall contract
floors see the geometry, and they were measured on organic
near-uniform data.

Output: /root/repo/testdata_sf1/<table>.parquet — single files, so
both spark.read.parquet and DuckDB's direct-file views work
unchanged. Deterministic (pure arithmetic on the seeded sf0.1
fixtures); gitignored, regenerate on demand:

    python tools/make_sf1.py

``--decade2`` derives a SECOND decade (sf10) for just the
output-quadratic tail's input tables (documents, events — VERDICT
r12 ask #5: one more decade over the five worst sf1 ratios to
confirm the claimed output-bound growth): 10 key-offset copies of
the sf1 tables into /root/repo/testdata_sf10. The decade-2 text
permutation is per-(copy, ROW) (numpy PCG64, platform-stable), not
per-copy like decade 1 — composing the same per-copy permutation
family twice would make sf10 copy k of sf1 copy 0 collide verbatim
with sf10 copy 0 of sf1 copy k (sigma_k . id == id . sigma_k),
planting ~10-way exact-dup cliques organic growth doesn't have.

    python tools/make_sf1.py --decade2
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("MII_SF_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("MII_SF1_DIR", "/root/repo/testdata_sf1")
COPIES = 10
OFFSET = 10_000_000  # far above any sf0.1 key

FIXED = ("region", "nation")
KEY_COLS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _permute_text(text: "str | None", copy: int) -> "str | None":
    """Deterministic word shuffle: sort positions by md5((copy, i)).
    Token multiset preserved exactly; n-gram space rewritten."""
    import hashlib

    if text is None or copy == 0:
        return text
    words = text.split()
    order = sorted(
        range(len(words)),
        key=lambda i: hashlib.md5(f"{copy}:{i}".encode()).digest(),
    )
    return " ".join(words[i] for i in order)


def _permute_text_rowwise(text: "str | None", copy: int, row: int) -> "str | None":
    """Decade-2 shuffle: per-(copy, row) numpy permutation (PCG64 is
    deterministic and platform-stable). Same multiset-preserving /
    shingle-rewriting property as :func:`_permute_text`, but no two
    (decade-1 copy, decade-2 copy) compositions can coincide."""
    import numpy as np

    if text is None or copy == 0:
        return text
    words = text.split()
    order = np.random.default_rng([2, copy, row]).permutation(len(words))
    return " ".join(words[i] for i in order)


def _permute_embeddings(col: "pa.ChunkedArray", copy: int) -> "pa.Array":
    """Per-copy coordinate permutation of list<float> vectors (see
    module docstring). Deterministic: numpy PCG64 seeded [3, copy]."""
    import numpy as np

    vecs = np.asarray(col.to_pylist(), dtype=np.float32)
    perm = np.random.default_rng([3, copy]).permutation(vecs.shape[1])
    return pa.array(list(vecs[:, perm]), type=col.type)


def main(
    src: str = SRC,
    dst: str = DST,
    offset: int = OFFSET,
    tables: "dict | None" = None,
    fixed: tuple = FIXED,
    decade2: bool = False,
) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in fixed:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl, f"{dst}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} rows (fixed dimension, single copy)")
    for t, keys in (tables or KEY_COLS).items():
        tbl = pq.read_table(f"{src}/{t}.parquet")
        chunks = []
        for c in range(COPIES):
            t2 = tbl
            for col in keys:
                i = t2.schema.get_field_index(col)
                shifted = pc.add(t2.column(i), pa.scalar(c * offset, type=pa.int64()))
                t2 = t2.set_column(i, t2.schema.field(i), shifted.cast(t2.schema.field(i).type))
            if t == "embeddings" and c > 0:
                i = t2.schema.get_field_index("embedding")
                t2 = t2.set_column(
                    i, t2.schema.field(i), _permute_embeddings(t2.column(i), c)
                )
            if t == "documents" and c > 0:
                i = t2.schema.get_field_index("text")
                if decade2:
                    vals = [
                        _permute_text_rowwise(v, c, r)
                        for r, v in enumerate(t2.column(i).to_pylist())
                    ]
                    permuted = pa.array(vals, type=t2.schema.field(i).type)
                else:
                    permuted = pa.array(
                        [_permute_text(v.as_py(), c) for v in t2.column(i)],
                        type=t2.schema.field(i).type,
                    )
                t2 = t2.set_column(i, t2.schema.field(i), permuted)
            chunks.append(t2)
        out = pa.concat_tables(chunks)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    if "--decade2" in sys.argv:
        main(
            src=os.environ.get("MII_SF1_DIR", "/root/repo/testdata_sf1"),
            dst=os.environ.get("MII_SF10_DIR", "/root/repo/testdata_sf10"),
            offset=100_000_000,  # clears sf1's 9 x 10M key shifts
            tables={
                "documents": KEY_COLS["documents"],
                "events": KEY_COLS["events"],
            },
            fixed=(),
            decade2=True,
        )
    else:
        main()
