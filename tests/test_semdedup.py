"""Semantic deduplication (SemDeDup): exact differential against a
brute-force numpy + union-find oracle that replays the same recipe —
spherical-k-means cells, within-cell cosine>=threshold pairs,
transitive closure, keep-lowest representative — on the sf0.001
embeddings. The operator is deterministic (seeded codebook, 6-dp
rounding), so the comparison is equality, not tolerance.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyspark.sql.functions as F
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries.similarity import (  # noqa: E402
    EMB_DIM,
    SEMANTIC_DEDUP_COSINE,
    _load_emb,
    semantic_dedup_frame,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_rows(spark):
    rows = _load_emb(spark, SF_DIR).collect()
    return {r.vec_id: np.array(r.emb, dtype=np.float64) for r in rows}


def _uf(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_semantic_dedup_matches_bruteforce_oracle(spark, emb_rows):
    got = {
        r.vec_id: (r.cell, r.group_id, r.is_representative)
        for r in semantic_dedup_frame(
            _load_emb(spark, SF_DIR), refine_iters=1
        ).collect()
    }
    assert set(got) == set(emb_rows)

    # Oracle cell assignment: take the refined codebook's centroids
    # FROM SPARK (they're the output of ivf_refine, already covered by
    # its own monotonicity tests) and redo assignment + pairing +
    # closure independently in numpy.
    from data_ingestor_gluejob_script_spark.queries.similarity import (
        ivf_refine,
    )

    cb = ivf_refine(_load_emb(spark, SF_DIR), iters=1).collect()[0]
    cents = {c.cid: np.array(c.c, dtype=np.float64) for c in cb.cents}
    assert all(len(c) == EMB_DIM for c in cents.values())

    def cell_of(v: np.ndarray) -> int:
        # strictly-better fold over cid order == argmax with lowest-cid
        # tie-break (matches ivf_cell's `>` comparison)
        best_cid, best_s = None, None
        for cid in sorted(cents):
            c = cents[cid]
            s = float(v @ c) / float(np.sqrt(c @ c))
            if best_s is None or s > best_s:
                best_cid, best_s = cid, s
        return best_cid

    cells = {i: cell_of(v) for i, v in emb_rows.items()}
    for i in emb_rows:
        assert got[i][0] == cells[i], f"cell mismatch for vec {i}"

    edges = []
    ids = sorted(emb_rows)
    for ai, a in enumerate(ids):
        va = emb_rows[a]
        na = float(np.sqrt(va @ va))
        for b in ids[ai + 1 :]:
            if cells[a] != cells[b]:
                continue
            vb = emb_rows[b]
            cos = round(float(va @ vb) / (na * float(np.sqrt(vb @ vb))), 6)
            if cos >= SEMANTIC_DEDUP_COSINE:
                edges.append((a, b))
    assert edges, "threshold too high: differential exercises nothing"

    comp = _uf(ids, edges)
    for i in ids:
        assert got[i][1] == comp[i], f"group mismatch for vec {i}"
        assert got[i][2] == (comp[i] == i)

    # the keep-list actually removes something, and exactly one
    # representative per group survives
    reps = [i for i in ids if got[i][2]]
    assert len(reps) < len(ids)
    assert sorted({comp[i] for i in ids}) == sorted(reps)


def test_semantic_dedup_no_cross_cell_groups(spark, emb_rows):
    """Blocking contract: a dup group never spans two cells."""
    rows = semantic_dedup_frame(_load_emb(spark, SF_DIR)).collect()
    cell_by_group: dict[int, set[int]] = {}
    for r in rows:
        cell_by_group.setdefault(r.group_id, set()).add(r.cell)
    assert all(len(cs) == 1 for cs in cell_by_group.values())
