"""k-NN graph (queries/similarity.knn_graph_frame, round 12 — the
linear-output twin of pair enumeration): EXACT brute-force
differential at bits_per_band=0 (every pair is a candidate, so the
graph must equal the true top-k bit-for-bit — the oracle folds dots
in the same sequential order as Spark's F.aggregate), plus a recall
bound at the default corpus-adaptive banding, determinism, and the
n·k output cap."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.similarity import (  # noqa: E402
    KNN_TARGET_BUCKET,
    knn_band_bits,
    knn_graph_frame,
)

SF_DIR = "/root/testdata/sf0.001"


def _vectors(spark):
    rows = (
        load(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    # float() widens float32 exactly — same doubles Spark folds
    return {r.vec_id: [float(x) for x in r.embedding] for r in rows}


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def brute_knn(vecs, k):
    """{vec_id: [(nbr_id, sim, rank), ...]} — sequential-fold doubles,
    ties to the smaller nbr_id, exactly the frame's order."""
    norms = {i: math.sqrt(_fold_dot(v, v)) for i, v in vecs.items()}
    out = {}
    for i, v in vecs.items():
        sims = [
            (_fold_dot(v, w) / (norms[i] * norms[j]), j)
            for j, w in vecs.items()
            if j != i
        ]
        sims.sort(key=lambda t: (-t[0], t[1]))
        out[i] = [
            (j, round_half_up6(s), r + 1)
            for r, (s, j) in enumerate(sims[:k])
        ]
    return out


def round_half_up6(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def test_exact_when_all_pairs(spark):
    """bits_per_band=0: one bucket per band -> candidate set is ALL
    pairs -> the graph must equal true top-k exactly, including tie
    order and rounded sims."""
    vecs = _vectors(spark)
    got = {}
    rows = knn_graph_frame(
        load(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").alias("emb")
        ),
        k=5,
        bands=1,
        bits_per_band=0,
    ).collect()
    for r in rows:
        got.setdefault(r.vec_id, []).append(
            (r.rank, r.nbr_id, r.cosine_sim)
        )
    want = brute_knn(vecs, 5)
    assert set(got) == set(want)
    for i in want:
        assert sorted(got[i]) == [
            (rank, j, s) for j, s, rank in want[i]
        ], f"vec {i}"


def test_default_banding_recall_and_cap(spark):
    """Corpus-adaptive banding on the real table: output is capped at
    n·k by construction, every returned edge's sim is the true sim,
    and recall@k against brute force clears 0.9 (500 vectors, 8 bands
    of knn_band_bits(500)=1 bit — near-full bucket coverage)."""
    vecs = _vectors(spark)
    k = 10
    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").alias("emb")
    )
    rows = knn_graph_frame(emb, k=k).collect()
    n = len(vecs)
    assert len(rows) <= n * k
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r.vec_id, set()).add(r.nbr_id)
    want = brute_knn(vecs, k)
    hits = sum(
        len(per_vec.get(i, set()) & {j for j, _, _ in want[i]})
        for i in want
    )
    recall = hits / (n * k)
    assert recall >= 0.90, f"recall@{k} = {recall:.3f}"
    # ranks are 1..<=k and unique per vector
    ranks = {}
    for r in rows:
        ranks.setdefault(r.vec_id, []).append(r.rank)
    assert all(
        sorted(v) == list(range(1, len(v) + 1)) and len(v) <= k
        for v in ranks.values()
    )


def test_band_bits_rule():
    assert knn_band_bits(100) == 0
    assert knn_band_bits(KNN_TARGET_BUCKET) == 0
    assert knn_band_bits(KNN_TARGET_BUCKET * 2) == 1
    assert knn_band_bits(1_000_000) == math.ceil(
        math.log2(1_000_000 / KNN_TARGET_BUCKET)
    )


def test_banded_equals_candidate_set_topk(spark):
    """The round-12 rework's load-bearing claim: per-bucket local
    top-k then merge returns EXACTLY the global top-k over the banded
    candidate set (if u is in v's global top-k, fewer than k
    candidates beat u in any shared bucket, so u survives that
    bucket's local cut). Oracle mirrors the banding in python —
    sequential-fold signs on the same planes — then takes top-k over
    each vector's candidate union."""
    from data_ingestor_gluejob_script_spark.queries.similarity import (
        _knn_plane,
    )

    bands, bits, k = 4, 3, 5
    vecs = _vectors(spark)
    sigs = {}
    for i, v in vecs.items():
        sigs[i] = tuple(
            sum(
                (1 << t)
                for t in range(bits)
                if _fold_dot(v, _knn_plane(b, t)) >= 0
            )
            for b in range(bands)
        )
    cands = {i: set() for i in vecs}
    for i in vecs:
        for j in vecs:
            if j != i and any(
                sigs[i][b] == sigs[j][b] for b in range(bands)
            ):
                cands[i].add(j)
    norms = {i: math.sqrt(_fold_dot(v, v)) for i, v in vecs.items()}
    want = {}
    for i, v in vecs.items():
        sims = sorted(
            (
                (
                    _fold_dot(v, vecs[j]) / (norms[i] * norms[j]),
                    j,
                )
                for j in cands[i]
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        want[i] = [
            (r + 1, j, round_half_up6(s))
            for r, (s, j) in enumerate(sims)
        ]
    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").alias("emb")
    )
    got = {}
    for r in knn_graph_frame(
        emb, k=k, bands=bands, bits_per_band=bits
    ).collect():
        got.setdefault(r.vec_id, []).append(
            (r.rank, r.nbr_id, r.cosine_sim)
        )
    assert {i for i in want if want[i]} == set(got)
    for i in got:
        assert sorted(got[i]) == want[i], f"vec {i}"


def test_deterministic_across_runs(spark):
    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").alias("emb")
    )
    a = sorted(map(tuple, knn_graph_frame(emb, k=3).collect()))
    b = sorted(
        map(tuple, knn_graph_frame(emb.repartition(7), k=3).collect())
    )
    assert a == b


def test_row_blocked_local_topk_identical(spark):
    """The row-blocked sims computation (bounded per-bucket memory)
    must be bit-identical to the single-block path: a tiny
    block_entries forces many blocks over the bits=0 all-pairs
    bucket, and the output must equal the default call exactly."""
    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").alias("emb")
    )
    a = sorted(
        map(
            tuple,
            knn_graph_frame(
                emb, k=5, bands=1, bits_per_band=0
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            knn_graph_frame(
                emb, k=5, bands=1, bits_per_band=0, block_entries=700
            ).collect(),
        )
    )
    assert a == b and a


def test_zero_norm_vectors_excluded_no_self_loops(spark):
    """Round-12 review finding: a zero-norm vector made 0/0 = NaN
    sims, and NaN lexsorts past the -inf self entry — self-loop edges
    (vec_id == nbr_id, sim=-inf) leaked into the graph. Zero-norm
    vectors are now excluded as source AND neighbor; no self-loops,
    no non-finite sims, other vectors' neighborhoods unaffected."""
    rows = [
        (1, [1.0, 0.0] + [0.0] * 62),
        (2, [0.9, 0.1] + [0.0] * 62),
        (3, [0.0] * 64),  # zero-norm
        (4, [-1.0, 0.0] + [0.0] * 62),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, emb array<double>"
    )
    got = knn_graph_frame(emb, k=3, bands=1, bits_per_band=0).collect()
    assert got, "graph must not be empty"
    for r in got:
        assert r.vec_id != r.nbr_id, f"self-loop: {r}"
        assert r.vec_id != 3 and r.nbr_id != 3, f"zero-norm leaked: {r}"
        assert math.isfinite(r.cosine_sim), f"non-finite sim: {r}"
    # the three non-degenerate vectors each see the other two
    per = {}
    for r in got:
        per.setdefault(r.vec_id, set()).add(r.nbr_id)
    assert per == {1: {2, 4}, 2: {1, 4}, 4: {1, 2}}


def test_no_cartesian_product_in_plan(spark):
    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").alias("emb")
    )
    plan = knn_graph_frame(emb, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _clone_corpus(spark, n_classes=25, max_clones=6, seed=7):
    """Clone-flood corpus: n_classes distinct 64-dim vectors, each
    repeated 1..max_clones times with INTERLEAVED vec_ids (so class
    representatives are not simply consecutive), plus one zero-norm
    row that must never appear in the graph."""
    import random

    rng = random.Random(seed)
    slots = []
    classes = []
    for c in range(n_classes):
        v = [float(rng.randint(-3, 3)) for _ in range(64)]
        classes.append(v)
        slots.extend([c] * rng.randint(1, max_clones))
    rng.shuffle(slots)
    rows = [(vid, classes[c]) for vid, c in enumerate(slots)]
    zero_id = len(rows)
    df = spark.createDataFrame(
        rows + [(zero_id, [0.0] * 64)], "vec_id long, emb array<double>"
    )
    return df, dict(rows), zero_id


def test_clone_collapse_exact_all_pairs(spark):
    """Round-13 clone pre-collapse: with heavy exact clones in the
    corpus the default path (collapse_clones=True) at bits=0 must
    still equal the brute-force oracle bit-for-bit — intra-class
    edges (analytic clone sim), inter-class expansion, tie order,
    ranks, zero-norm exclusion."""
    df, vecs, zero_id = _clone_corpus(spark)
    k = 4
    rows = knn_graph_frame(df, k=k, bands=1, bits_per_band=0).collect()
    got = {}
    for r in rows:
        assert r.vec_id != zero_id and r.nbr_id != zero_id
        got.setdefault(r.vec_id, []).append((r.rank, r.nbr_id, r.cosine_sim))
    want = brute_knn(vecs, k)
    assert set(got) == set(want)
    for i in want:
        assert sorted(got[i]) == [
            (rank, j, s) for j, s, rank in want[i]
        ], f"vec {i}"


def test_clone_collapse_equals_uncollapsed(spark):
    """The collapse is an optimization, not a semantics change: on a
    clone-heavy corpus, collapse_clones=True and False produce
    byte-identical graphs at BOTH an all-pairs and a banded config
    (candidates are unchanged — clones share every signature — and
    the synthesized intra-class sim is the same IEEE expression the
    numpy stage computes)."""
    df, _, _ = _clone_corpus(spark, n_classes=20, max_clones=5, seed=13)
    for bands, bits in [(1, 0), (4, 3)]:
        a = sorted(
            map(
                tuple,
                knn_graph_frame(
                    df, k=3, bands=bands, bits_per_band=bits
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                knn_graph_frame(
                    df,
                    k=3,
                    bands=bands,
                    bits_per_band=bits,
                    collapse_clones=False,
                ).collect(),
            )
        )
        assert a == b, f"bands={bands} bits={bits}"


def test_nonfinite_clone_class_emits_no_nan_edges(spark):
    """r13 review: a clone class whose vectors carry a NaN coordinate
    slips the zero-norm filter (NaN > 0 is TRUE in Spark's ordering),
    and its analytic intra-class clone sim evaluates to NaN — which
    would sort rank-1 past every real neighbor. The collapsed path
    must drop non-finite sims exactly like the numpy stage's
    np.isfinite does, keeping the byte-identical-to-uncollapsed
    contract on this corpus too."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.1]),
        (2, [0.9, 0.2]),
        (3, [float("nan"), 1.0]),  # NaN clone class {3, 4}
        (4, [float("nan"), 1.0]),
        (5, [float("inf"), 1.0]),  # Inf clone class {5, 6}
        (6, [float("inf"), 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    import math

    by_arm = {}
    for collapse in (True, False):
        got = knn_graph_frame(
            df, k=3, bands=1, bits_per_band=0, collapse_clones=collapse
        ).collect()
        # no NaN/Inf sims anywhere, and no edges sourced from or
        # pointing at the non-finite vectors
        for r in got:
            assert math.isfinite(r.cosine_sim), r
            assert r.vec_id in (0, 1, 2) and r.nbr_id in (0, 1, 2), r
        by_arm[collapse] = sorted(map(tuple, got))
    assert by_arm[True] == by_arm[False]
