"""MinHash near-dup removal, batch and streaming: exact differential
of minhash_dedup_frame against a pure-python re-derivation of the
md5-chunk MinHash family (engine-portable by construction), and
batch/stream parity for run_neardup_ingest including crash-replay
idempotence.
"""

from __future__ import annotations

import hashlib
import shutil
import sys
import tempfile
from pathlib import Path

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.textops import (  # noqa: E402
    MINHASH_DEDUP_TAU,
    minhash_dedup_frame,
    minhash_signature_frame,
)
from data_ingestor_gluejob_script_spark.streaming import (  # noqa: E402
    run_neardup_ingest,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------- python twin of the family


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _signature(text: str):
    ws = text.split(" ")
    if len(ws) < 3:
        return None
    sh = sorted({" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)})
    hs = [_md5(s) for s in sh]
    return tuple(
        min(h[4 * i : 4 * i + 4] for h in hs) for i in range(8)
    )


def _bands(sig):
    return (_md5("|".join(sig[0:4])), _md5("|".join(sig[4:8])))


def _est_j(a, b):
    return sum(x == y for x, y in zip(a, b)) / 8


def minhash_dedup_oracle(rows, tau=MINHASH_DEDUP_TAU):
    """Retained doc_ids: exact collapse (min id per md5) then drop a
    doc iff a smaller-id survivor shares a band position and the
    estimated jaccard meets tau."""
    by_md5 = {}
    for doc_id, text in sorted(rows):
        by_md5.setdefault(_md5(text), (doc_id, text))
    surv = sorted(by_md5.values())
    sigs = {i: _signature(t) for i, t in surv}
    retained = []
    for idx, (i, _) in enumerate(surv):
        si = sigs[i]
        dropped = False
        if si is not None:
            bi = _bands(si)
            for j, _ in surv[:idx]:
                sj = sigs[j]
                if sj is None:
                    continue
                bj = _bands(sj)
                if (bi[0] == bj[0] or bi[1] == bj[1]) and _est_j(
                    si, sj
                ) >= tau:
                    dropped = True
                    break
        if not dropped:
            retained.append(i)
    return sorted(retained)


BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strange potions beneath the ancient library vault tonight"
)

FIXTURE = [
    (0, BASE),
    (1, BASE),  # exact dup of 0 -> exact collapse
    (2, BASE + " extra"),  # superset shingles -> near dup of 0
    (3, "completely different words about spark shuffles and joins"),
    (4, "tiny doc"),  # sub-shingle: no signature, always retained
    (5, BASE + " extra trailing"),  # near dup of 0/2
    (6, "completely different words about spark shuffles and joins ok"),
]


def test_python_twin_matches_spark_signature(spark):
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    got = {
        r["doc_id"]: tuple(r[f"s{i}"] for i in range(8))
        for r in minhash_signature_frame(df).collect()
    }
    want = {
        i: _signature(t) for i, t in FIXTURE if _signature(t) is not None
    }
    assert got == want


def test_minhash_dedup_fixture(spark):
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    got = sorted(
        r["doc_id"] for r in minhash_dedup_frame(df).collect()
    )
    want = minhash_dedup_oracle(FIXTURE)
    assert got == want
    # the fixture must actually exercise every path: an exact dup
    # gone, a near dup gone, the sub-shingle doc retained
    assert 1 not in got and 4 in got and 0 in got
    assert 2 not in got, "near-dup superset doc should have dropped"


def test_minhash_dedup_differential_sf0001(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    got = sorted(r["doc_id"] for r in minhash_dedup_frame(docs).collect())
    assert got == minhash_dedup_oracle(rows)


def _write_batches(spark, rows, docs_dir, n_batches=3):
    """Write id-ordered slices as separate parquet files so
    maxFilesPerTrigger=1 yields deterministic id-ordered batches."""
    rows = sorted(rows)
    per = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if not chunk:
            continue
        spark.createDataFrame(
            chunk, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(docs_dir)


@pytest.mark.slow
def test_neardup_ingest_matches_batch_twin_and_replays_clean(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()][:200]
    # splice the fixture's near-dup cluster in (offset past real ids)
    rows += [(10_000 + i, t) for i, t in FIXTURE]

    tmp = tempfile.mkdtemp(prefix="neardup_ingest_")
    try:
        docs_dir = f"{tmp}/in"
        lake = f"{tmp}/lake"
        sigs = f"{tmp}/sigs"
        ckpt = f"{tmp}/ckpt"
        _write_batches(spark, rows, docs_dir)

        q = run_neardup_ingest(spark, docs_dir, lake, sigs, ckpt)
        q.awaitTermination()
        got = sorted(
            (r["doc_id"], r["text"])
            for r in spark.read.parquet(lake)
            .select("doc_id", "text")
            .collect()
        )
        df_all = spark.createDataFrame(rows, "doc_id long, text string")
        want = sorted(
            (r["doc_id"], r["text"])
            for r in minhash_dedup_frame(df_all)
            .select("doc_id", "text")
            .collect()
        )
        assert got == want
        # signature lake: one row per distinct text, slots null only
        # for sub-shingle docs
        sig_rows = spark.read.parquet(sigs).collect()
        assert len(sig_rows) == len({t for _, t in rows})
        assert sum(r["s0"] is None for r in sig_rows) == len(
            {t for _, t in rows if len(t.split(" ")) < 3}
        )

        # replay from scratch (fresh checkpoint, same lakes): the
        # ledger absorbs everything, both lakes unchanged
        shutil.rmtree(ckpt)
        q2 = run_neardup_ingest(spark, docs_dir, lake, sigs, f"{tmp}/ck2")
        q2.awaitTermination()
        again = sorted(
            (r["doc_id"], r["text"])
            for r in spark.read.parquet(lake)
            .select("doc_id", "text")
            .collect()
        )
        assert again == want
        assert spark.read.parquet(sigs).count() == len(sig_rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_null_text_docs_survive_exact_and_neardup_dedup(spark):
    """Round-9 review finding: md5(NULL) is NULL and a NULL join key
    matches nothing, so null-text docs used to vanish from
    exact_dedup_frame (and therefore minhash_dedup_frame) while the
    GROUP BY oracle keeps one survivor. Pin the null-safe digest:
    NULLs group together (min id survives), DISTINCT from the empty
    string, and the streaming twin agrees."""
    from data_ingestor_gluejob_script_spark.queries.textops import (
        exact_dedup_frame,
    )

    rows = [
        (1, None),
        (2, "real words here"),
        (3, None),
        (4, ""),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_exact = sorted(
        r["doc_id"] for r in exact_dedup_frame(df).collect()
    )
    # one NULL survivor (min id 1), one "" survivor (min id 4), the
    # real doc — NULL and "" are NOT merged
    assert got_exact == [1, 2, 4]
    got_near = sorted(
        r["doc_id"] for r in minhash_dedup_frame(df).collect()
    )
    assert got_near == [1, 2, 4]  # no signatures -> no near-dup drops

    # streaming twin parity on the same corpus
    import tempfile

    tmp = tempfile.mkdtemp(prefix="neardup_null_")
    try:
        docs_dir = f"{tmp}/in"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(docs_dir)
        q = run_neardup_ingest(
            spark, docs_dir, f"{tmp}/lake", f"{tmp}/sigs", f"{tmp}/ck"
        )
        q.awaitTermination()
        got_stream = sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{tmp}/lake").collect()
        )
        assert got_stream == got_near
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_neardup_ingest_null_id_doc_still_guards_neardups(spark, tmp_path):
    """Review finding (latent twin of the image-ingest bug): the
    signature was joined back on doc_id, so a NULL-id document with a
    real signature ledgered NULL slots and its future near-dups were
    exempt from dedup. Signing is now keyed on text_md5: the NULL-id
    doc's signature lands in the state and a near-dup arriving in a
    LATER batch is dropped."""
    docs_dir = str(tmp_path / "in")
    # batch 1: NULL-id long doc; batch 2: its near-dup + an unrelated doc
    spark.createDataFrame(
        [(None, BASE)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    spark.createDataFrame(
        [
            (7, BASE + " extra"),
            (8, "completely different words about spark shuffles"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(docs_dir)

    q = run_neardup_ingest(
        spark, docs_dir, str(tmp_path / "lake"), str(tmp_path / "sigs"),
        str(tmp_path / "ck"),
    )
    q.awaitTermination(300)

    sig_rows = spark.read.parquet(str(tmp_path / "sigs")).collect()
    # all three docs have >= 3 words: every ledger row carries slots,
    # INCLUDING the null-id doc's
    assert all(r["s0"] is not None for r in sig_rows)
    assert len(sig_rows) == 3
    lake_ids = sorted(
        (r["doc_id"] is None, r["doc_id"])
        for r in spark.read.parquet(str(tmp_path / "lake")).collect()
    )
    # null-id original retained; its near-dup (7) dropped; 8 kept
    assert lake_ids == [(False, 8), (True, None)]


@pytest.mark.slow
def test_neardup_ingest_null_id_neardup_arriving_later_is_dropped(
    spark, tmp_path
):
    """Twin of the image-ingest finding: a NULL-id near-duplicate of
    an already-ingested document must be dropped — the drop set is
    keyed on text_md5 (non-null) with a null-aware precedence
    predicate, since an id-keyed anti-join can never drop a NULL-key
    row."""
    docs_dir = str(tmp_path / "in")
    spark.createDataFrame(
        [(5, BASE)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    spark.createDataFrame(
        [(None, BASE + " extra")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(docs_dir)

    q = run_neardup_ingest(
        spark, docs_dir, str(tmp_path / "lake"), str(tmp_path / "sigs"),
        str(tmp_path / "ck"),
    )
    q.awaitTermination(300)
    lake = spark.read.parquet(str(tmp_path / "lake")).collect()
    assert [r["doc_id"] for r in lake] == [5]  # null-id near-dup dropped
    assert spark.read.parquet(str(tmp_path / "sigs")).count() == 2


def test_minhash_dedup_differential_zipfdup_corpus(spark):
    """r15: the near-dup family's decade smokes moved to the
    natural-vocabulary corpus with PLANTED duplicate clusters
    (tools/make_zipf_corpus, cluster_size/dup_pct) — this pins the
    operator against the python oracle on a small instance of exactly
    that corpus shape, so the scale measurement runs on an
    oracle-green distribution (wide Zipf vocabulary, ~30% exact+near
    duplicates, gray-zone pairs around tau included)."""
    from tools.make_zipf_corpus import zipf_documents

    d = zipf_documents(
        spark, 1200, vocab=4000, cluster_size=4, dup_pct=40
    ).select("doc_id", "text")
    rows = [(r.doc_id, r.text) for r in d.collect()]
    got = sorted(
        r.doc_id for r in minhash_dedup_frame(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    )
    want = minhash_dedup_oracle(rows)
    assert got == want
    # the corpus shape is non-trivial: some docs actually dropped
    assert 0 < len(got) < len(rows)
