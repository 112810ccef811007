"""Distributed n-gram language-model quality scoring with Stupid
Backoff (Brants et al. 2007, "Large Language Models in Machine
Translation") — the backoff scheme DESIGNED for distributed corpora:
no discounting or normalization pass, so the model is nothing but
relative frequencies over n-gram count tables, and both training and
scoring stay embarrassingly data-parallel.

Reference parity note: the reference job (gluejob.py) has no LM
scoring — this extends the CCNet-style quality-filter family in
queries/corpusstats.py (``unigram_logprob_frame``) from a unigram
stand-in to the real thing: a trigram model whose score

  S(w_i | w_{i-2} w_{i-1}) =
      count(w_{i-2} w_{i-1} w_i) / count(w_{i-2} w_{i-1})   if seen
      alpha * count(w_{i-1} w_i) / count(w_{i-1})           elif seen
      alpha^2 * count(w_i) / N                              else

with alpha = 0.4 (the paper's value) and the unigram-level OOV floor
0.5 / N shared with the unigram scorer. Early positions start at the
highest order they have context for (position 0 scores as a unigram
with no penalty, position 1 starts at the bigram level), so every
token contributes exactly one factor and documents of any length get
a well-defined mean log-probability.

Scale shape (the 100-TB story):

- **Training** (``ngram_counts``): ONE projection builds the per-
  position gram strings for every level as array columns, one explode
  unions the levels, one partially-aggregated groupBy(n, gram) counts
  them — a single shuffle keyed on the gram string. No per-token rows
  ever carry the whole word array (the O(len^2) row-width trap the
  sf10 scale smoke caught in the signature family).
- **Scoring** (``stupid_backoff_logprob_frame``): each token needs
  five counts (trigram, its context, bigram, its context, unigram),
  but only THREE are looked up — the two context denominators are
  exactly the previous position's bigram/unigram counts, recovered
  with a per-doc lag window after the pivot. The three lookups are
  melted to (doc_id, pos, role, hash) rows keyed on the 8-byte
  xxhash64 of (level, gram) — the join shuffle never carries gram
  text — and resolved in ONE left join against the hashed count
  table: no join hint, so AQE broadcasts the table when it fits and
  falls back to a hash-keyed shuffle join when a 100-TB corpus's
  gram table does not (Brants et al. shard their tables the same
  way). The lookups pivot back with one groupBy(doc_id, pos), the
  lag window shuffles once on doc_id (skew-bounded by document
  length), and the final groupBy(doc_id) reduces to per-document
  means.
- Self-scoring (grams=None) reads the corpus twice — once to count,
  once to score; at scale, persist the count table between passes.

Differential: tests/test_lm.py scores handcrafted + sf0.001 corpora
against an exact pure-python oracle (dict counts, same OOV floor,
same early-position order start).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textops import words_col

SB_ALPHA = 0.4
OOV_COUNT = 0.5
N_MAX = 3


def ngram_counts(
    docs: DataFrame, n_max: int = N_MAX, text_col: str = "text"
) -> DataFrame:
    """(n, gram, cnt) for every 1..n_max-gram of the space-joined word
    stream — one shuffle, partial aggregation upstream of it. NULL
    text is one empty token (the unigram scorer's convention)."""
    ws = docs.select(
        words_col(F.coalesce(F.col(text_col), F.lit(""))).alias("_ws")
    )

    def level(n: int) -> Column:
        # grams of one order as an array; empty when the doc is short
        size = F.size(F.col("_ws"))
        idx = F.sequence(F.lit(0), size - F.lit(n))
        parts = lambda i: [F.col("_ws")[i + j] for j in range(n)]  # noqa: E731
        arr = F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
        with_n = F.transform(
            arr, lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))
        )
        return F.when(size >= F.lit(n), with_n).otherwise(
            F.array().cast("array<struct<n:int,gram:string>>")
        )

    all_levels = F.concat(*[level(n) for n in range(1, n_max + 1)])
    return (
        ws.select(F.explode(all_levels).alias("g"))
        .groupBy(F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .agg(F.count("*").alias("cnt"))
    )


# The three lookup roles, each with the count-table level it joins at
# (context denominators come from the previous position's bi/uni via a
# per-doc lag, not from extra lookups).
_ROLES = [("tri", 3), ("bi", 2), ("uni", 1)]


def stupid_backoff_logprob_frame(
    docs: DataFrame,
    grams: DataFrame | None = None,
    alpha: float = SB_ALPHA,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob, ppl): per-document mean natural-
    log Stupid Backoff score and its perplexity, the trigram upgrade of
    ``unigram_logprob_frame`` (same output shape, same 6-dp rounding).
    Pass ``grams`` (from ``ngram_counts`` over a reference corpus) to
    score web text under e.g. a Wikipedia model — the CCNet setup; OOV
    then floors at 0.5 / N like the unigram scorer."""
    if grams is None:
        grams = ngram_counts(docs, N_MAX, text_col)
    total = grams.filter(F.col("n") == 1).agg(
        F.sum("cnt").cast("double").alias("_total")
    )

    ws = docs.select(
        "doc_id",
        words_col(F.coalesce(F.col(text_col), F.lit(""))).alias("_ws"),
    )
    # One struct per position carrying the gram keys ENDING there;
    # early positions leave higher-order keys NULL (concat_ws would
    # silently DROP a null word and alias the bigram onto a unigram
    # string, so the when-guards are load-bearing). The two DENOMINATOR
    # grams are not looked up at all: count(w_{i-2} w_{i-1}) is exactly
    # position i-1's bigram count and count(w_{i-1}) its unigram count,
    # recovered below with a per-doc lag window — 3 join rows per token
    # instead of 5.
    w = lambda i: F.col("_ws")[i]  # noqa: E731
    pos_structs = F.transform(
        F.sequence(F.lit(0), F.size(F.col("_ws")) - F.lit(1)),
        lambda i: F.struct(
            i.alias("pos"),
            w(i).alias("uni"),
            F.when(i >= 1, F.concat_ws(" ", w(i - 1), w(i))).alias("bi"),
            F.when(
                i >= 2, F.concat_ws(" ", w(i - 2), w(i - 1), w(i))
            ).alias("tri"),
        ),
    )
    toks = ws.select("doc_id", F.explode(pos_structs).alias("t")).select(
        "doc_id", "t.*"
    )

    # Melt the <=3 lookups per token and resolve them in ONE left join
    # (AQE picks broadcast vs shuffle by table size), keyed on the
    # 8-byte xxhash64 of (level, gram) rather than the gram string —
    # the join shuffle carries fixed-width hashes, never text (the
    # hashed-inverted-index pattern from the Jaccard family). A
    # cross-gram hash collision merges two counts; at corpus scale the
    # expected collision count is n_grams^2 / 2^65 — vanishing relative
    # error for a quality SCORE (this is the randomized-LM trade from
    # the distributed-LM literature, and the exactness differentials
    # run at collision-free test scale).
    # xxhash64 is TYPE-sensitive: a reloaded count table whose ``n``
    # widened to long would silently hash every gram differently from
    # the int literals on the melt side, so both sides pin int.
    hashed = grams.select(
        F.xxhash64(F.col("n").cast("int"), "gram").alias("gh"), "cnt"
    )
    melted = toks.select(
        "doc_id",
        "pos",
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(role).alias("role"),
                            F.xxhash64(F.lit(n), F.col(role)).alias("gh"),
                            F.col(role).isNotNull().alias("present"),
                        )
                        for role, n in _ROLES
                    ]
                ),
                lambda s: s["present"],
            )
        ).alias("l"),
    ).select("doc_id", "pos", "l.role", "l.gh")
    looked = melted.join(hashed, "gh", "left")
    counts = looked.groupBy("doc_id", "pos").agg(
        *[
            F.max(F.when(F.col("role") == role, F.col("cnt"))).alias(
                f"c_{role}"
            )
            for role, _ in _ROLES
        ]
    )
    # Denominators via per-doc lag: the window shuffles (doc_id)-keyed
    # narrow rows once and is skew-bounded by document length (the
    # gopher argument), far cheaper than 2 more join rows per token.
    prev = Window.partitionBy("doc_id").orderBy("pos")
    counts = counts.select(
        "doc_id",
        "pos",
        "c_tri",
        "c_bi",
        "c_uni",
        F.lag("c_bi").over(prev).alias("c_bctx"),
        F.lag("c_uni").over(prev).alias("c_uctx"),
    )

    top_order = F.least(F.col("pos") + 1, F.lit(3))
    a = lambda k: F.pow(F.lit(alpha), k)  # noqa: E731
    uni_score = (
        F.coalesce(F.col("c_uni").cast("double"), F.lit(OOV_COUNT))
        / F.col("_t")
    )
    score = (
        F.when(
            (top_order == 3) & F.col("c_tri").isNotNull(),
            F.col("c_tri") / F.col("c_bctx"),
        )
        .when(
            (top_order >= 2) & F.col("c_bi").isNotNull(),
            a(top_order - 2) * F.col("c_bi") / F.col("c_uctx"),
        )
        .otherwise(a(top_order - 1) * uni_score)
    )
    lp = counts.crossJoin(
        F.broadcast(total.select(F.col("_total").alias("_t")))
    ).select("doc_id", F.log(score).alias("lp"))
    return lp.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
        F.round(F.exp(-F.avg("lp")), 6).alias("ppl"),
    )


def stupid_backoff_filter(
    docs: DataFrame,
    grams: DataFrame | None = None,
    max_ppl: float = 1_000.0,
    text_col: str = "text",
) -> DataFrame:
    """The composable filter form (CCNet keeps the low-perplexity
    head/middle of the distribution): full document rows whose model
    perplexity is at most ``max_ppl`` — semi-join of surviving ids,
    same shape as docclean.gopher_filter."""
    keep = (
        stupid_backoff_logprob_frame(docs, grams, text_col=text_col)
        .filter(F.col("ppl") <= max_ppl)
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")
