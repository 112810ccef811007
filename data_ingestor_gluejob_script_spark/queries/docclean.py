"""Document-cleaning operators for training-data curation: corpus-level
line deduplication (the C4 recipe) and within-document repetition
metrics (the Gopher quality-rule family).

Reference parity note: the reference job (gluejob.py) has no text
curation at all — these operators extend the engine's LLM-pipeline
surface alongside queries/textops.py (exact/near dedup, contamination,
PII) and queries/corpusstats.py (repetition, spans, perplexity).

Both operators are implemented but NOT driver-registered (the
inventory gate is pinned at 50 — tests/test_inventory.py); they are
differentially tested against exact pure-Python oracles in
tests/test_docclean.py and benched via queries/extras.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LINE_DELIM = "\n"


def line_dedup_frame(
    docs: DataFrame,
    text_col: str = "text",
    delim: str = LINE_DELIM,
) -> DataFrame:
    """Corpus-level exact line deduplication, the C4 cleanup rule: every
    distinct line is kept exactly ONCE across the whole corpus — at its
    first occurrence in (doc_id, line position) order — and removed
    everywhere else; documents are reassembled from their surviving
    lines and documents left empty are dropped.

    Returns (doc_id, text, n_lines, n_kept) with ``text`` rebuilt from
    the kept lines joined by ``delim``.

    Scale shape (the skew-safe one):
    1. posexplode lines; key each line by md5 (the module's
       oracle-visible-hash convention — 128-bit, collision odds
       negligible; the hash decides which lines are "the same", so a
       64-bit internal key is NOT enough here).
    2. groupBy(line hash) → min(struct(doc_id, pos)): the argmin is
       computed with map-side partial aggregation, so a line occurring
       a billion times ("", boilerplate headers) ships at most one
       candidate row per input partition — no hot reducer.
    3. Winners join back LEFT SEMI on the UNIQUE triple
       (hash, doc_id, pos) — every corpus row has a distinct join key,
       so the keep/drop decision never co-locates the occurrences of a
       hot line (a plain join on the hash alone would funnel them into
       one task). Cost: the exploded corpus shuffles twice (once on
       hash, once on the triple) — that is the price of skew immunity,
       and it is the right trade at 100 TB where boilerplate lines are
       Zipf-distributed.
    4. groupBy(doc_id) + collect_list + array_sort rebuilds each doc;
       per-group state is one document's lines — bounded by document
       size, not corpus size.

    n_lines counts the doc's original lines so the caller can audit
    attrition without a second pass over the input.

    NULL text is treated as empty text (module-wide convention for
    the docclean rewrite/metric operators): split(NULL) is a NULL
    array whose explode emits NOTHING, so without the coalesce a
    null-text document would silently vanish from the output
    (round-9 review finding).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(text, delim)).alias("pos", "line"),
    ).select("doc_id", "pos", "line", F.md5("line").alias("_h"))

    winners = lines.groupBy("_h").agg(
        F.min(F.struct("doc_id", "pos")).alias("_first")
    )
    winner_keys = winners.select(
        "_h",
        F.col("_first.doc_id").alias("doc_id"),
        F.col("_first.pos").alias("pos"),
    )

    kept = lines.join(winner_keys, ["_h", "doc_id", "pos"], "left_semi")

    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            delim,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    return rebuilt.join(totals, "doc_id").select(
        "doc_id", "text", "n_lines", "n_kept"
    )


# Gopher-style repetition thresholds (Rae et al. 2021, table A1 uses
# per-n values; these two are representative and the frame exposes the
# raw fractions so callers can pick their own cut-offs).
TOP_BIGRAM_CHAR_FRAC_MAX = 0.20
DUP_TRIGRAM_CHAR_FRAC_MAX = 0.30


def gopher_repetition_frame(
    docs: DataFrame,
    text_col: str = "text",
    delim: str = LINE_DELIM,
) -> DataFrame:
    """Within-document repetition metrics, the Gopher quality-rule
    family (duplicate-line fraction, duplicate-line character fraction,
    top n-gram character fraction, duplicate n-gram character
    fraction). One row per document:

      doc_id, n_words, n_chars,
      dup_line_frac        = 1 - distinct_lines / lines
      dup_line_char_frac   = chars in lines occurring >1x / total chars
                             (every occurrence of a repeated line
                             counts, including the first)
      top_bigram           = most frequent word 2-gram (ties broken by
                             the lexicographically LARGEST gram — the
                             natural max_by(struct(cnt, gram)) order,
                             mirrored exactly by the oracle)
      top_bigram_char_frac = count(top_bigram) * chars(top_bigram)
                             / total chars, 0.0 when no bigram exists
      dup_trigram_char_frac= sum over trigrams with count >= 2 of
                             count * chars(trigram) / total chars,
                             capped at 1.0 (overlapping occurrences are
                             NOT position-unioned — the standard Gopher
                             approximation; the cap keeps the fraction
                             interpretable)

    total chars = length(text). Character counts of grams exclude the
    joining spaces' neighbours exactly as written: chars(gram) =
    length(gram) with words joined by a single space.

    Scale shape: one posexplode of typed units (line / 2-gram /
    3-gram) from pre-projected word arrays, then TWO partially
    aggregated shuffles — groupBy(doc_id, unit_type, unit) for counts,
    groupBy(doc_id) with conditional aggregates for the metrics. Unit
    counts are per-document, so both shuffles key on doc_id and are
    skew-bounded by document size, not corpus-wide unit popularity
    (contrast: corpus-level vocab in corpusstats.vocab_frame). A
    zero-shuffle per-doc-fold form was built (r14) and REVERTED for
    the same reason as repetition_frame's: filter pushdown substitutes
    the fold expressions into downstream predicates, re-inlining the
    whole upstream chain into HOF comparators (see repetition_frame's
    docstring for the jstack evidence); the aggregations are a
    pushdown-proof materialization barrier.

    NULL text is treated as empty text (docclean convention — the
    doc must appear in the metrics output, not silently vanish).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    ws = F.split(text, " ")
    base = docs.select(
        "doc_id",
        F.length(text).alias("n_chars"),
        F.size(ws).alias("n_words"),
        F.split(text, delim).alias("_lines"),
        ws.alias("_ws"),
    )

    def grams(n: int) -> Column:
        size = F.size(F.col("_ws"))
        idx = F.sequence(F.lit(0), size - F.lit(n))
        parts = lambda i: [F.col("_ws")[i + j] for j in range(n)]  # noqa: E731
        sh = F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
        return F.when(size >= F.lit(n), sh).otherwise(
            F.array().cast("array<string>")
        )

    units = base.select(
        "doc_id",
        "n_chars",
        "n_words",
        F.size("_lines").alias("n_lines"),
        F.explode(
            F.concat(
                F.transform(
                    F.col("_lines"), lambda ln: F.struct(
                        F.lit("l").alias("t"), ln.alias("u")
                    )
                ),
                F.transform(
                    grams(2), lambda g: F.struct(
                        F.lit("2").alias("t"), g.alias("u")
                    )
                ),
                F.transform(
                    grams(3), lambda g: F.struct(
                        F.lit("3").alias("t"), g.alias("u")
                    )
                ),
            )
        ).alias("_u"),
    ).select(
        "doc_id",
        "n_chars",
        "n_words",
        "n_lines",
        F.col("_u.t").alias("t"),
        F.col("_u.u").alias("u"),
    )

    counts = units.groupBy(
        "doc_id", "n_chars", "n_words", "n_lines", "t", "u"
    ).agg(F.count("*").alias("cnt"))

    is_line = F.col("t") == "l"
    is_bi = F.col("t") == "2"
    is_tri = F.col("t") == "3"
    chars_u = F.length("u")
    nc = F.col("n_chars")

    agg = counts.groupBy("doc_id", "n_chars", "n_words", "n_lines").agg(
        F.sum(F.when(is_line, 1).otherwise(0)).alias("_distinct_lines"),
        F.sum(
            F.when(is_line & (F.col("cnt") >= 2), F.col("cnt") * chars_u)
            .otherwise(F.lit(0))
        ).alias("_dup_line_chars"),
        F.max(
            F.when(is_bi, F.struct(F.col("cnt").alias("cnt"), F.col("u").alias("u")))
        ).alias("_top_bi"),
        F.sum(
            F.when(is_tri & (F.col("cnt") >= 2), F.col("cnt") * chars_u)
            .otherwise(F.lit(0))
        ).alias("_dup_tri_chars"),
    )

    safe_div = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num / den, 6)
    ).otherwise(F.lit(0.0))

    return agg.select(
        "doc_id",
        "n_words",
        "n_chars",
        safe_div(
            (F.col("n_lines") - F.col("_distinct_lines")).cast("double"),
            F.col("n_lines"),
        ).alias("dup_line_frac"),
        safe_div(F.col("_dup_line_chars").cast("double"), nc).alias(
            "dup_line_char_frac"
        ),
        F.col("_top_bi.u").alias("top_bigram"),
        safe_div(
            F.coalesce(
                F.col("_top_bi.cnt") * F.length(F.col("_top_bi.u")), F.lit(0)
            ).cast("double"),
            nc,
        ).alias("top_bigram_char_frac"),
        F.least(
            F.lit(1.0), safe_div(F.col("_dup_tri_chars").cast("double"), nc)
        ).alias("dup_trigram_char_frac"),
    )


DEDUP_SPAN_N = 8  # matches corpusstats.DUP_SPAN_N: long enough that a
# shared span is overwhelmingly real duplication


def dedup_spans_frame(
    docs: DataFrame,
    n: int = DEDUP_SPAN_N,
    text_col: str = "text",
) -> DataFrame:
    """Duplicate-span REMOVAL — the rewrite counterpart of
    corpusstats.duplicate_span_report, and the n-gram-granularity
    approximation of exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"; their
    suffix-array pass finds arbitrary-length repeats, this one finds
    repeats at word n-gram resolution, which composes with the
    engine's span-report and shuffles only hashes).

    Semantics: every word n-gram occurrence EXCEPT the global first
    occurrence (min (doc_id, pos) order) of an n-gram occurring >= 2
    times corpus-wide (within-doc repeats count) is redundant; the
    token positions covered by redundant occurrences (position UNION —
    overlapping spans don't double-remove) are dropped and each doc is
    rebuilt from its surviving tokens. Docs left empty are dropped;
    docs shorter than n words have no spans and pass through intact.
    Returns (doc_id, text, n_tokens, n_kept).

    Scale shape: exact text clones are collapsed FIRST (the semantic-
    dedup / minhash-dedup ordering): the gram pipeline runs on
    DISTINCT texts carrying their clone multiplicity, because a
    non-representative clone's fate is decidable without it — with
    >= n words its every gram has corpus count >= 2 and can never hold
    the global first occurrence (its representative holds the same
    gram at the same position under a smaller doc_id), so it is fully
    covered and dropped; with < n words it has no grams and passes
    through intact. A 20x-clone corpus therefore costs ~1x, not 20x
    (the pre-collapse version measured 6.9x — PLANS.md). On the
    distinct texts: gram occurrences travel as 8-byte xxhash64 keys
    (internal only — the oracle compares raw grams); the count
    (sum of multiplicities) + argmin reduce is partially aggregated,
    so a hot boilerplate gram ships one candidate per input partition;
    the classify join keys on the gram hash with a one-row-per-hash
    build side, so a hot gram costs one reducer a LINEAR pass (join
    output is occurrence-sized, never a cross product); coverage
    expansion is explode(sequence) — bounded by n per redundant
    occurrence; the rebuild groups by doc_id with per-group state
    bounded by document length.

    NULL text is treated as empty text (docclean convention; the
    clone-collapse digest and the split would otherwise silently drop
    the document — see line_dedup_frame)."""
    hashed = docs.select(
        "doc_id",
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
    ).withColumn("_h", F.md5(text_col))
    reps = hashed.groupBy("_h").agg(
        F.min("doc_id").alias("doc_id"),
        F.min(text_col).alias(text_col),  # all equal; min = deterministic
        F.count("*").alias("_mult"),
    )

    ws = F.split(F.col(text_col), " ")
    base = reps.select(
        "doc_id", "_mult", ws.alias("_ws"), F.size(ws).alias("n_tokens")
    )

    toks = base.select(
        "doc_id", "n_tokens", F.posexplode("_ws").alias("pos", "tok")
    )

    size = F.size(F.col("_ws"))
    idx = F.sequence(F.lit(0), size - F.lit(n))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", F.slice(F.col("_ws"), i + 1, n)
    )
    grams = (
        base.filter(size >= n)
        .select(
            "doc_id",
            "_mult",
            F.posexplode(
                F.transform(idx, lambda i: F.xxhash64(gram(i)))
            ).alias("gpos", "gh"),
        )
    )

    firsts = grams.groupBy("gh").agg(
        F.sum("_mult").alias("cnt"),
        F.min(F.struct("doc_id", "gpos")).alias("first"),
    )
    redundant = (
        grams.join(firsts, "gh")
        .filter(
            (F.col("cnt") >= 2)
            & ~(
                (F.col("first.doc_id") == F.col("doc_id"))
                & (F.col("first.gpos") == F.col("gpos"))
            )
        )
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + F.lit(n - 1))
            ).alias("pos"),
        )
        .distinct()
    )

    kept = toks.join(redundant, ["doc_id", "pos"], "left_anti")
    rebuilt = (
        kept.groupBy("doc_id", "n_tokens")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("text"),
            F.count("*").alias("n_kept"),
        )
        .select("doc_id", "text", "n_tokens", "n_kept")
    )
    # Non-representative clones: < n words -> no spans, intact (their
    # representative also survives — both lack grams); >= n words ->
    # fully covered, dropped (no row to emit).
    short_clones = (
        hashed.join(reps.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col(text_col).alias("text"),
            F.size(F.split(text_col, " ")).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") < n)
        .withColumn("n_kept", F.col("n_tokens"))
    )
    return rebuilt.unionByName(short_clones)


def gopher_filter(
    docs: DataFrame,
    text_col: str = "text",
    top_bigram_max: float = TOP_BIGRAM_CHAR_FRAC_MAX,
    dup_trigram_max: float = DUP_TRIGRAM_CHAR_FRAC_MAX,
) -> DataFrame:
    """Remove documents breaching the repetition thresholds — the
    composable filter form (semi-join of surviving ids onto the full
    document rows, same shape as textops.decontaminate)."""
    keep = (
        gopher_repetition_frame(docs, text_col)
        .filter(
            (F.col("top_bigram_char_frac") <= top_bigram_max)
            & (F.col("dup_trigram_char_frac") <= dup_trigram_max)
        )
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


# ---------------------------------------------------------------------------
# Gopher QUALITY rules (Rae et al. 2021, appendix A1.1) — the
# non-repetition half of the Gopher filter battery, beside the
# repetition family above. Defaults are the published thresholds; the
# frame exposes the raw (rounded) metrics so callers can recut.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_WORD_RATIO = 0.1
GOPHER_MAX_BULLET_LINE_FRAC = 0.90
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.30
GOPHER_MIN_ALPHA_WORD_FRAC = 0.80
GOPHER_MIN_STOP_WORD_HITS = 2
# the paper's required-stop-word list (>= 2 must appear as tokens)
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
# single-char bullet markers a line may start with (after space-ltrim)
GOPHER_BULLET_PREFIXES = ("•", "‣", "▪", "-", "*")


def _gopher_quality_metrics(
    text: Column, delim: str, prefix: str = "_"
) -> list[Column]:
    """The staging projection for the quality battery: the
    pre-projected token/line arrays plus the scalar char counts, all
    computed ONCE (textops HOF contract — every downstream metric
    reads the bound arrays, never re-splits). ``prefix`` names the
    staging columns so the filter form can dodge caller columns."""
    raw = F.split(text, "\\s+")
    return [
        text.alias(f"{prefix}text"),
        # drop empty tokens (leading/trailing whitespace splits to "")
        F.filter(raw, lambda w: w != F.lit("")).alias(f"{prefix}ws"),
        F.split(text, delim).alias(f"{prefix}lines"),
    ]


def _round6_div(num: Column, den: Column) -> Column:
    return F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))


def _gopher_quality_cols(prefix: str = "_") -> dict[str, Column]:
    """Metric expressions over the staged (text, ws, lines) columns
    under ``prefix``. Every metric is a JVM-side array/string
    expression — zero shuffle, zero Python."""
    ws, lines, text = (
        F.col(f"{prefix}ws"),
        F.col(f"{prefix}lines"),
        F.col(f"{prefix}text"),
    )
    n_words = F.size(ws).cast("double")
    n_lines = F.size(lines).cast("double")
    sum_len = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    # non-overlapping occurrence counts, the same greedy-left scan
    # str.count performs
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("...")))
    ) / 3 + (F.length(text) - F.length(F.replace(text, F.lit("…"))))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.substring(F.ltrim(l), 1, 1).isin(
                *GOPHER_BULLET_PREFIXES
            ),
        )
    ).cast("double")
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...")
            | F.rtrim(l).endswith("…"),
        )
    ).cast("double")
    alpha_words = F.size(
        F.filter(ws, lambda w: w.rlike("[A-Za-z]"))
    ).cast("double")
    stop_hits = F.size(
        F.array_intersect(
            F.transform(ws, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOP_WORDS]),
        )
    )
    return {
        "n_words": F.size(ws),
        "mean_word_len": _round6_div(sum_len.cast("double"), n_words),
        "hash_word_ratio": _round6_div(n_hash.cast("double"), n_words),
        "ellipsis_word_ratio": _round6_div(n_ellipsis.cast("double"), n_words),
        "bullet_line_frac": _round6_div(bullet_lines, n_lines),
        "ellipsis_line_frac": _round6_div(ellipsis_lines, n_lines),
        "alpha_word_frac": _round6_div(alpha_words, n_words),
        "stop_word_hits": stop_hits,
    }


def _gopher_quality_kept(
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_ratio: float,
    max_bullet_frac: float,
    max_ellipsis_frac: float,
    min_alpha_frac: float,
    min_stop_hits: int,
    metrics: dict[str, Column] | None = None,
) -> Column:
    """The conjunction over the EMITTED (rounded) metric columns, so
    the keep decision is reproducible from the frame's own output
    (and the python oracle compares on identically-rounded values —
    the dyadic-edge convention the repetition oracle established).
    ``metrics`` supplies the metric EXPRESSIONS directly (the filter
    form, which never materializes named metric columns); None reads
    the frame's named columns."""
    m = metrics if metrics is not None else {
        n: F.col(n) for n in _gopher_quality_cols()
    }
    return (
        m["n_words"].between(min_words, max_words)
        & m["mean_word_len"].between(
            min_mean_word_len, max_mean_word_len
        )
        & (m["hash_word_ratio"] <= max_symbol_ratio)
        & (m["ellipsis_word_ratio"] <= max_symbol_ratio)
        & (m["bullet_line_frac"] <= max_bullet_frac)
        & (m["ellipsis_line_frac"] <= max_ellipsis_frac)
        & (m["alpha_word_frac"] >= min_alpha_frac)
        & (m["stop_word_hits"] >= min_stop_hits)
    )


def gopher_quality_frame(
    docs: DataFrame,
    text_col: str = "text",
    delim: str = LINE_DELIM,
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_word_len: float = GOPHER_MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = GOPHER_MAX_MEAN_WORD_LEN,
    max_symbol_ratio: float = GOPHER_MAX_SYMBOL_WORD_RATIO,
    max_bullet_frac: float = GOPHER_MAX_BULLET_LINE_FRAC,
    max_ellipsis_frac: float = GOPHER_MAX_ELLIPSIS_LINE_FRAC,
    min_alpha_frac: float = GOPHER_MIN_ALPHA_WORD_FRAC,
    min_stop_hits: int = GOPHER_MIN_STOP_WORD_HITS,
) -> DataFrame:
    """Gopher QUALITY rule battery (Rae et al. 2021, A1.1) — the
    published non-repetition document filters, one row per document:

      doc_id, n_words           whitespace tokens (empties dropped)
      mean_word_len             sum(len(word)) / n_words
      hash_word_ratio           '#' occurrences / n_words
      ellipsis_word_ratio       ('...' + '…' occurrences) / n_words
      bullet_line_frac          lines starting (space-ltrimmed) with a
                                bullet marker / lines
      ellipsis_line_frac        lines ending (space-rtrimmed) in an
                                ellipsis / lines
      alpha_word_frac           words containing [A-Za-z] / n_words
      stop_word_hits            distinct members of the 8-word Gopher
                                stop list present as lowercased tokens
      kept                      the full conjunction at the given
                                thresholds (paper defaults: 50..100k
                                words, mean word length 3..10, symbol
                                ratios <= 0.1, bullets <= 90% of
                                lines, ellipsis lines <= 30%, >= 80%
                                alpha words, >= 2 stop words)

    All fractions are round(x, 6) and the keep decision is computed
    FROM the rounded values, so the frame's output is self-consistent
    and the python oracle mirrors bit-for-bit (the dyadic-edge
    convention of gopher_repetition_frame). Degenerate docs (no
    words / empty text) carry 0.0 ratios and fail the word-count
    bound.

    Plan shape: pure Catalyst, shuffle-free — one staging projection
    binds the token and line arrays (the package HOF contract), every
    metric is an array fold/filter/string expression over them. At
    100 TB this fuses into the scan, exactly like c4_line_filter_frame.

    NULL text is treated as empty text (docclean convention — the doc
    appears in the output with kept=false, it does not vanish)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    staged = docs.select(
        "doc_id", *_gopher_quality_metrics(text, delim)
    )
    m = _gopher_quality_cols()
    return staged.select(
        "doc_id", *[c.alias(n) for n, c in m.items()]
    ).select(
        "*",
        _gopher_quality_kept(
            min_words,
            max_words,
            min_mean_word_len,
            max_mean_word_len,
            max_symbol_ratio,
            max_bullet_frac,
            max_ellipsis_frac,
            min_alpha_frac,
            min_stop_hits,
        ).alias("kept"),
    )


def gopher_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    delim: str = LINE_DELIM,
    **thresholds,
) -> DataFrame:
    """Composable filter form: the full document rows with the
    quality-failing pages dropped. Genuinely join-free (contrast
    gopher_filter, whose repetition metrics need aggregation): the
    battery is map-only, so the kept predicate evaluates inline over
    staged arrays and the corpus's other columns ride for free —
    same shape as c4_filter. No id column is required and caller
    column names never collide: the staging columns pick a prefix the
    frame doesn't use, and the metrics are composed as expressions,
    never materialized under their names (round-12 review fix — the
    old collision fallback semi-joined on a doc_id the join-free
    contract never promised)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    prefix, i = "_gq_", 0
    while any(
        f"{prefix}{s}" in docs.columns for s in ("text", "ws", "lines")
    ):
        prefix, i = f"_gq{i}_", i + 1
    staged = docs.select(
        "*", *_gopher_quality_metrics(text, delim, prefix)
    )
    m = _gopher_quality_cols(prefix)
    defaults = dict(
        min_words=GOPHER_MIN_WORDS,
        max_words=GOPHER_MAX_WORDS,
        min_mean_word_len=GOPHER_MIN_MEAN_WORD_LEN,
        max_mean_word_len=GOPHER_MAX_MEAN_WORD_LEN,
        max_symbol_ratio=GOPHER_MAX_SYMBOL_WORD_RATIO,
        max_bullet_frac=GOPHER_MAX_BULLET_LINE_FRAC,
        max_ellipsis_frac=GOPHER_MAX_ELLIPSIS_LINE_FRAC,
        min_alpha_frac=GOPHER_MIN_ALPHA_WORD_FRAC,
        min_stop_hits=GOPHER_MIN_STOP_WORD_HITS,
    )
    defaults.update(thresholds)
    return staged.filter(
        _gopher_quality_kept(metrics=m, **defaults)
    ).select(*docs.columns)


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020, §2.2). The C4 recipe has
# three independent parts: the LINE rules and PAGE rules below, the
# corpus-level line dedup (line_dedup_frame above), and the
# three-sentence-span dedup (dedup_spans_frame covers the span family).
# The bad-words page rule is deliberately NOT shipped: it needs a
# licensed blocklist; callers can compose it as one more
# lower(text)-contains term in a wrapping filter.

C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
# A line must end in terminal punctuation (C4: period, exclamation,
# question mark, or closing quotation mark) after trimming. Tested as
# a last-CHARACTER check, not a regex anchor: substring(-1, 1) stays
# in whole-stage codegen with no regex engine, and — unlike Java's
# bare `$`, which matches just before a trailing \r — it sees the
# absolute last code point, so a CR-terminated line correctly fails
# (pinned by tests/test_c4.py).
_C4_TERMINAL_CHARS = list('.!?"”')


def c4_line_filter_frame(
    docs: DataFrame,
    text_col: str = "text",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_kept_lines: int = C4_MIN_KEPT_LINES,
    delim: str = LINE_DELIM,
) -> DataFrame:
    """C4-style line filtering, one row per input document:

      doc_id, text_clean, n_lines, n_kept_lines,
      has_lorem_ipsum, has_brace, page_kept

    Line rules (a line survives iff ALL hold, evaluated on the
    space-trimmed line):
      - ends in terminal punctuation (``. ! ? " ”``)
      - has at least ``min_line_words`` whitespace-separated words
      - does not contain the word "javascript" (case-insensitive) —
        the cookie-banner / JS-warning heuristic

    Page rules (flags emitted; ``page_kept`` combines them so callers
    can filter or audit):
      - no "lorem ipsum" (case-insensitive) anywhere on the page
      - no "{" anywhere (code, not prose)
      - at least ``min_kept_lines`` surviving lines (C4 uses three
        SENTENCES; surviving terminal-punctuated lines are the
        line-granular stand-in, documented divergence)

    ``text_clean`` is the surviving lines re-joined with the delimiter
    (empty string when nothing survives — the doc still appears, the
    caller decides with ``page_kept``).

    Plan shape: pure Catalyst, shuffle-free — split, one HOF filter
    whose lambda closes only over its own variable (the PLANS HOF
    contract), array_join, and scalar flags. The split lines and the
    surviving-lines array are PRE-PROJECTED once each (the textops
    HOF contract: the filter breaks codegen and every later reference
    would re-run it — three consumers here), so each document is
    split and filtered exactly once. Linear in corpus bytes; at
    100 TB this is a map stage fused into whatever scan feeds it.

    NULL text is treated as empty text (docclean convention — the doc
    must appear in the output, not silently vanish).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    staged = docs.select(
        "doc_id",
        text.alias("_text"),
        F.split(text, delim).alias("_lines"),
    ).select(
        "doc_id",
        "_text",
        "_lines",
        _c4_kept_lines(F.col("_lines"), min_line_words).alias("_kept"),
    )
    return staged.select(
        "doc_id",
        F.array_join("_kept", delim).alias("text_clean"),
        F.size("_lines").alias("n_lines"),
        F.size("_kept").alias("n_kept_lines"),
        F.lower(F.col("_text")).contains("lorem ipsum").alias(
            "has_lorem_ipsum"
        ),
        F.col("_text").contains("{").alias("has_brace"),
        _c4_page_kept(
            F.col("_text"), F.col("_kept"), min_kept_lines
        ).alias("page_kept"),
    )


def _c4_kept_lines(lines: Column, min_line_words: int) -> Column:
    """Surviving-lines array from a PRE-PROJECTED split-lines array
    (textops HOF contract — never pass an inline split). The lambda
    closes only over its own variable; thresholds are baked in as
    literals."""

    def keep_line(l: Column) -> Column:
        t = F.trim(l)
        n_words = F.size(F.split(t, " +"))
        return (
            F.substring(t, -1, 1).isin(*_C4_TERMINAL_CHARS)
            & (n_words >= F.lit(min_line_words))
            & ~F.lower(t).contains("javascript")
        )

    return F.filter(lines, keep_line)


def _c4_page_kept(text: Column, kept: Column, min_kept_lines: int) -> Column:
    return (
        ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
        & (F.size(kept) >= F.lit(min_kept_lines))
    )


def c4_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_kept_lines: int = C4_MIN_KEPT_LINES,
    delim: str = LINE_DELIM,
) -> DataFrame:
    """The composable filter form: full document rows with ``text_col``
    REPLACED by the line-filtered text, pages failing the page rules
    dropped. Genuinely join-free — the surviving-lines array is
    pre-projected alongside the full rows, never joined back, so the
    corpus's other columns ride for free at 100 TB. Catalyst pushes
    the page predicate below the projection, so dropped pages pay the
    line filter once and never pay the rebuild; surviving pages pay
    it twice (predicate + array_join) — the right side of that trade
    for a filter whose point is dropping most of a crawl."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    # collision-proof temp names: the input may itself carry columns
    # from an earlier staging step
    kept_col, page_col = "_kept", "_page_kept"
    while kept_col in docs.columns:
        kept_col += "_"
    while page_col in docs.columns:
        page_col += "_"
    staged = docs.select(
        "*",
        _c4_kept_lines(F.split(text, delim), min_line_words).alias(kept_col),
    )
    kept = F.col(kept_col)
    out = [
        F.array_join(kept, delim).alias(text_col) if c == text_col else F.col(c)
        for c in docs.columns
    ]
    return staged.select(*out, _c4_page_kept(text, kept, min_kept_lines).alias(
        page_col
    )).filter(F.col(page_col)).drop(page_col)
