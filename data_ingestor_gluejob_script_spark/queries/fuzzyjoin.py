"""Edit-distance fuzzy join (record linkage) via prefix-filtered
positional q-grams — the Ed-Join family (Gravano et al., VLDB 2001
count filtering; Xiao et al., VLDB 2008 prefix filtering), expressed
as Catalyst joins so candidate generation never goes near an
all-pairs product.

Reference parity note: the reference job (gluejob.py) joins only on
exact keys; this module extends the engine's curation surface with
the approximate-match twin — matching dirty source records (typos,
OCR noise, vendor feeds) against a clean dimension is the classic
ingest-side linkage step the exact joins cannot express.

Why not a cartesian + ``levenshtein``: at corpus scale the verify
step must only ever see candidate slivers. The standard banding for
edit distance is q-gram prefix filtering:

* Pad each string with q-1 sentinel chars on both ends and take all
  positional q-grams; one edit operation (sub/ins/del) destroys at
  most q of them, so ``ed(a,b) <= d`` implies the gram MULTISETS
  overlap in at least ``max(|Ga|,|Gb|) - q*d`` grams (count filter).
* Make multiset overlap a set problem by tokenizing each occurrence:
  the token ``(gram, k)`` stands for "the k-th occurrence of gram" —
  token-set intersection size equals multiset intersection size.
* Order all tokens by ascending global document frequency (rare
  first, ties by token). With overlap threshold
  ``t = max(|Ga|,|Gb|) - q*d``, the classic prefix-filter theorem
  says the first ``|G| - t + 1 <= q*d + 1`` tokens of each side must
  share at least one token — so an equi-join on PREFIX tokens alone
  generates every surviving pair.
* Verify candidates with the built-in ``F.levenshtein`` (JVM-side
  DP) after a length-band cut ``|len_a - len_b| <= d``.

Short-string degeneracy: when BOTH strings have at most ``q*d``
grams (len <= q*d - q + 1; 3 chars at q=2, d=2), the count filter is
vacuous — "a" and "b" are within distance 2 yet share zero grams, so
no gram join can see the pair. Those rows get a separate arm:
all-pairs over the DISTINCT short VALUES (bounded by the alphabet —
at most |alphabet|^3 distinct strings regardless of corpus size, so
the quadratic is over a dictionary, not the data), then mapped back
to ids through the value table. The prefix arm still handles every
short-vs-long pair (the long side's gram count keeps t >= 1).

Scale shape: one shuffle builds the (gram, occ) document-frequency
table (bounded by gram vocabulary), one groupBy(id) builds per-row
prefixes, the candidate join shuffles 8-ish-byte tokens (never
payloads), and the verify join rides candidate ids only. No window
is unpartitioned; no driver state beyond Catalyst literals.

NULL handling (package convention): NULL strings cannot match
anything (unknown, not empty) — they are dropped from both sides and
never appear in the output; the empty string is a real value and
matches within distance of other short strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Sentinels outside any realistic payload alphabet; q-1 copies pad
# each end so boundary characters carry full gram weight (and every
# non-empty string has at least q grams' worth of context).
_PAD_L = "\x01"
_PAD_R = "\x02"


def _gram_tokens(df: DataFrame, str_col: str, q: int) -> DataFrame:
    """(id, side, len, gram, occ): positional q-grams of the padded
    string, tokenized per occurrence (occ = 0-based index of this
    gram's repetition within the string, in position order).

    The gram slice is pure Catalyst (sequence + transform +
    substring); the occurrence index is a window partitioned by
    (id, side, gram) — many small partitions, never one global sort.
    """
    padded = F.concat(
        F.lit(_PAD_L * (q - 1)), F.col(str_col), F.lit(_PAD_R * (q - 1))
    )
    grams = df.select(
        "id",
        "side",
        F.length(str_col).alias("len"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length(padded) - (q - 1)),
                lambda i: padded.substr(i, F.lit(q)),
            )
        ).alias("pos", "gram"),
    )
    occ = Window.partitionBy("id", "side", "gram").orderBy("pos")
    return grams.select(
        "id",
        "side",
        "len",
        "gram",
        (F.row_number().over(occ) - 1).alias("occ"),
    )


def _prefix_tokens(tokens: DataFrame, q: int, max_dist: int) -> DataFrame:
    """(id, side, len, gram, occ) cut to each row's prefix: the first
    ``q*max_dist + 1`` tokens in ascending (global df, gram, occ)
    order. One bounded aggregation builds the df table (distinct
    (gram, occ) pairs — vocabulary-sized, so the join back is a
    broadcast candidate for AQE); one groupBy(id) collects, sorts and
    slices the per-row token array driver-free."""
    # A (gram, occ) token appears at most once per string (occ indexes
    # within-string repetitions), so plain count IS document frequency
    # — no distinct aggregate needed.
    df_tab = tokens.groupBy("gram", "occ").agg(
        F.count(F.lit(1)).alias("df")
    )
    plen = q * max_dist + 1
    ranked = tokens.join(df_tab, ["gram", "occ"])
    return (
        ranked.groupBy("id", "side", "len")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct("df", "gram", "occ"))
                ),
                1,
                plen,
            ).alias("pref")
        )
        .select(
            "id",
            "side",
            "len",
            F.explode("pref").alias("t"),
        )
        .select("id", "side", "len", F.col("t.gram"), F.col("t.occ"))
    )


def _short_value_pairs(
    vals: DataFrame, max_dist: int, self_mode: bool
) -> DataFrame:
    """(id_a, id_b) from the short-string arm: all-pairs over DISTINCT
    short values (dictionary-sized — at most |alphabet|**(q*d-q+1)
    strings exist at that length, independent of corpus size), then
    the value-pair survivors fan back out to ids. ``vals`` is
    (id, side, s) already cut to short rows."""
    dv = vals.select("s").distinct()
    pairs = (
        dv.alias("a")
        .join(
            # Explicit broadcast: the short-value dictionary is
            # alphabet-bounded, and without the hint Spark would plan
            # this non-equi inner join as a CartesianProduct (the
            # package-wide forbidden node) whenever stats are unknown.
            F.broadcast(dv.alias("b")),
            F.levenshtein(F.col("a.s"), F.col("b.s")) <= max_dist,
        )
        .select(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
    )
    left = vals.filter(F.col("side") == 0) if not self_mode else vals
    right = vals.filter(F.col("side") == 1) if not self_mode else vals
    out = (
        pairs.join(left.withColumnRenamed("s", "sa"), "sa")
        .select(F.col("id").alias("id_a"), "sb")
        .join(right.withColumnRenamed("s", "sb"), "sb")
        .select("id_a", F.col("id").alias("id_b"))
    )
    if self_mode:
        out = out.filter(F.col("id_a") < F.col("id_b"))
    return out


def _fuzzy_pairs(
    tagged: DataFrame, q: int, max_dist: int, self_mode: bool
) -> DataFrame:
    """Candidate (id_a, id_b) pairs from both arms, distinct.

    ``tagged`` is (id, side, s) with NULLs already dropped. Prefix
    arm: equi-join on (gram, occ) over prefix tokens with the length
    band in the join condition; short arm: see _short_value_pairs.
    """
    toks = _prefix_tokens(
        _gram_tokens(tagged.select("id", "side", F.col("s")), "s", q),
        q,
        max_dist,
    )
    a, b = toks.alias("a"), toks.alias("b")
    cond = (
        (F.col("a.gram") == F.col("b.gram"))
        & (F.col("a.occ") == F.col("b.occ"))
        & (
            F.abs(F.col("a.len") - F.col("b.len"))
            <= F.lit(max_dist)
        )
    )
    if self_mode:
        cond = cond & (F.col("a.id") < F.col("b.id"))
    else:
        cond = cond & (F.col("a.side") == 0) & (F.col("b.side") == 1)
    pref_pairs = (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    # Short-short rescue arm: both gram counts <= q*d  <=>  both
    # lengths <= q*d - q + 1 (padded gram count = len + q - 1).
    short_len = q * max_dist - q + 1
    shorts = tagged.filter(F.length("s") <= short_len)
    short_pairs = _short_value_pairs(shorts, max_dist, self_mode)
    return pref_pairs.union(short_pairs).distinct()


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Record linkage: every (left, right) row pair whose ``str_col``
    values are within Levenshtein distance ``max_dist``.

    Returns (id_a, id_b, s_a, s_b, dist) where a is the left side —
    sorted-friendly, payload-free (join the ids back for more
    columns). ids must be unique per side."""
    lt = left.select(
        F.col(id_col).alias("id"), F.lit(0).alias("side"),
        F.col(str_col).alias("s"),
    ).filter(F.col("s").isNotNull())
    rt = right.select(
        F.col(id_col).alias("id"), F.lit(1).alias("side"),
        F.col(str_col).alias("s"),
    ).filter(F.col("s").isNotNull())
    tagged = lt.union(rt)
    cands = _fuzzy_pairs(tagged, q, max_dist, self_mode=False)
    return (
        cands.join(lt.select(F.col("id").alias("id_a"),
                             F.col("s").alias("s_a")), "id_a")
        .join(rt.select(F.col("id").alias("id_b"),
                        F.col("s").alias("s_b")), "id_b")
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "s_a", "s_b", "dist")
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Near-duplicate value pairs within one table: (id_a, id_b, s_a,
    s_b, dist) with id_a < id_b and levenshtein(s_a, s_b) <=
    max_dist. The dedup-by-name / conform-the-dimension shape."""
    t = df.select(
        F.col(id_col).alias("id"), F.lit(0).alias("side"),
        F.col(str_col).alias("s"),
    ).filter(F.col("s").isNotNull())
    cands = _fuzzy_pairs(t, q, max_dist, self_mode=True)
    named = t.select("id", "s")
    return (
        cands.join(
            named.select(F.col("id").alias("id_a"),
                         F.col("s").alias("s_a")), "id_a")
        .join(named.select(F.col("id").alias("id_b"),
                           F.col("s").alias("s_b")), "id_b")
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "s_a", "s_b", "dist")
    )
