"""Unicode text normalization for web-scale corpus ingestion: NFC
canonicalization, control/zero-width stripping, whitespace
canonicalization, and a mojibake signal.

Reference parity note: the reference job (gluejob.py) has no text
curation at all — this module extends the engine's LLM-pipeline
surface alongside queries/docclean.py (C4 line rules, Gopher
repetition) and queries/quality.py (compression/entropy signals).
Every serious web pipeline normalizes text BEFORE hashing or
tokenizing (CCNet, Dolma, and fastText's preprocessing all do a
variant of this): two visually-identical documents that differ only
in NFC form, zero-width characters, or CRLF line endings would
otherwise evade exact dedup and fragment the BPE vocabulary.

What one pass does, in order (order matters and the oracle twin in
tests/test_textnorm.py mirrors it exactly):

1. NFC normalization (composed canonical form — é as one code point).
2. Line-separator canonicalization: CRLF / CR / NEL / LS / PS → LF.
3. Zero-width & format-char strip: ZWSP ZWNJ ZWJ WJ BOM soft-hyphen.
4. Control-char strip: C0 except tab/newline, DEL, remaining C1.
5. Space canonicalization: NBSP / NNBSP / MMSP / ideographic space /
   U+2000-200A → ASCII space.
6. Horizontal-run collapse: runs of [space tab] → one space; spaces
   touching a newline dropped; 3+ blank lines → one blank line; outer
   strip. (Step 6 is the only lossy-on-purpose step and can be turned
   off with ``collapse_whitespace=False`` for code-like corpora where
   indentation is signal.)

The ``mojibake_hits`` column counts the classic UTF-8-read-as-Latin-1
markers (``Ã``, ``Â``, ``â€``) on the RAW text — a cheap, standard
triage signal for double-encoding damage (the fix is a re-decode at
the source, not a rewrite here, so the operator only counts).

Plan shape: one Arrow-batched ``mapInPandas`` pass over (id, text)
pruned input — every step is per-row pandas ``.str`` work with no
cross-row state, so the operator is an embarrassingly parallel map:
no shuffle, no driver state, linear in corpus bytes, and batch
boundaries / partitioning provably cannot change the output. The
100-TB story is the same as quality.compression_signals_frame: the
corpus's other columns never leave the JVM in the report form, and
``with_normalized_text`` trades double Arrow transfer against a
corpus-side join when the very next stage consumes the text.

NULL handling (docclean/quality convention): NULL text → NULL
outputs (unknown, not empty); empty text → empty text_norm with
changed = False and mojibake_hits = 0.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

NORM_SCHEMA = "text_norm string, changed boolean, mojibake_hits int"

# Step 2: everything that renders as a line break becomes LF. NEL
# (U+0085) must be handled here, BEFORE the C1 strip in step 4 would
# silently delete it.
_LINE_SEPS = "(?:\\r\\n|[\\r\\u0085\\u2028\\u2029])"
# Step 3: zero-width space/joiners, word joiner, BOM/ZWNBSP, soft
# hyphen — invisible, hash-poisoning, safe to drop.
_ZERO_WIDTH = "[\\u200b\\u200c\\u200d\\u2060\\ufeff\\u00ad]"
# Step 4: C0 minus tab/newline, DEL, C1 (NEL already rewritten).
_CONTROLS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]"
# Step 5: every Zs code point that is not the ASCII space.
_SPACES = "[\\u00a0\\u1680\\u2000-\\u200a\\u202f\\u205f\\u3000]"
# Raw-text mojibake markers: Ã/Â lead bytes of Latin-1-decoded UTF-8
# two-byte sequences; â€ the lead pair of decoded punctuation (“”–…).
_MOJIBAKE = "Ã|Â|â€"


def _normalize(texts: pd.Series, form: str, collapse: bool) -> pd.DataFrame:
    """One Arrow batch. All-vectorized pandas .str pipeline; see the
    module docstring for the step order the oracle mirrors."""
    raw = texts.astype("string")
    hits = raw.str.count(_MOJIBAKE)
    t = raw.str.normalize(form)
    t = t.str.replace(_LINE_SEPS, "\n", regex=True)
    t = t.str.replace(_ZERO_WIDTH, "", regex=True)
    t = t.str.replace(_CONTROLS, "", regex=True)
    t = t.str.replace(_SPACES, " ", regex=True)
    if collapse:
        t = t.str.replace("[ \t]+", " ", regex=True)
        t = t.str.replace(" ?\n ?", "\n", regex=True)
        t = t.str.replace("\n{3,}", "\n\n", regex=True)
        t = t.str.strip()
    changed = t != raw  # pandas 'string' dtype: NULL stays NULL
    return pd.DataFrame(
        {
            "text_norm": t.astype(object).where(t.notna(), None),
            "changed": changed.astype(object).where(changed.notna(), None),
            "mojibake_hits": pd.array(hits, dtype="Int32"),
        }
    )


def normalize_text_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    form: str = "NFC",
    collapse_whitespace: bool = True,
) -> DataFrame:
    """(id, text_norm, changed, mojibake_hits) — the pruned report
    form: only (id, text) crosses into Python and the corpus's other
    columns never leave the JVM. ``form`` is any unicodedata form
    (NFC default; NFKC for aggressive compatibility folding —
    ligatures, full-width forms — when the downstream is a hasher,
    not a renderer)."""
    pruned = docs.select(id_col, text_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _normalize(pdf[text_col], form, collapse_whitespace)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return pruned.mapInPandas(gen, f"{id_col} long, {NORM_SCHEMA}")


def with_normalized_text(
    docs: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    collapse_whitespace: bool = True,
) -> DataFrame:
    """Every input column with ``text_col`` REPLACED by its normalized
    form, plus ``changed``/``mojibake_hits`` — join-free (the right
    shape when the next stage hashes or tokenizes the text; a doc_id
    join back onto a 100 TB corpus would shuffle the corpus, double
    Arrow transfer is a per-partition stream)."""
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _normalize(pdf[text_col], form, collapse_whitespace)
            res = pdf.copy()
            res[text_col] = out["text_norm"].values
            res["changed"] = out["changed"].values
            res["mojibake_hits"] = out["mojibake_hits"].values
            yield res

    return docs.mapInPandas(gen, f"{ddl}, changed boolean, mojibake_hits int")
