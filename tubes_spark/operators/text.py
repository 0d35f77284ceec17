"""Text analysis for LLM-data pipelines (north-star extension).

All hot-path expressions are built-in Column functions (JVM-side,
whole-stage codegen) — no Python UDFs: at 100 TB the difference between
a regexp_count expression and a row-at-a-time UDF is the whole job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word/number/punct tokenizer regex (kept simple + portable so a
# SQL oracle can reproduce it exactly).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny stopword marker sets for the language-ID heuristic: common
# function words that are near-unique per language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "est", "une"],
    "es": ["el", "los", "es", "una", "que"],
}

EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "it", "that", "for", "on"]


def normalize(text: Column) -> Column:
    """Lowercase + whitespace-collapse + trim — canonical text form."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokenize(text: Column) -> Column:
    """Whitespace tokenization -> array<string> (empty-safe)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(text: Column) -> Column:
    """Whitespace token count (JVM-side size(split))."""
    return F.size(tokenize(text))


def word_count(text: Column) -> Column:
    """BPE-ish token count: words + numbers + punctuation marks."""
    return F.regexp_count(text, F.lit(TOKEN_RE))


def char_ngrams(text: Column, n: int) -> Column:
    """Character n-gram shingles of the normalized text -> array<string>.
    Built from sequence+transform (JVM-side, no UDF)."""
    norm = normalize(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(0))),
        lambda i: norm.substr(i, F.lit(n)),
    )


def word_shingles_from_tokens(toks: Column, k: int) -> Column:
    """Word k-shingles from a pre-split token array column.

    Pass a *materialized column* (not an inline split expression):
    codegen substitutes child expressions textually, so an inline
    ``split(...)`` would be re-evaluated per transform element —
    O(words^2) string splitting."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    return F.when(F.size(toks) < k, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    )


def word_shingles(text: Column, k: int) -> Column:
    """Word k-shingles -> array<string> (for MinHash / Jaccard).
    Prefer tokenizing into a column first + word_shingles_from_tokens
    for hot paths (see that function's cost note)."""
    return word_shingles_from_tokens(F.split(normalize(text), " "), k)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: 64-bit hash of the canonical
    form (xxhash64, JVM built-in).  For an oracle-friendly variant use
    :func:`fingerprint_md5`."""
    return F.xxhash64(normalize(text))


def fingerprint_md5(text: Column) -> Column:
    """md5 of the canonical form — portable across engines."""
    return F.md5(normalize(text))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: blend of length band, alpha ratio,
    stopword hit-rate, and punctuation sanity.  Pure Column arithmetic."""
    n_chars = F.length(text)
    n_alpha = F.regexp_count(text, F.lit(r"[A-Za-z]"))
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    toks = token_count(text)
    stop_hits = sum(
        (F.regexp_count(F.lower(text), F.lit(r"\b" + w + r"\b")) for w in EN_STOPWORDS),
        F.lit(0),
    )
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    punct_ratio = n_punct / F.greatest(toks, F.lit(1))
    stop_ratio = stop_hits / F.greatest(toks, F.lit(1))
    len_band = F.when((n_chars >= 50) & (n_chars <= 20000), F.lit(1.0)).otherwise(F.lit(0.3))
    score = (
        F.lit(0.3) * len_band
        + F.lit(0.3) * F.least(alpha_ratio * 1.25, F.lit(1.0))
        + F.lit(0.25) * F.least(stop_ratio * 4.0, F.lit(1.0))
        + F.lit(0.15) * F.when(punct_ratio <= 0.5, F.lit(1.0)).otherwise(F.lit(0.2))
    )
    return F.round(score, 6)


def lang_id(text: Column) -> Column:
    """Marker-word language ID: count per-language marker hits, take the
    argmax (ties -> lexicographically first language; 'und' if zero).

    Deterministic and SQL-portable: plain regexp counts + greatest."""
    lowered = F.lower(text)
    scores = {
        lang: sum((F.regexp_count(lowered, F.lit(r"\b" + w + r"\b")) for w in words), F.lit(0))
        for lang, words in LANG_MARKERS.items()
    }
    # argmax via struct-max: (score, reversed-lang) so ties pick first lang
    pairs = F.array(
        *[F.struct(scores[lang].alias("s"), F.lit(lang).alias("l")) for lang in sorted(LANG_MARKERS)]
    )
    best = F.array_max(F.transform(pairs, lambda p: F.struct(p["s"].alias("s"), F.lit(0).alias("z"), p["l"].alias("l"))))
    # array_max on struct compares fieldwise: score asc then l asc — but for
    # ties we want the FIRST language; invert by comparing (s, -ord(l)) is
    # messy, so do an explicit when-chain (4 langs, trivial).
    langs = sorted(LANG_MARKERS)
    best_score = F.greatest(*[scores[l] for l in langs])
    out = F.lit("und")
    for lang in reversed(langs):
        out = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(out)
    return F.when(best_score <= 0, F.lit("und")).otherwise(out)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document stats frame."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        word_count(t).alias("n_words"),
        F.length(t).alias("n_chars_m"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint_md5(t).alias("fp"),
    )


def winnow(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every char k-gram of the normalized text, slide a
    window of w hashes, keep each window's minimum — the selected hash
    set is a position-robust fingerprint for near-dup detection.

    Entirely JVM-side array expressions (sequence/transform/slice/
    array_min) over xxhash64 — no UDF, codegen-friendly.  Emits the
    distinct selected hashes as `fps` plus summary stats."""
    t = F.col(text_col)
    norm = normalize(t)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
        lambda i: norm.substr(i, F.lit(k)),
    )
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    n_windows = F.greatest(F.size(hashes) - (w - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(hashes, i, F.least(F.lit(w), F.size(hashes)))),
    )
    fps = F.array_sort(F.array_distinct(mins))
    return df.select(
        F.col(id_col),
        fps.alias("fps"),
        F.size(fps).alias("n_fp"),
        F.element_at(fps, 1).alias("fp_min"),
        F.element_at(fps, -1).alias("fp_max"),
    )
