"""Distributed BPE (byte-pair-encoding) merge training.

The tokenizer-training step of an LLM data pipeline: find the most
frequent adjacent symbol pair across the corpus, merge it everywhere,
repeat (Sennrich et al., ACL 2016).  The classic formulation is a
single-machine loop over a word-count dictionary; the Spark shape here
keeps exactly that structure but distributes the two heavy pieces:

* the corpus collapses ONCE to a (word, count) vocabulary table — all
  later iterations touch only the vocabulary, never the corpus;
* each iteration is one weighted pair-count aggregation (map-side
  combined, one narrow shuffle) + an ordered take(1) for the winning
  pair + a codegen'd fold that applies the merge to every word's
  symbol array.  The winning pair is the only thing that ever reaches
  the driver.

The vocabulary table is localCheckpointed per iteration: an iterative
plan otherwise grows its lineage exponentially (same discipline as
``dedup.connected_components``).

String-level simplification (documented): symbols are represented as
their surface strings, so a merged symbol is indistinguishable from an
identical pre-existing symbol — the standard id-tracked implementation
differs only in bookkeeping; on natural-language corpora the merge
sequences agree (pinned against a pure-Python reference in
tests/test_round5_additions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tubes_spark.operators.text import tokenize


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) corpus word counts — the table BPE iterates on."""
    toks = df.select(F.explode(tokenize(F.lower(F.col(text_col)))).alias("w"))
    return toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))


def _adjacent_pairs(sym: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty for 1-symbol
    words) — zip_with over two O(n) slices, never element_at-per-index
    (the O(n^2) codegen trap, see quality_bigram_logprob)."""
    k = F.greatest(F.size(sym) - 1, F.lit(0))
    return F.zip_with(
        F.slice(sym, 1, k),
        F.slice(sym, 2, k),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over a (syms, n) vocabulary: one
    explode + one map-side-combined shuffle."""
    ex = vocab_syms.select(
        F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), F.col("n")
    )
    return ex.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("n").alias("cnt")
    )


def _apply_merge(sym: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a||b,
    as a single codegen'd fold: append each symbol, and when the last
    kept symbol is `a` and the incoming one is `b`, replace the last
    with the concatenation.  Correct for BPE because the merged surface
    string differs from `a`, so a fresh merge cannot chain onto the
    symbol it just produced (aaa + (a,a) -> [aa, a])."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (s == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    train_sample: "int | None" = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(a, b, count), ...] in
    merge order.  Ties break deterministically on (count desc, a, b).

    Driver traffic per iteration: ONE row (the winning pair).

    ``train_sample`` (VERDICT-r10 #6) caps the TRAINING corpus at the
    first N documents in deterministic md5(text) order — a top-K
    (TakeOrderedAndProject), never a global sort materialization.  The
    iteration cost is O(vocabulary), and the vocabulary's heavy tail
    grows with the corpus — at 100 TB merge training runs on a sample
    (pair statistics converge long before corpus scale; this is how
    production tokenizers are trained).  A cap at or above the corpus
    size is an exact no-op: the sample IS the corpus, in any order,
    because word_vocab is order-insensitive.  ``None`` = full corpus
    (ENCODING always runs over the full corpus either way — only the
    merge-learning input is sampled)."""
    if train_sample is not None:
        df = (
            df.select(F.col(text_col))
            .orderBy(F.md5(F.col(text_col)).asc(), F.col(text_col).asc())
            .limit(int(train_sample))
        )
    vocab = word_vocab(df, text_col)
    syms = vocab.select(
        F.split(F.col("w"), "").alias("syms"), F.col("n")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(syms)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((a, b, int(cnt)))
        syms = syms.select(
            _apply_merge(F.col("syms"), a, b).alias("syms"), F.col("n")
        ).localCheckpoint(eager=True)
    return merges


# --------------------------------------------------------------------------
# Encoding (applying trained merges)
# --------------------------------------------------------------------------

SEP = "\x1f"  # unit separator: cannot occur in tokenized text


def encode_doc_expr(text: Column, merges) -> Column:
    """Apply a trained merge list to a whole document as ONE codegen'd
    string expression — no explode, no UDF, no per-word loop.

    Representation: every non-space char is wrapped in unit separators
    (``a`` -> ``\\x1fa\\x1f``), so symbol boundaries are ``SEP SEP`` and
    word boundaries are the untouched spaces.  Applying merge (a, b) is
    then a literal ``replace(SEP a SEP SEP b SEP -> SEP ab SEP)``:
    left-to-right and non-overlapping, which is exactly the
    ``_apply_merge`` fold semantics (a match consumes its trailing
    separator, so a fresh merge cannot chain onto the symbol it just
    produced), and the wrapping separators stop a pattern from matching
    a SUFFIX of a longer symbol.  The same chain runs verbatim in any
    engine with ``replace`` — which is what makes the full BPE pipeline
    oracle-checkable (see ORACLES["bpe_encode_corpus"]).

    Scale shape: a chain of k literal replaces over each doc is
    O(k * doc_len) per row, embarrassingly parallel, zero shuffles.
    """
    e = F.regexp_replace(F.lower(text), "([^ ])", SEP + "$1" + SEP)
    for m in merges:
        a, b = m[0], m[1]
        e = F.replace(e, F.lit(SEP + a + SEP + SEP + b + SEP), F.lit(SEP + a + b + SEP))
    return e


def token_count_from_encoded(enc: Column) -> Column:
    """Symbol count of an encoded doc: each symbol carries exactly two
    separators, so count(SEP) / 2."""
    n_sep = F.length(enc) - F.length(F.replace(enc, F.lit(SEP), F.lit("")))
    return (n_sep / 2).cast("long")


def encode_tokens_py(word: str, merges) -> list[str]:
    """Pure-Python reference encoder (tests pin the Column expression
    against this): greedy left-to-right application of each merge in
    rank order over the char sequence."""
    syms = list(word)
    for m in merges:
        a, b = m[0], m[1]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
