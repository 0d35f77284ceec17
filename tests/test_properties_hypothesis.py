"""Property-based tests (hypothesis) for the pure-Python kernels whose
Spark twins are pinned elsewhere: the BPE merge fold and the layout
hash arithmetic.  Spark-side equivalence is covered by
tests/test_round5b.py and the oracle gate; these drive the reference
implementations through randomized inputs so edge cases (empty words,
self-merges, chained merges) can't hide.
"""

from hypothesis import given, settings, strategies as st

from tubes_spark.operators.bpe import encode_tokens_py

WORD = st.text(alphabet="abcd", min_size=0, max_size=12)
MERGE = st.tuples(
    st.text(alphabet="abcd", min_size=1, max_size=3),
    st.text(alphabet="abcd", min_size=1, max_size=3),
)


@settings(max_examples=300, deadline=None)
@given(WORD, st.lists(MERGE, max_size=6))
def test_bpe_encode_reconstructs_word(word, merges):
    """Lossless: concatenating the encoded symbols always rebuilds the
    word, for ANY merge list."""
    assert "".join(encode_tokens_py(word, merges)) == word


@settings(max_examples=300, deadline=None)
@given(WORD, st.lists(MERGE, max_size=6))
def test_bpe_encode_never_grows(word, merges):
    """Applying merges can only reduce (or keep) the symbol count."""
    toks = encode_tokens_py(word, merges)
    assert len(toks) <= max(len(word), 0)
    if word:
        assert len(toks) >= 1


@settings(max_examples=200, deadline=None)
@given(WORD, MERGE)
def test_bpe_single_merge_removes_all_disjoint_pairs(word, merge):
    """After applying (a, b), no adjacent (a, b) pair survives UNLESS
    it was produced by overlap consumption (e.g. 'aab' + (a,a): the
    surviving 'a' precedes 'b', fine) — formally: re-applying the same
    merge is a no-op (idempotence of a single merge pass is NOT
    guaranteed by BPE, but a second pass can only merge pairs the
    first pass created, and a pair (a, b) cannot be created by merging
    (a, b) itself since ab != a)."""
    once = encode_tokens_py(word, [merge])
    twice = encode_tokens_py(word, [merge, merge])
    a, b = merge
    # a second identical pass finds no (a, b) adjacency created by the
    # first (ab != a), so it must be a no-op
    rerun = []
    i = 0
    while i < len(once):
        if i + 1 < len(once) and once[i] == a and once[i + 1] == b:
            rerun.append(a + b)
            i += 2
        else:
            rerun.append(once[i])
            i += 1
    assert twice == rerun


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**62), st.integers(min_value=1, max_value=64))
def test_arith_hash_family_stays_in_range(x, n):
    from tubes_spark.operators.dedup import ARITH_P, arith_hash_family

    for a, b in arith_hash_family(min(n, 64), seed=x % 17):
        v = (a * (x % ARITH_P) + b) % ARITH_P
        assert 0 <= v < ARITH_P
        assert a * (ARITH_P - 1) + b < 2**63, "must stay in 64-bit signed math"
