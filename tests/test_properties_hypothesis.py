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


# --------------------------------------------------------------------------
# round 6: PNG codec properties (pure python, no Spark session needed)
# --------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=8),
)
def test_png_roundtrip_is_identity_on_pixels(h, w, seed, filters):
    """encode_png . decode_png == id for every image shape and every
    per-row filter assignment — the inflate + unfilter path can never
    lose or alter a pixel."""
    import numpy as np

    from tubes_spark.operators.multimodal import decode_png, encode_png

    arr = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = decode_png(encode_png(arr, filters=filters))
    assert out.shape == arr.shape and (out == arr).all()


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_ahash_is_filter_invariant(h, w, seed):
    """The perceptual hash is a PIXEL property: any filter assignment
    used at encode time must produce the identical 64-bit hash."""
    import numpy as np

    from tubes_spark.operators.multimodal import encode_png, png_ahash_hex

    arr = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    hashes = {
        png_ahash_hex(encode_png(arr, filters=f))
        for f in (None, [1], [2], [3], [4], [4, 0, 3, 1, 2])
    }
    assert len(hashes) == 1
