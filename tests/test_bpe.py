"""BPE learner/encoder: hand-computed reference on a tiny corpus, a
pure-python cross-check on the real table, and the monotone
compression property of applying more merges."""

from __future__ import annotations

from collections import Counter

from dataingestiontohana_spark.operators.bpe import (
    EOW,
    bpe_encode,
    learn_bpe,
    word_counts,
)

from tests.conftest import SF0001


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _reference_bpe(word_cnt: dict[str, int], n: int):
    """Straight-line Sennrich reference, independent of the operator's
    internals (no shared helpers beyond the EOW constant)."""
    vocab = {tuple(w) + (EOW,): c for w, c in word_cnt.items()}
    out = []
    for rank in range(n):
        pairs = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, f))
        nv = {}
        for sym, c in vocab.items():
            res, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            nv[tuple(res)] = c
        vocab = nv
    return out


def test_hand_computed_merges(spark):
    # "low" x3, "lower" x1: pair (l,o) freq 4 wins first; then (lo,w)
    docs = _docs(spark, ["low low low lower"])
    merges = learn_bpe(docs, n_merges=3)
    assert merges[0][1:3] == ("l", "o") and merges[0][3] == 4
    assert merges[1][1:3] == ("lo", "w") and merges[1][3] == 4
    # after low merged: "low</w>" x3 gives (low, </w>) freq 3;
    # "lower" contributes (low,e),(e,r),(r,</w>) freq 1 each
    assert merges[2][1:3] == ("low", EOW) and merges[2][3] == 3


def test_matches_pure_python_reference_on_corpus(spark):
    from dataingestiontohana_spark.catalog import load_table

    d = load_table(spark, SF0001, "documents")
    wc = {r["word"]: r["cnt"] for r in word_counts(d).collect()}
    assert learn_bpe(d, n_merges=12) == _reference_bpe(wc, 12)


def test_deterministic_tie_break(spark):
    # every pair has freq 1 -> lexicographically smallest pair wins
    docs = _docs(spark, ["ba dc"])
    merges = learn_bpe(docs, n_merges=1)
    # candidates: (b,a),(a,</w>),(d,c),(c,</w>) all freq 1
    assert merges[0][1:3] == ("a", EOW)


def test_encode_compresses_monotonically(spark):
    from dataingestiontohana_spark.catalog import load_table

    d = load_table(spark, SF0001, "documents").limit(50)
    m4 = learn_bpe(d, n_merges=4)
    m32 = learn_bpe(d, n_merges=32)
    e0 = bpe_encode(d, []).agg({"n_subwords": "sum"}).collect()[0][0]
    e4 = bpe_encode(d, m4).agg({"n_subwords": "sum"}).collect()[0][0]
    e32 = bpe_encode(d, m32).agg({"n_subwords": "sum"}).collect()[0][0]
    # zero merges: every word is chars+EOW; merges only ever shrink
    assert e0 > e4 > e32
    nw = bpe_encode(d, m32).agg({"n_words": "sum"}).collect()[0][0]
    assert e32 >= nw  # never fewer subwords than words


def test_max_types_guard(spark):
    import pytest

    docs = _docs(spark, ["a b c d e f"])
    with pytest.raises(ValueError):
        learn_bpe(docs, n_merges=1, max_types=3)


# ---- pure-python kernel properties (no Spark session needed) ----

from hypothesis import given, settings
from hypothesis import strategies as st

from dataingestiontohana_spark.operators.bpe import _merge_word

_sym = st.sampled_from(["a", "b", "c", "ab", "bc"])
_word = st.lists(_sym, min_size=0, max_size=12).map(tuple)


@settings(max_examples=200, deadline=None)
@given(_word, _sym, _sym)
def test_merge_word_properties(symbols, left, right):
    out = _merge_word(symbols, (left, right))
    # total character mass is preserved
    assert "".join(out) == "".join(symbols)
    assert len(out) <= len(symbols)
    # a pair absent from the input leaves it untouched
    if all(
        not (symbols[i] == left and symbols[i + 1] == right)
        for i in range(len(symbols) - 1)
    ):
        assert out == symbols
    # for distinct left/right no adjacent (left, right) pair survives
    if left != right:
        assert all(
            not (out[i] == left and out[i + 1] == right)
            for i in range(len(out) - 1)
        )


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=9).map(tuple))
def test_merge_word_same_symbol_is_leftmost_greedy(symbols):
    """('a','a','a') under ('a','a') -> ('aa','a'): leftmost-first,
    non-overlapping — the reference algorithm's exact behavior."""
    out = _merge_word(symbols, ("a", "a"))
    i = 0
    expect = []
    while i < len(symbols):
        if (
            i + 1 < len(symbols)
            and symbols[i] == "a"
            and symbols[i + 1] == "a"
        ):
            expect.append("aa")
            i += 2
        else:
            expect.append(symbols[i])
            i += 1
    assert out == tuple(expect)
