"""Tokenizer + n-gram interval parity (get_ngrams,
pipeline_components.py:1551-1594)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from metasra_pipeline_spark.functions.text import (
    is_number,
    last_alnum_unigram,
    ngrams_with_intervals,
    tokenize_with_positions,
)


def test_basic_ngrams():
    grams = ngrams_with_intervals("vastus lateralis muscle")
    strs = [g for g, _, _ in grams]
    # n in 1..2 for 3 words — full trigram NOT re-emitted
    assert "vastus" in strs and "lateralis" in strs and "muscle" in strs
    assert "vastus lateralis" in strs and "lateralis muscle" in strs
    assert "vastus lateralis muscle" not in strs
    d = {g: (s, e) for g, s, e in grams}
    assert d["vastus"] == (0, 6)
    assert d["lateralis"] == (7, 16)
    assert d["vastus lateralis"] == (0, 16)
    assert d["lateralis muscle"] == (7, 23)


def test_single_word_no_ngrams():
    assert ngrams_with_intervals("liver") == []


def test_punctuation_splitting():
    words, _, _ = tokenize_with_positions("iPS derived endothelial cells, day3")
    assert "," in words and "cells" in words


def test_quote_normalization():
    # NLTK maps `` / '' to separate tokens; reference folds them to '"'
    words, _, _ = tokenize_with_positions('the "best" sample')
    assert words.count('"') == 2


def test_plus_and_hyphen_kept():
    words, _, _ = tokenize_with_positions("CD4+ T-cell")
    assert "CD4+" in words and "T-cell" in words


def test_is_number():
    assert is_number("48") and is_number("4.8") and is_number(" 7 ")
    assert not is_number("48h") and not is_number("")


def test_last_alnum_unigram():
    assert last_alnum_unigram("vastus lateralis muscle") == "muscle"
    assert last_alnum_unigram("T cell.") == "cell"
    assert last_alnum_unigram("+++") is None


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii",
                                      exclude_characters="\x00"),
               max_size=40))
def test_ngram_intervals_are_substrings(s):
    """Interval arithmetic invariant: every gram equals the normalized
    text sliced at its interval."""
    words, starts, ends = tokenize_with_positions(s)
    joined = " ".join(words)
    for g, a, b in ngrams_with_intervals(s):
        assert joined[a:b] == g
        assert 0 <= a < b <= len(joined)
