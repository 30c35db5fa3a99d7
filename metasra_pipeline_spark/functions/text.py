"""Tokenization with char-interval provenance.

The reference tokenizes with ``nltk.word_tokenize`` and re-aligns tokens to
a normalized text to get char intervals (``get_ngrams``,
pipeline_components.py:1551-1594), including the NLTK quirk where opening /
closing double quotes come back as `````` / ``''`` and are mapped
to ``"`` (pipeline_components.py:1555-1560).

NLTK is not a dependency here; ``treebank_tokenize`` is an independent
re-implementation of the published Treebank tokenizer rules sufficient for
the metadata domain (whitespace + punctuation splitting, bracket/quote
handling, contractions).  Interval arithmetic matches the reference's:
tokens are joined with single spaces into a normalized text and intervals
are positions in that normalized text, offset by the parent token's start.

Everything here is plain Python called from *vectorized* pandas UDFs
(Arrow batches) — never per-row Python UDFs (input_hint requirement).
"""

from __future__ import annotations

import re

# --- Treebank-style rules (re-derived from the published algorithm) ---
_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]
_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)\s*$"), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]
_BRACKETS = [
    (re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> "),
    (re.compile(r"--"), r" -- "),
]
_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]
_CONTRACTIONS = [
    re.compile(r"(?i)\b(can)(?#X)(not)\b"),
    re.compile(r"(?i)\b(d)(?#X)('ye)\b"),
    re.compile(r"(?i)\b(gim)(?#X)(me)\b"),
    re.compile(r"(?i)\b(gon)(?#X)(na)\b"),
    re.compile(r"(?i)\b(got)(?#X)(ta)\b"),
    re.compile(r"(?i)\b(lem)(?#X)(me)\b"),
    re.compile(r"(?i)\b(wan)(?#X)(na)\s"),
]


def treebank_tokenize(text: str) -> list[str]:
    for regexp, substitution in _STARTING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _PUNCTUATION:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _BRACKETS:
        text = regexp.sub(substitution, text)
    text = " " + text + " "
    for regexp, substitution in _ENDING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp in _CONTRACTIONS:
        text = regexp.sub(r" \1 \2 ", text)
    return text.split()


def _normalize_words(words: list[str]) -> list[str]:
    # reference maps NLTK's `` / '' back to a plain double quote
    return ['"' if w in ("``", "''") else w for w in words]


def tokenize_with_positions(text: str) -> tuple[list[str], list[int], list[int]]:
    """Words of the normalized text plus [start, end) positions within
    ``" ".join(words)`` — the reference's alignment collapses to this
    because it aligns against the space-joined normalized text.
    """
    words = _normalize_words(treebank_tokenize(text))
    starts, ends, pos = [], [], 0
    for w in words:
        starts.append(pos)
        ends.append(pos + len(w))
        pos += len(w) + 1
    return words, starts, ends


def ngrams_with_intervals(text: str, n_thresh: int = 8) -> list[tuple[str, int, int]]:
    """All word n-grams for n = 1..min(n_thresh, #words)-1, each with its
    interval in the normalized text.  Mirrors NGram_Stage
    (pipeline_components.py:366-395): the full-length gram is never
    re-emitted (``range(1, max_n)``), so a 1-word token yields nothing.
    """
    words, starts, ends = tokenize_with_positions(text)
    if not words:
        return []
    joined = " ".join(words)
    out: list[tuple[str, int, int]] = []
    max_n = min(n_thresh, len(words))
    for n in range(1, max_n):
        for i in range(0, len(words) - n + 1):
            s, e = starts[i], ends[i + n - 1]
            out.append((joined[s:e], s, e))
    return out


_ALNUM_GRAM = re.compile(r"[0-9a-zA-Z]+")


def last_alnum_unigram(text: str) -> str | None:
    """Last alphanumeric unigram — the replacement target for SPECIALIST
    variant generation (``nltk_n_grams(in_str, 1)[-1]``,
    pipeline_components.py:1596-1613 / 604-659).
    """
    # the reference tokenizes then keeps grams matching
    # "[0-9a-zA-Z]+.*[0-9a-zA-Z]+" or single alnum chars; for the
    # last-unigram use case this reduces to the last token containing
    # alphanumerics, with surrounding punctuation retained.
    words = _normalize_words(treebank_tokenize(text))
    for w in reversed(words):
        if _ALNUM_GRAM.search(w):
            return w
    return None


def is_number(s: str) -> bool:
    """float() probe parity (pipeline_components.py:1544-1549)."""
    try:
        float(s)
        return True
    except ValueError:
        return False


# ---------------------------------------------------------------------------
# Per-string expansion closure: stages T1–T8 composed in p_53 order.
#
# Every expansion stage between NGram and AcronymToExpansion
# (run_pipeline.py:182-192) derives new tokens from existing ones using
# only the token string + broadcast side tables — no document context.
# The full closure for one initial string is therefore a pure function,
# evaluated once per *distinct* corpus string inside a vectorized pandas
# UDF and joined back (operators/stages.py).  This replaces a 10-deep
# union-of-unions DataFrame cascade whose plan grows exponentially.
# ---------------------------------------------------------------------------

def _expand_ngrams(toks):
    out = set()
    for t, s, e in toks:
        for g, a, b in ngrams_with_intervals(t):
            out.add((g, s + a, s + b))
    return out


def _expand_lower(toks):
    return {(t.lower(), s, e) for t, s, e in toks}


def _expand_delimit(toks, delimiter):
    """Delimit_Stage (pipeline_components.py:662-690)."""
    out = set()
    dlen = len(delimiter)
    for t, s, e in toks:
        parts = t.split(delimiter)
        if len(parts) == 1:
            continue
        cur = s
        for p in parts:
            out.add((p, cur, cur + len(p)))
            cur += len(p) + dlen
    return out


def _expand_variants(toks, variant_map):
    """SPECIALIST variant replacement of the last alnum unigram
    (pipeline_components.py:604-659)."""
    out = set()
    for t, s, e in toks:
        last = last_alnum_unigram(t)
        if not last:
            continue
        for var in variant_map.get(last, ()):
            out.add((t[: len(t) - len(last)] + var, s, e))
    return out


def _expand_synonyms(toks, member_to_set, syn_sets):
    """Synonyms_Stage (pipeline_components.py:323-353)."""
    out = set()
    for t, s, e in toks:
        for set_id in member_to_set.get(t, ()):
            for syn in syn_sets[set_id]:
                out.add((syn, s, e))
    return out


def _expand_acronyms(toks, acronyms):
    out = set()
    for t, s, e in toks:
        for expansion in acronyms.get(t, ()):
            out.add((expansion, s, e))
    return out


def expand_token_closure(initial: str, syn_sets: list[list[str]],
                         member_to_set: dict[str, list[int]],
                         acronyms: dict[str, list[str]],
                         inflections: dict[str, list[str]],
                         spellings: dict[str, list[str]],
                         ) -> list[tuple[str, int, int]]:
    """All tokens derivable from ``initial`` via T1 ngram → T2 lowercase →
    T3 delimit(+ _ - /) → T4/T5 variants → T6 synonyms → T8 acronyms, with
    intervals relative to the initial token's start.  Each stage sees the
    union of everything produced before it, exactly like the reference's
    monotonically growing token_nodes set."""
    nodes = {(initial, 0, len(initial))}
    for p, ps, pe, c, cs, ce, _k in expand_token_closure_edges(
            initial, syn_sets, member_to_set, acronyms, inflections,
            spellings):
        nodes.add((c, cs, ce))
    return sorted(nodes)


# DerivesInto labels, matching the reference exactly — P3 excludes the
# first two when computing superphrase reachability
# (pipeline_components.py:1051); acronym expansion is an *Inference*
# edge in the reference (:1143), so it is never excluded.
EDGE_NGRAM = "N-Gram"
EDGE_DELIMITER = "Delimiter"
EDGE_LOWERCASE = "Lowercase"
EDGE_INFLECTION = "Inflectional variant"
EDGE_SPELLING = "Spelling variant"
EDGE_SYNONYM = "Synonym"
EDGE_CVCL_SYNONYM = "Cellosaurus synonym"
EDGE_ACRONYM = "Acronym to expansion"
EDGE_PROP_SYN = "Property-specific synonym"
EDGE_TIME_PARSE = "Parse time and unit"
EDGE_UNIT_SYN = "Parse as unit synonym"


def expand_token_closure_edges(initial: str, syn_sets: list[list[str]],
                               member_to_set: dict[str, list[int]],
                               acronyms: dict[str, list[str]],
                               inflections: dict[str, list[str]],
                               spellings: dict[str, list[str]],
                               ) -> list[tuple]:
    """The T1–T8 expansion closure *with derivation edges*:
    (ptok, ps, pe, ctok, cs, ce, kind) per derivation, intervals relative
    to the initial token's start.  Node identity is (string, start, end)
    — the reference's idempotent TokenNode insertion — so a child created
    by several parents carries one edge per parent.  The edge graph feeds
    exact P3 subphrase suppression and per-term mapping_path provenance."""
    toks: set[tuple[str, int, int]] = {(initial, 0, len(initial))}
    edges: set[tuple] = set()

    def apply(stage_edges):
        new_nodes = set()
        for e in stage_edges:
            edges.add(e)
            child = (e[3], e[4], e[5])
            if child not in toks:
                new_nodes.add(child)
        toks.update(new_nodes)

    def ngram_edges(snapshot):
        for t, s, e in snapshot:
            for g, a, b in ngrams_with_intervals(t):
                yield (t, s, e, g, s + a, s + b, EDGE_NGRAM)

    def lower_edges(snapshot):
        for t, s, e in snapshot:
            low = t.lower()
            if low != t:
                yield (t, s, e, low, s, e, EDGE_LOWERCASE)

    def delimit_edges(snapshot, delimiter):
        dlen = len(delimiter)
        for t, s, e in snapshot:
            parts = t.split(delimiter)
            if len(parts) == 1:
                continue
            cur = s
            for p in parts:
                yield (t, s, e, p, cur, cur + len(p), EDGE_DELIMITER)
                cur += len(p) + dlen

    def variant_edges(snapshot, variant_map, kind):
        for t, s, e in snapshot:
            last = last_alnum_unigram(t)
            if not last:
                continue
            for var in variant_map.get(last, ()):
                yield (t, s, e, t[: len(t) - len(last)] + var, s, e, kind)

    def synonym_edges(snapshot):
        for t, s, e in snapshot:
            for set_id in member_to_set.get(t, ()):
                for syn in syn_sets[set_id]:
                    if syn != t:
                        yield (t, s, e, syn, s, e, EDGE_SYNONYM)

    def acronym_edges(snapshot):
        for t, s, e in snapshot:
            for expansion in acronyms.get(t, ()):
                yield (t, s, e, expansion, s, e, EDGE_ACRONYM)

    apply(list(ngram_edges(set(toks))))
    apply(list(lower_edges(set(toks))))
    for d in ("+", "_", "-", "/"):
        apply(list(delimit_edges(set(toks), d)))
    apply(list(variant_edges(set(toks), inflections, EDGE_INFLECTION)))
    apply(list(variant_edges(set(toks), spellings, EDGE_SPELLING)))
    apply(list(synonym_edges(set(toks))))
    apply(list(acronym_edges(set(toks))))
    return sorted(edges)
