"""Property-based tests (hypothesis) for the spec kernels.

These pin the invariants the distributed plans rely on: alignment arity,
tokenizer determinism, hyphen-merge length preservation, metric bounds.
No Spark here — pure kernels, fast."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from memo_fraktur_ocr_code_spark.functions.alignment import (
    align_b_to_a,
    token_align,
)
from memo_fraktur_ocr_code_spark.functions.levtools import (
    indel_distance,
    indel_ratio,
    levenshtein,
    osa_distance,
)
from memo_fraktur_ocr_code_spark.functions.textspec import (
    assemble_turns,
    correct_easy,
    fix_hyphens,
    tokenize,
)

# Danish-ish alphabet incl. the confusion chars the pipeline handles.
_ALPHA = "abcdefghijklmnopqrstuvwxyzæøåſœ ABC.,!?-\n"
texts = st.text(alphabet=_ALPHA, max_size=80)
words = st.text(
    alphabet="abcdefghijkæøå", min_size=0, max_size=8
)
token_tuples = st.lists(words.filter(bool), max_size=12).map(tuple)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(texts)
def test_tokenize_deterministic_and_whitespace_free(s):
    toks = tokenize(s)
    assert toks == tokenize(s)
    assert all(t and not t.isspace() for t in toks)
    # idempotence of the reassembled form
    assert tokenize(" ".join(toks)) == toks


@settings(max_examples=200, deadline=None, derandomize=True)
@given(texts)
def test_correct_easy_idempotent_and_removes_targets(s):
    out = correct_easy(s)
    assert "œ" not in out and "ſ" not in out
    assert correct_easy(out) == out


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(texts, max_size=6))
def test_fix_hyphens_preserves_arity(lst):
    out = fix_hyphens(lst)
    assert len(out) == len(lst)


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.lists(texts, min_size=1, max_size=5))
def test_assemble_turns_preserves_arity(lst):
    out = assemble_turns(lst)
    assert len(out) == len(lst)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(token_tuples, token_tuples)
def test_align_b_to_a_arity(a, b):
    if not a:
        assert align_b_to_a(a, b) == ()
    else:
        assert len(align_b_to_a(a, b)) == len(a)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(token_tuples, token_tuples)
def test_token_align_arity(corr, orig):
    c, o = token_align(corr, orig)
    if corr and orig:
        # the invariant the alignment pipeline relies on (the caller,
        # repair_nonmatching, substitutes (sep,) for an empty orig)
        assert len(c) == len(corr) == len(o)
    else:
        # reference contract for an empty side (align_ocr.py:199-207):
        # the other side is folded into at most one joined slot
        assert len(c) <= 1 and len(o) <= 1


@settings(max_examples=300, deadline=None, derandomize=True)
@given(words, words)
def test_metric_properties(a, b):
    lev = levenshtein(a, b)
    osa = osa_distance(a, b)
    ind = indel_distance(a, b)
    # symmetry
    assert lev == levenshtein(b, a)
    assert ind == indel_distance(b, a)
    # identity
    assert (lev == 0) == (a == b)
    # bounds: osa <= lev <= indel <= len(a)+len(b)
    assert osa <= lev <= ind <= len(a) + len(b)
    # ratio in [0, 1]
    r = indel_ratio(a, b)
    assert 0.0 <= r <= 1.0
    assert (r == 1.0) == (a == b)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(words, words, st.integers(min_value=0, max_value=3))
def test_osa_cutoff_consistent(a, b, cap):
    full = osa_distance(a, b)
    capped = osa_distance(a, b, cap)
    if full <= cap:
        assert capped == full
    else:
        assert capped == cap + 1


@settings(max_examples=150, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(words.filter(lambda w: len(w) >= 2), st.integers(1, 1000)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.text(alphabet="abcdefghijkæøå", min_size=2, max_size=9),
)
def test_symspell_index_equals_bruteforce(lex, query):
    """The deletion-variant index must return exactly the brute-force
    TOP candidate: min (distance, -freq, term) within max_edit=2.
    Contract: queries of length ≥ 2 (the corrector never looks up 1-char
    tokens, correct_ocr.py:341)."""
    from memo_fraktur_ocr_code_spark.functions.symspell import SymSpellIndex

    idx = SymSpellIndex.from_pairs(lex)
    got = idx.lookup_top(query)
    w = query.lower()
    if w in idx.words:
        assert got == w
        return
    cands = [
        (osa_distance(w, t), -c, t)
        for t, c in idx.words.items()
        if osa_distance(w, t) <= 2
    ]
    want = min(cands)[2] if cands else None
    assert got == want


# --- pruning-optimization equivalence (round 2) ---------------------------
# indel_distance gained prefix/suffix stripping and _iter_align gained a
# length-bound DP skip; both must be OUTPUT-IDENTICAL to the naive forms.


def _indel_naive(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = (
                prev[j - 1] + 1 if ca == b[j - 1] else max(cur[j - 1], prev[j])
            )
        prev = cur
    return la + lb - 2 * prev[lb]


@settings(max_examples=300, deadline=None, derandomize=True)
@given(words, words)
def test_indel_distance_matches_naive_dp(a, b):
    assert indel_distance(a, b) == _indel_naive(a, b)


def _iter_align_naive(orig_toks, first_tok, rest):
    from memo_fraktur_ocr_code_spark.functions.alignment import SPLIT_SEP

    best_sum = 0.0
    split = [orig_toks[0], SPLIT_SEP.join(orig_toks[1:])]
    rest_joined = "".join(rest)
    for i in range(len(orig_toks) + 1):
        p1, p2 = orig_toks[:i], orig_toks[i:]
        r1 = indel_ratio("".join(p1), first_tok)
        r2 = indel_ratio("".join(p2), rest_joined)
        if r1 == 1 or r2 == 1:
            return [SPLIT_SEP.join(p1), SPLIT_SEP.join(p2)]
        if r1 + r2 > best_sum:
            best_sum = r1 + r2
            split = [SPLIT_SEP.join(p1), SPLIT_SEP.join(p2)]
    return split


@settings(max_examples=300, deadline=None, derandomize=True)
@given(
    st.lists(words, min_size=1, max_size=6).map(tuple),
    words,
    st.lists(words, max_size=4).map(tuple),
)
def test_iter_align_pruning_is_output_identical(orig, first, rest):
    from memo_fraktur_ocr_code_spark.functions.alignment import _iter_align

    assert _iter_align(orig, first, rest) == _iter_align_naive(
        orig, first, rest
    )


# --- overlay lookup ≡ merged-index lookup ----------------------------------
# The per-conv augmentation avoids rebuilding the 50k-word deletion index
# by consulting (base, delta) separately; this pins that shortcut to the
# ground truth: a full index built over the overlaid dictionary.


@settings(max_examples=150, deadline=None, derandomize=True)
@given(
    st.dictionaries(words.filter(bool), st.integers(1, 1000), max_size=12),
    st.dictionaries(words.filter(bool), st.integers(1, 1000), max_size=6),
    words.filter(bool),
)
def test_overlay_lookup_equals_merged_index(base_d, delta_d, query):
    from memo_fraktur_ocr_code_spark.functions.symspell import (
        SymSpellIndex,
        overlay_lookup_top,
    )

    base = SymSpellIndex(base_d)
    delta = SymSpellIndex(delta_d)
    merged = SymSpellIndex({**base_d, **delta_d})  # overlay last-wins
    got = overlay_lookup_top(query, base, delta, delta_d)
    want = merged.lookup_top(query)
    assert got == want, (base_d, delta_d, query, got, want)
