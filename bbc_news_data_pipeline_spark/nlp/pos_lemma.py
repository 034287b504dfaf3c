"""POS-class token filtering and lemmatization — the two reference UDFs
that cannot be expressed as native Catalyst expressions (SURVEY F13/F14,
U1/U2; reference ``data_preparation.py:85-119``).

The reference keeps only Noun/Adjective/Adverb tokens (``pos_tags_to_keep
= N/J/R``, ``data_preparation.py:87-94``) and WordNet-lemmatizes each
token with a per-token ``pos_tag([token])`` call — context-free and slow
(SURVEY §2.13 flags it; we tag whole sequences instead).

NLTK is not installed in this container, so both operators run on a
deterministic rule-based English fallback (suffix-heuristic tagger +
suffix-stripping lemmatizer). When NLTK *is* importable the same UDFs
dispatch to it (whole-sequence ``pos_tag`` + ``WordNetLemmatizer``) —
the Spark plumbing (Arrow-batched iterator pandas_udf over
``array<string>`` token columns, tagger state initialized once per python
worker, not per batch) is identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

try:  # pragma: no cover - exercised only where NLTK is installed
    import nltk  # type: ignore

    _HAVE_NLTK = True
except ImportError:
    nltk = None
    _HAVE_NLTK = False

# --- rule-based fallback tagger ------------------------------------------
# Suffix heuristics for the classes the reference distinguishes: we only
# need "is this token N/J/R (keep) or something else (drop)", not a full
# Penn tagset.

_ADJ_SUFFIXES = ("able", "ible", "al", "ful", "ic", "ive", "less", "ous")
_ADV_SUFFIXES = ("ly",)
_VERB_SUFFIXES = ("ing", "ed", "ise", "ize")
_COMMON_VERBS = frozenset(
    "be is am are was were been being have has had do does did go goes went "
    "gone say says said make makes made get gets got take takes took see sees "
    "saw know knows knew think thinks thought come comes came want wants "
    "wanted give gives gave use uses used find finds found tell tells told "
    "ask asks asked work works worked seem seems seemed feel feels felt try "
    "tries tried leave leaves left call calls called".split()
)


def _rule_pos(token: str) -> str:
    """Coarse POS class: 'n' noun, 'a' adjective, 'r' adverb, 'v' verb."""
    if token in _COMMON_VERBS:
        return "v"
    if token.endswith(_ADV_SUFFIXES) and len(token) > 4:
        return "r"
    if token.endswith(_ADJ_SUFFIXES) and len(token) > 5:
        return "a"
    if token.endswith(_VERB_SUFFIXES) and len(token) > 5:
        return "v"
    return "n"


_MASS_NOUNS = frozenset(
    "news series species means politics economics mathematics physics "
    "athletics headquarters".split()
)


def _rule_lemma(token: str, pos: str) -> str:
    """Deterministic suffix-stripping lemmatizer (English inflections)."""
    if len(token) <= 3 or token in _MASS_NOUNS:
        return token
    if pos == "n":
        if token.endswith("ies") and len(token) > 4:
            return token[:-3] + "y"
        if token.endswith(("ses", "xes", "zes", "ches", "shes")):
            return token[:-2]
        if token.endswith("s") and not token.endswith(("ss", "us", "is")):
            return token[:-1]
        return token
    if pos == "v":
        if token.endswith("ing") and len(token) > 5:
            stem = token[:-3]
            return stem[:-1] if len(stem) > 2 and stem[-1] == stem[-2] else stem
        if token.endswith("ied") and len(token) > 4:
            return token[:-3] + "y"
        if token.endswith("ed") and len(token) > 4:
            stem = token[:-2]
            return stem[:-1] if len(stem) > 2 and stem[-1] == stem[-2] else stem
    return token


def _nltk_keep_and_lemmatize(tokens: list[str], keep: tuple[str, ...]) -> list[str]:
    """NLTK path: ONE pos_tag call per token sequence (fixing the
    reference's per-token tagging, data_preparation.py:115), then WordNet
    lemmatization with the tag-derived wordnet POS."""
    from nltk import pos_tag  # type: ignore
    from nltk.stem import WordNetLemmatizer  # type: ignore

    wnl = WordNetLemmatizer()
    tag_to_wn = {"N": "n", "J": "a", "V": "v", "R": "r"}
    out = []
    for tok, tag in pos_tag(tokens):
        if tag[:1] in keep:
            out.append(wnl.lemmatize(tok, tag_to_wn.get(tag[:1], "n")))
    return out


def pos_filter_lemmatize_udf(keep: tuple[str, ...] = ("N", "J", "R")):
    """Iterator pandas_udf: tokens array → POS-filtered, lemmatized tokens.

    Iterator form so any heavyweight tagger model loads once per python
    worker (the same lifecycle pattern as the HF sentiment UDF, SURVEY
    §4.1 "lazy heavy imports").
    """

    rule_keep = tuple(k.lower()[:1] for k in keep)  # N/J/R -> n/a(j)/r
    # reference classes: N->noun('n'), J->adj('a'), R->adv('r')
    class_map = {"n": "n", "j": "a", "r": "r", "v": "v"}
    rule_classes = tuple(class_map[c] for c in rule_keep)

    @F.pandas_udf(ArrayType(StringType()))
    def filt(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for toks_series in batches:
            if _HAVE_NLTK:  # pragma: no cover - container has no NLTK
                yield toks_series.map(
                    lambda toks: _nltk_keep_and_lemmatize(list(toks), keep)
                )
            else:
                yield toks_series.map(
                    lambda toks: [
                        _rule_lemma(t, _rule_pos(t))
                        for t in toks
                        if _rule_pos(t) in rule_classes
                    ]
                )

    return filt


def lemmatize_tokens(tokens_col: Column | str, keep: tuple[str, ...] = ("N", "J", "R")) -> Column:
    """Column wrapper: ``lemmatize_tokens(F.col("tokens"))``."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return pos_filter_lemmatize_udf(keep)(c)
