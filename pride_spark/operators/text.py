"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-profile heuristic), quality scoring, token counting,
and rolling-hash document fingerprinting — all as JVM-side Column
expressions over the ``documents`` table, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword profiles for the n-gram/stopword heuristic.
#: (Public common-word lists; intentionally minimal — the operator shape is
#: the point, the profiles are pluggable.)
LANG_PROFILES = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the baseline tokenizer).

    Empty / whitespace-only text yields an EMPTY array: Spark's
    ``split('', '\\s+')`` returns one empty-string element, which made
    ``token_count('') == 1`` and fed a phantom token into every
    downstream ratio (r10 review) — the empty element is filtered, the
    same normalization ``functions/strings.chars`` applies."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-approximating token count: word-pieces + punctuation + digits.

    A regexp over the public GPT-2-style pre-tokenizer pattern family:
    contiguous letters, contiguous digits, or single non-space symbols.
    """
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"))


def _in_set(words: list[str]):
    """Single-arg lambda factory — PySpark gives 2-arg lambdas an index param."""

    def pred(t: Column) -> Column:
        return t.isin(*words)

    return pred


def stopword_ratio(text: Column, stopwords: list[str]) -> Column:
    """Fraction of tokens that are in the stopword list."""
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, _in_set(stopwords)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def detect_language(text: Column, profiles: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit ratio.

    Deterministic tie-break: language key order.  Returns 'und' when no
    profile scores > 0.
    """
    profiles = profiles or LANG_PROFILES
    toks = tokens(F.lower(text))
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang in sorted(profiles):
        hits = F.size(F.filter(toks, _in_set(profiles[lang])))
        is_better = hits > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, hits).otherwise(best_score)
    return best_lang


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: length, word length, alpha ratio.

    The standard cheap pre-filter stack for web-scale corpora (C4-style
    heuristics): mean word length in a sane band, mostly-alphabetic,
    non-trivial length.
    """
    toks = tokens(text)
    n_tok = F.size(toks)
    mean_wlen = F.when(n_tok > 0, F.length(F.regexp_replace(text, r"\s+", "")) / n_tok).otherwise(
        F.lit(0.0)
    )
    alpha_ratio = F.when(
        F.length(text) > 0,
        F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / F.length(text),
    ).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    wlen_ok = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_ok + wlen_ok + alpha_ratio) / 3.0, 6)


def rolling_fingerprint(text: Column, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash of the character stream (document fingerprint).

    ``h = (h*31 + ascii(ch)) mod p`` folded over the text via ``aggregate``
    — the classic Rabin–Karp document fingerprint, reproducible in any
    engine with the same fold.
    """
    from pride_spark.functions.strings import chars

    return F.aggregate(
        chars(text),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % mod,
    )
