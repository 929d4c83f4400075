"""Text analysis for training-data pipelines — all native expressions.

North-star operators (BASELINE.json): token counting, quality
scoring, language ID, document fingerprinting. Everything is a
Catalyst expression (split/transform/aggregate/xxhash64) — zero
Python in the row path, so these run inside whole-stage codegen and
scale linearly to 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny multilingual stopword lists for the n-gram-free heuristic
#: language scorer. Deliberately small and public-knowledge.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "ist", "den", "nicht"],
    "fr": ["le", "la", "et", "de", "un", "que", "pour", "dans", "est", "les"],
}

#: BPE-ish token pattern: word pieces, numbers, or single punctuation —
#: a public-knowledge approximation of GPT-2-style pre-tokenization.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column, pattern: str = r"\s+") -> Column:
    """Whitespace tokenization; empty strings filtered out."""
    return F.filter(F.split(text, pattern), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish sub-word tokens via regexp extraction."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Heuristic quality score in [0,1]: mean-token-length band,
    alpha ratio, and stopword presence — the standard cheap filters
    a pretraining pipeline applies before expensive scoring."""
    toks = tokens(text)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    mean_len = F.length(F.concat_ws("", toks)).cast("double") / n
    len_ok = F.when((mean_len >= 3) & (mean_len <= 10), 1.0).otherwise(0.5)
    alpha_ratio = (
        F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
        / F.greatest(F.length(text), F.lit(1)).cast("double")
    )
    sw = stopword_ratio(text)
    return F.round((len_ok + alpha_ratio + F.least(sw * 5, F.lit(1.0))) / 3.0, 6)


def lang_scores(text: Column) -> Column:
    """Map of lang → stopword-hit count; argmax is the predicted
    language. Pure expressions; scoring ~100 TB of docs is a scan."""
    toks = tokens(F.lower(text))

    def hits(lang: str):
        # NB: a plain 1-arg lambda per language — extra default args
        # confuse PySpark's higher-order-function arity inspection
        return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))

    return F.map_from_arrays(
        F.array(*[F.lit(l) for l in STOPWORDS]),
        F.array(*[hits(l) for l in STOPWORDS]),
    )


def lang_id(text: Column) -> Column:
    """Predicted language code (ties broken by list order), 'und' if
    no stopword hits at all."""
    scores = lang_scores(text)
    langs = list(STOPWORDS)
    best = F.greatest(*[scores.getItem(l) for l in langs])
    pred = F.coalesce(
        *[F.when(scores.getItem(l) == best, F.lit(l)) for l in langs]
    )
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def fingerprint(text: Column, normalize: bool = True) -> Column:
    """64-bit document fingerprint: xxhash64 over the
    whitespace-normalized, lower-cased text. The exact-dedup key —
    grouping on a long beats grouping on multi-KB strings by an
    order of magnitude in shuffle bytes at 100 TB."""
    t = F.trim(F.lower(F.regexp_replace(text, r"\s+", " "))) if normalize else text
    return F.xxhash64(t)


def shingles(text: Column, k: int = 5) -> Column:
    """Array of k-token shingles (n-grams of the whitespace tokens) —
    the unit set for Jaccard/MinHash near-dup detection."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
