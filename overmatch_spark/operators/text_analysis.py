"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All pure
Catalyst expressions with exact DuckDB SQL twins."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein", "nicht"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie-break order


def words(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace tokens + a BPE-ish subword estimate (ceil of chars/4
    for long words), the standard cheap proxy."""
    return F.size(words(text)).cast("long")


def sql_token_count(text: str) -> str:
    return f"CAST(len(string_split({text}, ' ')) AS BIGINT)"


def bpe_ish_token_estimate(text: Column) -> Column:
    """sum over words of max(1, ceil(len/4)) — a deterministic
    subword-token estimate."""
    return F.aggregate(
        words(text),
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(F.lit(1).cast("long"), F.ceil(F.length(w) / F.lit(4.0)).cast("long")),
    )


def sql_bpe_ish_token_estimate(text: str) -> str:
    return (
        f"list_reduce(list_transform(string_split({text}, ' '), "
        f"w -> greatest(CAST(1 AS BIGINT), CAST(ceil(length(w) / 4.0) AS BIGINT))), "
        f"(a, b) -> a + b)"
    )


def stopword_hits(text: Column, lang: str) -> Column:
    lst = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(words(text), lambda w: F.array_contains(lst, w))).cast(
        "long"
    )


def sql_stopword_hits(text: str, lang: str) -> str:
    lst = "[" + ", ".join(f"'{s}'" for s in STOPWORDS[lang]) + "]"
    return (
        f"CAST(len(list_filter(string_split({text}, ' '), "
        f"w -> list_contains({lst}, w))) AS BIGINT)"
    )


def lang_id(text: Column) -> Column:
    """Greedy stopword-count language ID; ties resolve in LANG_ORDER,
    zero hits -> 'unknown'."""
    hits = {lang: stopword_hits(text, lang) for lang in LANG_ORDER}
    best = None
    for lang in LANG_ORDER:
        cond = F.lit(True)
        for other in LANG_ORDER:
            if other == lang:
                continue
            if LANG_ORDER.index(other) < LANG_ORDER.index(lang):
                cond = cond & (hits[lang] > hits[other])
            else:
                cond = cond & (hits[lang] >= hits[other])
        cond = cond & (hits[lang] > 0)
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise(F.lit("unknown"))


def sql_lang_id(text: str) -> str:
    hits = {lang: sql_stopword_hits(text, lang) for lang in LANG_ORDER}
    whens = []
    for lang in LANG_ORDER:
        conds = []
        for other in LANG_ORDER:
            if other == lang:
                continue
            op = ">" if LANG_ORDER.index(other) < LANG_ORDER.index(lang) else ">="
            conds.append(f"({hits[lang]}) {op} ({hits[other]})")
        conds.append(f"({hits[lang]}) > 0")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'unknown' END"


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]:
    0.4*min(1, len/500) + 0.3*unique-word ratio + 0.3*(1 - mean-word-
    length penalty). Rounded to 9 dp for cross-engine hashing."""
    n_chars = F.length(text).cast("double")
    w = words(text)
    n_words = F.size(w).cast("double")
    uniq = F.size(F.array_distinct(w)).cast("double")
    mean_wl = (n_chars - (n_words - F.lit(1.0))) / n_words
    penalty = F.least(F.lit(1.0), F.abs(mean_wl - F.lit(5.0)) / F.lit(5.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_chars / F.lit(500.0))
        + F.lit(0.3) * (uniq / n_words)
        + F.lit(0.3) * (F.lit(1.0) - penalty)
    )
    return F.round(score, 9)


def sql_quality_score(text: str) -> str:
    w = f"string_split({text}, ' ')"
    n_chars = f"CAST(length({text}) AS DOUBLE)"
    n_words = f"CAST(len({w}) AS DOUBLE)"
    uniq = f"CAST(len(list_distinct({w})) AS DOUBLE)"
    mean_wl = f"(({n_chars} - ({n_words} - 1.0)) / {n_words})"
    penalty = f"least(1.0, abs({mean_wl} - 5.0) / 5.0)"
    return (
        f"round(0.4 * least(1.0, {n_chars} / 500.0) "
        f"+ 0.3 * ({uniq} / {n_words}) "
        f"+ 0.3 * (1.0 - {penalty}), 9)"
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lowercased text (exact, engine-portable)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def sql_fingerprint(text: str) -> str:
    return f"md5(lower(regexp_replace(trim({text}), '\\s+', ' ', 'g')))"
