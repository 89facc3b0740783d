"""Text-analysis primitives for large-scale training-data pipelines.

All hot-path functions are native Spark SQL expressions (codegen,
no Python workers): tokenization, stopword scoring, language-ID
heuristic, quality metrics, fingerprints. Each builder has a DuckDB
twin generated from the SAME constants so the oracle can't drift.

Scale: every expression is per-row — no shuffle, embarrassingly
parallel, works identically on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small: the heuristic's job is "dominant
# function words", not full lexicons.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "von", "nicht"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour", "dans"),
    "zh": ("的", "是", "了", "在", "我", "有", "他", "这", "中"),
}

PUNCT_CLASS = r"""[.,;:!?'"()\[\]{}-]"""

# ---- tokenization (whitespace) -------------------------------------------

TOKENS_EXPR = r"split(lower(trim({c})), '\\s+')"
TOKENS_SQL = r"string_split_regex(lower(trim({c})), '\s+')"


def tokens(col: str = "text") -> Column:
    return F.expr(TOKENS_EXPR.format(c=col))


def n_tokens(col: str = "text") -> Column:
    return F.when(F.trim(F.col(col)) == "", F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def n_tokens_sql(col: str = "text") -> str:
    t = TOKENS_SQL.format(c=col)
    return f"CASE WHEN trim({col}) = '' THEN 0 ELSE len({t}) END"


# ---- BPE-ish regex token count -------------------------------------------

# Word pieces, digit runs, or single non-space symbols — the classic
# pre-tokenizer shape. Kept to a regex subset with identical semantics
# in Java regex (Spark) and RE2-ish (DuckDB).
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def n_bpe_tokens(col: str = "text") -> Column:
    # Pattern goes in as a literal Column (not through F.expr) so the
    # SQL string parser can't eat the \s escape.
    return F.size(F.regexp_extract_all(F.col(col), F.lit(BPE_REGEX), 0))


def n_bpe_tokens_sql(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '{BPE_REGEX}'))"


# ---- stopword hits / language ID -----------------------------------------


def _inlist(words: tuple[str, ...]) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


def stop_hits(lang: str, col: str = "text") -> Column:
    toks = TOKENS_EXPR.format(c=col)
    return F.expr(
        f"size(filter({toks}, t -> t in ({_inlist(STOPWORDS[lang])})))"
    )


def stop_hits_sql(lang: str, col: str = "text") -> str:
    toks = TOKENS_SQL.format(c=col)
    return f"len(list_filter({toks}, t -> t in ({_inlist(STOPWORDS[lang])})))"


def stop_hits_any(col: str = "text") -> Column:
    """Max per-language stopword hits — "contains function words in
    SOME supported language", the minimal quality-gate signal."""
    return F.greatest(*[stop_hits(lang, col) for lang in STOPWORDS])


def lang_id(col: str = "text") -> Column:
    """Predicted language = argmax stopword hits, ties broken by
    lexicographically smallest code ('und' when zero hits everywhere)."""
    langs = sorted(STOPWORDS)
    best = F.greatest(*[stop_hits(lg, col) for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when((best > 0) & (stop_hits(lg, col) == best), F.lit(lg)).otherwise(
            pred
        )
    return pred


def lang_id_sql(col: str = "text") -> str:
    langs = sorted(STOPWORDS)
    best = "greatest(" + ", ".join(stop_hits_sql(lg, col) for lg in langs) + ")"
    whens = "\n".join(
        f"WHEN {best} > 0 AND {stop_hits_sql(lg, col)} = {best} THEN '{lg}'"
        for lg in langs
    )
    return f"CASE {whens} ELSE 'und' END"


# ---- quality metrics ------------------------------------------------------


def punct_count(col: str = "text") -> Column:
    return F.size(F.regexp_extract_all(F.col(col), F.lit(PUNCT_CLASS), 0))


def punct_count_sql(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '{PUNCT_CLASS.replace(chr(39), chr(39) * 2)}'))"


# ---- fingerprinting -------------------------------------------------------

NORMALIZE_EXPR = r"regexp_replace(lower(trim({c})), '\\s+', ' ')"
NORMALIZE_SQL = r"regexp_replace(lower(trim({c})), '\s+', ' ', 'g')"


def fingerprint(col: str = "text") -> Column:
    """md5 of whitespace-collapsed lowercase text — the exact-dedup key."""
    return F.md5(F.expr(NORMALIZE_EXPR.format(c=col)))


def fingerprint_sql(col: str = "text") -> str:
    return f"md5({NORMALIZE_SQL.format(c=col)})"


# ---- PII redaction ---------------------------------------------------------
# Patterns restricted to syntax with IDENTICAL semantics in Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround. Applied in a
# fixed order (email → card → ssn → phone → ip) on both engines so
# overlapping matches resolve identically.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}", "<CARD>"),
    (r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    (r"(\(\d{3}\)\s?|\d{3}[-.])\d{3}[-.]\d{4}", "<PHONE>"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
)


def redact_pii(col: str = "text") -> Column:
    """Chained native regexp_replace — per-row, zero shuffle, runs at
    scan speed; the pre-training scrub pass every corpus needs."""
    out = F.col(col)
    for pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def redact_pii_sql(expr: str) -> str:
    """DuckDB twin (RE2 'g' flag = Spark's replace-all default)."""
    out = expr
    for pat, tag in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{tag}', 'g')"
    return out
