"""Text-analysis column expressions for training-data pipelines.

All pure Catalyst (whole-stage codegen; no UDFs), and each has an exact ANSI
SQL restatement for the DuckDB oracle:

- token_count: whitespace tokenization
- lang_id: n-gram/character heuristic (ascii ratio + English stopword hits
  vs CJK character presence)
- quality_score: length / punctuation / stopword-ratio composite
- doc_fingerprint: md5 of normalized text (content identity)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "from", "this", "that", "be",
]


def norm_ws(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def tokens(col: Column) -> Column:
    return F.split(norm_ws(F.lower(col)), " ")


def token_count(col: Column) -> Column:
    return F.when(F.length(norm_ws(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    ).cast("long")


# GPT-2-style pretokenizer, simplified to the lookahead-free core so Java
# regex (Spark) and RE2 (DuckDB) match IDENTICALLY: contractions, unicode
# letter runs, digit runs, punctuation runs — each with an optional leading
# space (the "BPE-ish" token estimate the training-data brief asks for;
# counts track tiktoken within a few % on prose)
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_ish_tokens(col: Column) -> Column:
    """array<string> of BPE-ish pretokens (regexp_extract_all, pure Catalyst)."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(bpe_ish_tokens(col)).cast("long")


def stopword_count(col: Column) -> Column:
    return F.size(
        F.filter(tokens(col), lambda t: t.isin(EN_STOPWORDS))
    ).cast("long")


def ascii_ratio(col: Column) -> Column:
    """fraction of characters that are printable ASCII."""
    n = F.length(col)
    n_ascii = F.length(F.regexp_replace(col, r"[^\x20-\x7E]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(n_ascii / n)


def cjk_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[^一-鿿]", "")).cast("long")


def lang_id(col: Column) -> Column:
    """Heuristic language ID: zh if CJK-dominant, en if stopword-bearing
    ASCII, else 'other' — the cheap n-gram-free classifier a 100 TB pass can
    afford before a model-based one."""
    n = F.length(col)
    zh = (cjk_count(col) * 5) > n  # >20% CJK chars
    stop_ratio = F.when(token_count(col) == 0, F.lit(0.0)).otherwise(
        stopword_count(col) / token_count(col)
    )
    en = (ascii_ratio(col) > 0.8) & (stop_ratio > 0.03)
    return (
        F.when(zh, F.lit("zh")).when(en, F.lit("en")).otherwise(F.lit("other"))
    )


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    n_punct = n - F.length(F.regexp_replace(col, r"[.,!?;:'\"()\[\]{}-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(n_punct / n)


def quality_score(col: Column) -> Column:
    """Composite quality in [0, 1]: length band + stopword presence + sane
    punctuation + mean token length band.  Deterministic arithmetic only."""
    n_tok = token_count(col)
    n_chars = F.length(norm_ws(col))
    mean_tok_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        (n_chars - (n_tok - 1)) / n_tok
    )
    stop_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(stopword_count(col) / n_tok)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(stop_ratio / F.lit(0.2), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) / F.lit(0.2), F.lit(1.0))
    tok_len_score = F.when(
        (mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round(
        0.4 * len_score + 0.2 * stop_score + 0.2 * punct_score + 0.2 * tok_len_score, 6
    )


def doc_fingerprint(col: Column) -> Column:
    return F.md5(norm_ws(F.lower(col)))
