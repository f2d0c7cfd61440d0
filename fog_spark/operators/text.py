"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All native Column expressions (codegen'd); the
heuristics are deliberately simple + deterministic so DuckDB oracles can
reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fog_spark.hashing import pmod
from fog_spark.operators.dedup import tokenize_col

# tiny per-language stopword lists — enough signal for a heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "dans", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "en", "un", "por", "con"],
}


def token_count_col(text: Column) -> Column:
    """Whitespace-ish token count (letters+digits runs)."""
    return F.size(tokenize_col(text))


def bpe_ish_piece_count(text: Column) -> Column:
    """Crude BPE-like subword proxy: count of maximal runs matching
    letters | digits | single non-space symbol — a stable upper-ish bound
    on tokenizer pieces, cheap enough for 100 TB scans."""
    pieces = F.filter(
        F.split(text, r"\s+"), lambda t: F.length(t) > 0
    )
    return F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("int"),
    )


# GPT-2-style pre-tokenizer (Radford et al. 2019, public regex), ASCII
# form so Java regex (Spark) and RE2 (DuckDB) agree match-for-match:
# contraction suffixes | space?-letters | space?-digit-chunks(<=3, the
# GPT-4-style number split) | space?-symbol-runs. Whitespace itself is
# never a piece (real BPE folds it into the next token's leading space).
# Whitespace is spelled as an EXPLICIT class, not \s: Java's \s includes
# \x0B (vertical tab) while RE2's does not, so \s would silently
# misalign the two engines on VT-bearing crawl text.
_WS = " \\t\\n\\x0B\\f\\r"
PRETOKEN_RE = rf"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]{{1,3}}| ?[^{_WS}A-Za-z0-9]+"


def pretoken_count(text: Column) -> Column:
    """Count of GPT-2-style pre-tokenizer pieces — the budget number a
    training pipeline actually schedules by (BPE merges only ever split
    WITHIN a pre-token, so this is a tight, deterministic lower bound on
    subword count at ~zero cost: one codegen'd regexp scan, no vocab).
    """
    return F.size(F.regexp_extract_all(text, F.lit(PRETOKEN_RE), 0)).cast("long")


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, mean_token_len, alpha_ratio, punct_ratio,
    stopword_ratio, quality_score) — classic cheap quality signals."""
    t = F.col(text_col)
    toks = tokenize_col(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(en_stop, x)))
    mean_tok = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.4
        + alpha_ratio * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.1
    )
    # raw doubles on purpose: per-row IEEE arithmetic is bit-identical
    # across engines (unlike ROUND, whose half-way rule differs), so the
    # DuckDB oracle matches exactly.
    return docs.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_tok.alias("mean_token_len"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred): stopword-hit argmax across languages, ties broken
    by language code order; 'und' when nothing matches."""
    toks = tokenize_col(F.col(text_col))
    # max over (hits, -alpha_index) -> ties pick the alphabetically first
    entries = []
    for i, lang in enumerate(sorted(STOPWORDS)):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        entries.append(F.struct(hits.alias("hits"), F.lit(-i).alias("ni"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*entries))
    return docs.select(
        F.col(id_col).alias("id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint): order-sensitive rolling (polynomial) hash over
    token hashes — a cheap content fingerprint stable across storage
    layout. fp = fold(tokens, acc -> (acc*31 + pmod(xxhash64(tok), 1e15)) % 1e15)."""
    toks = tokenize_col(F.col(text_col))
    mod = F.lit(1_000_000_000_000_007)
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: pmod(acc * 31 + pmod(F.xxhash64(t), F.lit(10**15)), mod),
    )
    return docs.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))


def doc_fingerprint_portable(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive position-weighted fingerprint, portable to SQL
    oracles: fp = sum over tokens of i * (hex2int(md5(tok)[0:12]) % 1e12),
    i = 1-based position. Pure long arithmetic, per-row, no shuffle."""
    toks = tokenize_col(F.col(text_col))
    tok_h = lambda t: pmod(  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long"),
        F.lit(1_000_000_000_000),
    )
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)))
    weighted = F.when(F.size(toks) > 0, F.zip_with(
        toks, F.slice(idx, 1, F.size(toks)), lambda t, i: i.cast("long") * tok_h(t)
    )).otherwise(F.array().cast("array<bigint>"))
    fp = F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)
    return docs.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))


def _max_equal_run(sorted_arr: Column) -> Column:
    """Longest run of equal consecutive elements in a SORTED array —
    i.e. the max multiplicity of any element. One O(n) fold after an
    O(n log n) per-row sort: the scale-honest way to get per-document
    top-n-gram counts (an explode + groupBy per document would shuffle
    the whole corpus; a transform/filter nest would be O(n^2) per row)."""
    step = lambda a, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(a["prev"] == x, a["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            a["best"],
            F.when(a["prev"] == x, a["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    return F.aggregate(sorted_arr, init, step)["best"]


def _ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as joined strings; empty when fewer than n tokens."""
    k = F.size(toks)
    return F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(1), k - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals, one row per document:

    - dup_token_ratio:   1 - distinct_tokens / n_tokens
    - top_bigram_frac:   occurrences of the most frequent word 2-gram /
                         total 2-grams
    - top_trigram_frac:  same for 3-grams
    - dup_line_ratio:    1 - distinct_lines / n_lines (newline-split)

    Boilerplate, keyword-stuffed, and template-generated crawl pages
    score high on these; training-corpus prep filters on them (Gopher,
    Rae et al. 2021, table A1). All pure Column expressions — per-row
    O(n log n), no shuffles, no UDFs."""
    t = F.col(text_col)
    toks = tokenize_col(t)
    n_tok = F.size(toks)
    dup_tok = F.when(
        n_tok > 0, 1.0 - F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))

    def top_frac(grams: Column) -> Column:
        total = F.size(grams)
        return F.when(
            total > 0, _max_equal_run(F.array_sort(grams)) / total
        ).otherwise(F.lit(0.0))

    lines = F.filter(F.split(t, r"\n"), lambda x: F.length(x) > 0)
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0, 1.0 - F.size(F.array_distinct(lines)) / n_lines
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).alias("id"),
        dup_tok.alias("dup_token_ratio"),
        top_frac(_ngrams(toks, 2)).alias("top_bigram_frac"),
        top_frac(_ngrams(toks, 3)).alias("top_trigram_frac"),
        dup_line.alias("dup_line_ratio"),
    )
