"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All four are single-pass, shuffle-free column expressions (whole-stage
codegen) — at 100 TB these run at parquet-scan speed with `text` as the
only column read (column pruning).  Every formula is reproducible in
ANSI SQL; `__spark_entry__.oracle_sql` carries the DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RX = "[a-z0-9]+"

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (deterministic; NOT a general model — the container has no
# langid/fasttext, and the synthetic corpora only need separability)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
}


def token_count(col: Column) -> Column:
    """BPE-ish regex token count (maximal [a-z0-9]+ runs of the lowercased
    text) — the tokenizer contract shared with the index engine."""
    return F.regexp_count(F.lower(col), F.lit(TOKEN_RX))


def ws_token_count(col: Column) -> Column:
    """Whitespace token count (size of split on runs of whitespace)."""
    t = F.trim(col)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def tokens_array(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RX), 0)


def stopword_hits(col: Column, stopwords: list[str]) -> Column:
    """Number of tokens that are stopwords."""
    toks = tokens_array(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def round4(x: Column) -> Column:
    """floor(x·10⁴ + 0.5)/10⁴ — engine-agnostic half-up rounding.

    The features are rationals (token/char counts), so a score can land
    EXACTLY on a .00005 boundary (observed at sf0.1: 0.84025); Spark's
    BigDecimal-of-double round and DuckDB's round() then disagree on the
    same double.  floor(x·1e4 + 0.5) is a pure IEEE expression — both
    engines compute identical bits from identical inputs.  Values are
    non-negative here (half-up == half-away-from-zero)."""
    return F.floor(x * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score in [0,1].

    Features (all deterministic, SQL-reproducible):
      n_chars, n_tokens, avg_token_len, alpha_ratio (alnum+space chars /
      chars), stopword_ratio (en), and quality_score =
      0.4*min(n_tokens/100,1) + 0.3*alpha_ratio + 0.3*min(stop_ratio*5,1),
      rounded to 4 places (engine-agnostic half-up — see round4).
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    alnum = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", ""))
    alpha_ratio = F.when(n_chars > 0, alnum / n_chars).otherwise(F.lit(0.0))
    stop = stopword_hits(c, LANG_STOPWORDS["en"])
    stop_ratio = F.when(n_tokens > 0, stop / n_tokens).otherwise(F.lit(0.0))
    avg_tok = F.when(n_tokens > 0, alnum / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return df.select(
        "*",
        n_tokens.alias("n_tokens"),
        round4(avg_tok).alias("avg_token_len"),
        round4(alpha_ratio).alias("alpha_ratio"),
        round4(stop_ratio).alias("stopword_ratio"),
        round4(score).alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID: argmax over per-language stopword counts,
    ties broken by language code ascending; no hits at all → 'und'."""
    c = F.col(text_col)
    scored = F.array(
        *[
            F.struct(
                stopword_hits(c, sw).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang, sw in sorted(LANG_STOPWORDS.items())
        ]
    )
    # max by (hits desc, lang asc): sort by (-hits, lang) and take first
    best = F.array_sort(
        scored,
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    ).getItem(0)
    return df.withColumn(
        out_col, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def ngrams_col(col: Column, n: int) -> Column:
    """ALL word n-grams (non-distinct — repetition counting needs the
    multiplicity), space-joined, JVM-side."""
    toks = tokens_array(col)
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1),
    simplified to multiplicative char accounting (count × gram length —
    no overlap subtraction):

      top_ngram_char_frac — chars covered by the single most frequent
        top_n-gram (tie → lexicographically smallest gram), / n_chars.
      dup_ngram_char_frac — chars covered by dup_n-grams occurring ≥2
        times (Σ count·len(gram)), / n_chars.

    Shape: one explode + (doc, gram) count per n — two shuffles total,
    both map-side combined; the per-doc reduction is aggregate-only (max
    count, then min gram among ties — no windows)."""
    c = F.col(text_col)
    base = df.select(
        F.col(id_col).alias("doc"), F.length(c).alias("n_chars"),
        ngrams_col(c, top_n).alias("_g_top"), ngrams_col(c, dup_n).alias("_g_dup"),
    )
    top_counts = (
        base.select("doc", F.explode("_g_top").alias("g"))
        .groupBy("doc", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top_max = top_counts.groupBy("doc").agg(F.max("cnt").alias("mx"))
    top = (
        top_counts.join(top_max, "doc")
        .filter(F.col("cnt") == F.col("mx"))
        .groupBy("doc")
        .agg(F.min("g").alias("top_gram"), F.first("mx").alias("top_cnt"))
    )
    dup = (
        base.select("doc", F.explode("_g_dup").alias("g"))
        .groupBy("doc", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc")
        .agg(
            F.sum(
                F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("g")).otherwise(0)
            ).alias("dup_chars")
        )
    )
    sizes = base.select("doc", "n_chars")
    out = (
        sizes.join(top, "doc", "left")
        .join(dup, "doc", "left")
        .fillna({"top_cnt": 0, "dup_chars": 0})
    )
    return out.select(
        "doc",
        F.round(
            F.when(
                F.col("n_chars") > 0,
                F.coalesce(F.col("top_cnt") * F.length("top_gram"), F.lit(0))
                / F.col("n_chars"),
            ).otherwise(0.0),
            6,
        ).alias("top_ngram_char_frac"),
        F.round(
            F.when(F.col("n_chars") > 0, F.col("dup_chars") / F.col("n_chars")).otherwise(0.0),
            6,
        ).alias("dup_ngram_char_frac"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 over the space-joined sorted distinct
    token set (the classic 'fingerprint clustering' key — whitespace/
    ordering/duplication-insensitive)."""
    toks = F.array_sort(F.array_distinct(tokens_array(F.col(text_col))))
    return df.withColumn(out_col, F.md5(F.array_join(toks, " ")))
