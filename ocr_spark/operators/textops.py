"""Text-analysis operators for training-data pipelines.

All four stay entirely JVM-side (built-in functions + higher-order lambda
expressions) — no Python worker in the hot path, whole-stage codegen
applies, and every formula is replicated verbatim in the DuckDB oracle SQL
(__spark_entry__.oracle_sql)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: English function words used by the n-gram/stopword heuristics. Fixed —
#: changing this list changes lang_id/quality_score semantics.
STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "an",
)

#: lang_id threshold: fraction of tokens that are stopwords.
LANG_EN_MIN_STOP_RATIO = 0.05


def _tokens(col: str) -> Column:
    return F.split(F.col(col), " ")


def _stop_ratio(col: str) -> Column:
    toks = _tokens(col)
    in_list = ",".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.expr(f"size(filter(split({col}, ' '), t -> t in ({in_list})))")
    return n_stop.cast("double") / F.size(toks).cast("double")


def token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace tokens + a word-regex count (BPE-ish proxy: alphanumeric
    runs), both as bigint."""
    return df.select(
        "doc_id",
        F.size(_tokens(col)).cast("long").alias("n_tokens"),
        F.size(F.expr(f"regexp_extract_all({col}, '[a-z0-9]+', 0)"))
        .cast("long")
        .alias("n_words"),
    )


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Deterministic quality score in [0,1]:
    0.5·min(len/500,1) + 0.3·stopword_ratio + 0.2·(1 − non_text_char_ratio),
    rounded to 4 decimals."""
    length = F.length(F.col(col)).cast("double")
    nontext = (
        F.length(F.regexp_replace(F.col(col), "[a-z0-9 ]", "")).cast("double")
        / length
    )
    score = (
        F.least(length / F.lit(500.0), F.lit(1.0)) * 0.5
        + _stop_ratio(col) * 0.3
        + (F.lit(1.0) - nontext) * 0.2
    )
    return df.select("doc_id", F.round(score, 4).alias("quality"))


def lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Stopword-density language guess: 'en' above threshold, else 'unk'."""
    pred = F.when(
        _stop_ratio(col) >= F.lit(LANG_EN_MIN_STOP_RATIO), F.lit("en")
    ).otherwise(F.lit("unk"))
    return df.select("doc_id", pred.alias("pred_lang"))


def doc_fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Whole-document fingerprint (md5 hex) plus a shingle fingerprint:
    md5 of the sorted distinct 3-word shingles — robust to shingle order,
    equal documents ⇒ equal fingerprints."""
    shingles = F.expr(
        f"case when size(split({col},' ')) < 3 then array()"
        f" else array_sort(array_distinct(transform("
        f"  sequence(1, size(split({col},' ')) - 3 + 1),"
        f"  i -> concat_ws(' ', slice(split({col},' '), i, 3))))) end"
    )
    return df.select(
        "doc_id",
        F.md5(F.col(col)).alias("fp_exact"),
        F.md5(F.concat_ws("|", shingles)).alias("fp_shingle"),
    )


#: PII patterns (RE2-compatible subset so Spark's Java regex and the
#: DuckDB oracle's RE2 agree byte-for-byte), applied in this order.
PII_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_scrub(df: DataFrame, col: str = "text") -> DataFrame:
    """PII scrubbing (the pre-training hygiene pass): replace emails,
    IPv4 addresses, and NANP-style phone numbers with typed tokens and
    count each category — counts are what a production pipeline writes
    to lineage. Entirely JVM-side ``regexp_extract_all`` /
    ``regexp_replace`` (whole-stage codegen, no Python), fixed match
    order email → ip → phone so the engines' replacement text agrees."""
    scrubbed = F.col(col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        sql_pat = pat.replace("\\", "\\\\")  # Spark SQL literal escaping
        counts.append(
            F.size(F.expr(f"regexp_extract_all({col}, '{sql_pat}', 0)"))
            .cast("long")
            .alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select("doc_id", *counts, scrubbed.alias("scrubbed"))


def repetition_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Repetition / boilerplate signal (the C4/Gopher-style quality
    gate): duplicate-word fraction and duplicate-3-gram fraction, both
    1 − distinct/total rounded to 4 decimals, plus the conventional
    boilerplate flag at >0.3 duplicate words. Higher-order array
    expressions only — no shuffle, no Python."""
    words = _tokens(col)
    n_words = F.size(words).cast("double")
    dup_word = F.lit(1.0) - F.size(F.array_distinct(words)).cast("double") / n_words
    grams = F.expr(
        f"case when size(split({col},' ')) < 3 then array()"
        f" else transform(sequence(1, size(split({col},' ')) - 2),"
        f"  i -> concat_ws(' ', slice(split({col},' '), i, 3))) end"
    )
    n_grams = F.size(grams).cast("double")
    dup_gram = F.when(
        n_grams > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / n_grams,
    ).otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        F.round(dup_word, 4).alias("dup_word_frac"),
        F.round(dup_gram, 4).alias("dup_3gram_frac"),
        (dup_word > 0.3).alias("is_repetitive"),
    )


def top_terms_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 20
) -> DataFrame:
    """Corpus top-k terms by document frequency (the vocabulary-pruning
    primitive of a training-data pipeline): explode distinct per-doc
    tokens → count per token → top-k with (df desc, token asc) total
    order. The explode carries only (token, doc_id); partial aggregation
    combines map-side before the single exchange on token."""
    toks = df.select(
        F.col(id_col).alias("did"),
        F.explode(F.array_distinct(_tokens(text_col))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.count("*").cast("long").alias("doc_freq")
    )
    return counts.orderBy(F.col("doc_freq").desc(), F.col("token").asc()).limit(k)


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document: tf = occurrences/doc_len,
    idf = ln(N/df), score rounded to 4 decimals (absorbs last-ulp libm
    differences across engines). Two shuffles total — (token) for the
    document frequencies and (doc) for the per-doc top-k window — with
    partial aggregation on both; the df side is a token→count table,
    broadcastable at any corpus size with a bounded vocabulary."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("did"),
        F.explode(_tokens(text_col)).alias("token"),
    )
    tf = toks.groupBy("did", "token").agg(F.count("*").alias("n"))
    doc_len = toks.groupBy("did").agg(F.count("*").alias("len"))
    dfreq = (
        toks.select("did", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    # corpus size as a broadcast 1-row aggregate, NOT a driver-side
    # count(): the whole query stays lazy and runs as one job
    n_docs = df.agg(F.countDistinct(F.col(id_col)).alias("__nd"))
    scored = (
        tf.join(doc_len, "did")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("n") / F.col("len")) * F.log(F.col("__nd") / F.col("df")),
                4,
            ),
        )
    )
    w = Window.partitionBy("did").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("did").alias("doc_id"), "token", "rank", "tfidf")
    )
