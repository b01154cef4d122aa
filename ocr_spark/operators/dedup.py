"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shape (the part that matters at 100 TB):

- exact: one hash-aggregate on a digest of the text — map-side partial
  combine, no text shuffled (only the 32-byte digest + ids).
- MinHash+LSH: per-doc signatures (Arrow-batched UDF, one pass), band keys
  by built-in md5, then a groupBy on band key → candidate groups. The only
  shuffle is on the (short) band keys; no O(n²) comparisons.
- verification: exact n-gram Jaccard on candidate PAIRS only, with
  JVM-side array_intersect/array_union — Python never sees the text.

MinHash base hash = signed little-endian int128 of md5(f"{seed}:{token}")
— chosen because DuckDB's md5_number computes the identical value, so the
DuckDB oracle can replay signatures bit-for-bit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_NUM_HASHES = 8
DEFAULT_BAND_SIZE = 2


def md5_number(s: str) -> int:
    """Signed little-endian int128 of md5 — equals DuckDB md5_number()."""
    v = int.from_bytes(hashlib.md5(s.encode()).digest(), "little")
    return v - (1 << 128) if v >= (1 << 127) else v


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: digest-groupBy, keeper = min id.

    Aggregates on md5(text) so only digests cross the shuffle.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


def _minhash_batch(num_hashes: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs: list[list[str]] = []
            for text in pdf["text"]:
                toks = set(text.split(" ")) if text else {""}
                sigs.append(
                    [
                        str(min(md5_number(f"{i}:{t}") for t in toks))
                        for i in range(num_hashes)
                    ]
                )
            out = pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})
            yield out

    return fn


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """(id, sig: array<string>) — signature values as strings because the
    hash space is int128 (beyond Spark's long); sig[i] = min over distinct
    tokens of md5_number(f"{i}:{token}")."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.StringType())),
        ]
    )
    return src.mapInPandas(_minhash_batch(num_hashes), schema)


def lsh_bands(
    sigs: DataFrame, band_size: int = DEFAULT_BAND_SIZE
) -> DataFrame:
    """Explode signatures into (band_idx, band_key, doc_id); band_key =
    md5 of the band's joined signature values (built-in, JVM-side)."""
    num_hashes = DEFAULT_NUM_HASHES  # length enforced by minhash_signatures
    bands = []
    n = band_size
    for b in range(num_hashes // n):
        key = F.md5(F.concat_ws("_", *[F.col("sig")[b * n + j] for j in range(n)]))
        bands.append(
            sigs.select(
                F.lit(b).alias("band_idx"), key.alias("band_key"), "doc_id"
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def lsh_candidate_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidate groups:
    (band_idx, band_key, n_docs, min_doc, max_doc) for buckets with >1 doc.
    """
    sigs = minhash_signatures(df, text_col, id_col, num_hashes)
    return (
        lsh_bands(sigs, band_size)
        .groupBy("band_idx", "band_key")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard(
    pairs: DataFrame,
    left_text: str = "text_a",
    right_text: str = "text_b",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity per candidate pair — entirely
    built-in (transform/sequence/array_intersect/array_union), rounded to
    4 decimals. pairs must carry the two text columns."""

    def shingles(col: str):
        # m words → m-n+1 shingles; guard m<n (Spark sequence() descends
        # when stop < start, so an unguarded expression would be wrong)
        return F.expr(
            f"case when size(split({col},' ')) < {n} then array()"
            f" else array_distinct(transform("
            f"  sequence(1, size(split({col},' ')) - {n} + 1),"
            f"  i -> concat_ws(' ', slice(split({col},' '), i, {n})))) end"
        )

    a, b = shingles(left_text), shingles(right_text)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return pairs.withColumn(
        "jaccard",
        F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 4),
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (keeper = lower id, dup_id,
    cosine_r ≥ threshold), exact.

    This is the VERIFY stage of near-dup-by-embedding: at 100 TB the
    candidate pairs come from the hyperplane-bucket join
    (similarity.lsh_bucketed_topk) so only bucket-collisions are scored;
    the all-pairs form here is the exactness baseline the DuckDB oracle
    replays, and what you run on a single bucket's contents. Dot products
    are JVM-side (zip_with/aggregate) in double precision; only ids and
    the rounded score leave the join."""
    from ocr_spark.operators.similarity import with_cosine_expr

    a = emb.select(F.col(id_col).alias("keeper"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("dup_id"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("dup_id") > F.col("keeper"), "inner")
    return (
        pairs.withColumn("cosine_r", F.round(with_cosine_expr("va", "vb"), 4))
        .filter(F.col("cosine_r") >= threshold)
        .select("keeper", "dup_id", "cosine_r")
    )


def _simhash_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = []
        for text in pdf["text"]:
            toks = text.split(" ") if text else []
            acc = [0] * 64
            for t in toks:
                h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                for b in range(64):
                    acc[b] += 1 if (h >> b) & 1 else -1
            v = 0
            for b in range(64):
                if acc[b] > 0:
                    v |= 1 << b
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash (token md5 bits, majority vote) as signed long."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("simhash", T.LongType()),
        ]
    )
    return src.mapInPandas(_simhash_batch, schema)
