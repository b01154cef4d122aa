"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is tiny and broadcast; the corpus side streams, dot
  products run JVM-side via zip_with/aggregate in double precision
  (sequential left-to-right fold — bit-identical to a naive loop, which is
  what the DuckDB oracle computes). Ranking ties break on neighbor id.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane (SimHash-style)
  sign buckets from deterministic md5-derived planes; candidates = bucket
  collisions only, then exact rerank. At 100 TB the bucket join replaces
  the all-pairs cross product; the bucket key is a short int, so the
  shuffle moves ids+keys, not vectors.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out,
        _dot(a, b)
        / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (q_id, neighbor_id, rank, cosine_r).

    queries is expected to be small → broadcast nested-loop join; corpus
    scan is a single pass, ranking via a per-query window. cosine rounded
    to 4 decimals (stable across engines at double precision).
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .withColumn("cosine_r", F.round(with_cosine_expr("q_vec", "c_vec"), 4))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cosine_r")
    )


def with_cosine_expr(a: str, b: str):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _plane(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1): derived
    from md5, so any engine (or the oracle) can regenerate it."""
    out = []
    for d in range(dim):
        h = int.from_bytes(
            hashlib.md5(f"plane:{plane_idx}:{d}".encode()).digest()[:8], "little"
        )
        out.append(h / float(1 << 63) - 1.0)
    return out


def _table_code(vec_col: str, table_idx: int, num_planes: int, dim: int):
    """Sign-bit code of one hash table: num_planes fixed hyperplanes."""
    code = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = _plane(table_idx * num_planes + p, dim)
        arr = "array(" + ",".join(f"cast({x!r} as double)" for x in plane) + ")"
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> cast(x as double) * y),"
            f" cast(0.0 as double), (acc, v) -> acc + v)"
        )
        code = code + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return code


def hyperplane_buckets(
    df: DataFrame,
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table_idx, bucket) — one sign-bit code per hash table.

    Multiple independent tables are what make hyperplane LSH usable: a
    single b-plane table finds a cosine-c neighbor with probability
    (1-θ/π)^b (≈2.5% for c≈0.4, b=8); L tables of b planes lift that to
    1-(1-(1-θ/π)^b)^L (≈80% for b=4, L=8) — same banding trick as the
    MinHash LSH in dedup.py. Planes are md5-derived literals in the plan;
    all dot products JVM-side."""
    codes = F.array(
        *[_table_code(vec_col, t, num_planes, dim) for t in range(num_tables)]
    )
    return df.select(
        F.col(id_col).alias("vec_id"), F.posexplode(codes).alias("table_idx", "bucket")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates collide with the query in ANY hash
    table, then exact rerank. Recall < 1 by construction; the exact scan
    (cosine_topk) is the quality oracle, not an equality target.

    Scale shape: the bucket join moves only (id, table_idx, bucket) —
    never vectors; candidate ids are distinct-ed and vectors re-attached
    by id afterwards, so the heavy columns cross the wire once per
    SURVIVING candidate, not once per bucket collision."""
    cb = hyperplane_buckets(corpus, num_planes, num_tables, dim, id_col, vec_col)
    qb = hyperplane_buckets(queries, num_planes, num_tables, dim, id_col, vec_col).select(
        F.col("vec_id").alias("q_id"), "table_idx", "bucket"
    )
    cand = (
        cb.join(F.broadcast(qb), ["table_idx", "bucket"], "inner")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    scored = (
        cand.join(
            corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")),
            "vec_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
                )
            ),
            "q_id",
        )
        .withColumn("cosine_r", F.round(with_cosine_expr("q_vec", "c_vec"), 4))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_r").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank", "cosine_r")
    )
