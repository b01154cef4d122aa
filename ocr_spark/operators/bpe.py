"""Byte-pair tokenizer with a FIXED literal merge table — the real
token axis for the sequence ops (pack_sequences, chunk_overlap, vocab
budgeting), replacing whitespace word-splitting with subword units the
way an LLM pipeline actually counts tokens.

Algorithm (Sennrich et al., arXiv:1508.07909): start from single
characters, repeatedly merge the adjacent pair with the lowest merge
rank. This implementation fixes the merge table as a literal (no
training pass) and defines encode as TWO left-to-right non-overlapping
passes per merge rank, in rank order, over a space-separated token
string. Two passes per rank are EXACTLY exhaustive application of that
rank: chained occurrences (" a b a b ") share a boundary space, so a
single pass takes every other one; the survivors are then separated by
merged tokens and the second pass takes them all (this argument needs
a != b, asserted at module load — no self-merges). Exhaustive-per-rank
in rank order equals the classic lowest-rank-first loop for a valid
table (every merge operand is a base character or the output of a
strictly earlier merge, also asserted): a rank-r merge only creates
adjacencies INVOLVING its output token, and any pair using that output
has rank > r, so no lower-rank pair can appear once rank r is done.

That representation is what buys the scale shape: the whole encode is a
chain of 48 JVM ``replace`` expressions inside whole-stage codegen —
zero Python, zero exchanges, and the DuckDB oracle replays the exact
same chain with its own ``replace``, so token output is value-checkable
end to end. Word boundaries are pre-tokenized on whitespace (the GPT-2
convention): spaces become a '|' separator character that no merge pair
ever spans.

Reference parity note: the reference repo has no tokenizer (its model
API consumes raw images); this is builder-brief breadth ("token
counting ... a BPE-ish regex"), upgraded to real subword merges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Base alphabet: ids 0-25. Unknown characters (digits, punctuation)
#: tokenize as single chars with id -1 (UNK convention).
BASE_ALPHABET = "abcdefghijklmnopqrstuvwxyz"

#: The fixed merge table, rank order. VALIDITY INVARIANT: each operand
#: is a single base character or the output of a strictly earlier merge,
#: and no merge is a self-merge (both asserted below) — the properties
#: that make rank-order two-pass application equal classic BPE.
MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("e", "r"),
    ("a", "n"),
    ("r", "e"),
    ("o", "n"),
    ("a", "t"),
    ("e", "n"),
    ("o", "r"),
    ("e", "s"),
    ("s", "t"),
    ("a", "r"),
    ("o", "u"),
    ("l", "e"),
    ("an", "d"),
    ("in", "g"),
    ("t", "o"),
    ("i", "s"),
    ("o", "f"),
    ("a", "l"),
    ("e", "d"),
    ("c", "o"),
    ("er", "s"),
)

#: Word separator in the spaced encoding — outside every merge operand,
#: so merges can never cross a word boundary.
_SEP = "|"


def _build_vocab() -> dict[str, int]:
    vocab = {c: i for i, c in enumerate(BASE_ALPHABET)}
    for a, b in MERGES:
        assert a in vocab and b in vocab, f"invalid merge ({a},{b})"
        assert a != b, f"self-merge ({a},{b}) breaks two-pass exhaustion"
        merged = a + b
        assert merged not in vocab, f"duplicate vocab entry {merged}"
        vocab[merged] = len(vocab)
    return vocab


#: token string → fixed id; base chars 0-25, merge outputs 26+ in rank
#: order. Frozen at import (the assert above runs here).
VOCAB: dict[str, int] = _build_vocab()


def encode_word(word: str) -> list[str]:
    """Pure-Python reference encode of one whitespace word (tests +
    documentation of the semantics; the Spark path never calls this)."""
    s = " " + " ".join(word) + " "
    for a, b in MERGES:
        # two passes = exhaustive for this rank (chained occurrences
        # share a boundary space; see module docstring)
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return [t for t in s.split(" ") if t]


def bpe_tokens_expr(col: str) -> Column:
    """Array<string> of BPE tokens for a text column — one JVM
    expression: space out the characters ('|' replaces word spaces),
    run the 24-replace merge chain, split back, drop separators."""
    spaced = F.concat(
        F.lit(" "),
        F.array_join(F.split(F.replace(F.col(col), F.lit(" "), F.lit(_SEP)), ""), " "),
        F.lit(" "),
    )
    chain = spaced
    for a, b in MERGES:
        # two replace calls per rank = exhaustive (module docstring)
        chain = F.replace(chain, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
        chain = F.replace(chain, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    return F.filter(
        F.split(F.trim(chain), " "), lambda t: (t != _SEP) & (t != "")
    )


def bpe_token_count_expr(col: str) -> Column:
    """Long count of BPE tokens — the drop-in token axis for
    pack_sequences / budget math."""
    return F.size(bpe_tokens_expr(col)).cast("long")


def bpe_encode(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, tok_pos, token, token_id) — one row per subword token.

    Scale shape: the merge chain and the posexplode are per-row JVM
    expressions — ZERO exchanges; the parallel axis is documents and
    the output is ~n_chars/2 rows per doc. token_id comes from a
    literal map lookup (UNK → -1), so no dictionary join exists
    anywhere in the plan."""
    vocab_map = F.create_map(
        *[F.lit(x) for kv in VOCAB.items() for x in kv]
    )
    toks = bpe_tokens_expr(col)
    return (
        df.select(F.col(id_col), F.posexplode(toks).alias("tok_pos", "token"))
        .select(
            id_col,
            F.col("tok_pos").cast("int").alias("tok_pos"),
            "token",
            F.coalesce(vocab_map[F.col("token")], F.lit(-1))
            .cast("int")
            .alias("token_id"),
        )
    )


def oracle_merge_chain_sql(expr: str) -> str:
    """The DuckDB replay of the merge chain over a spaced-encoding SQL
    expression — textually unrolled, TWO replaces per rank, the same
    exhaustive-per-rank semantics as the Spark chain."""
    chain = expr
    for a, b in MERGES:
        # doubled like the Spark chain: two passes per rank
        chain = f"replace({chain}, ' {a} {b} ', ' {a}{b} ')"
        chain = f"replace({chain}, ' {a} {b} ', ' {a}{b} ')"
    return chain


def oracle_vocab_values_sql() -> str:
    """VALUES list of (token, id) for the oracle's id lookup."""
    return ", ".join(f"('{t}', {i})" for t, i in VOCAB.items())


def token_compression(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document tokenizer-compression quality signals: UTF-8 bytes
    per BPE token and BPE tokens per whitespace word (fertility).
    Low bytes/token means the merge table barely compresses the text
    (digit soup, non-Latin noise — single-char UNK tokens); high
    fertility means words shatter into many subwords. Both are standard
    corpus-quality filters in tokenizer-aware data pipelines.

    Integer micro-units via BIGINT floor division (DIV here, ``//`` in
    the DuckDB oracle) — no float ever enters, so the oracle replay is
    exact. Scale shape: per-row JVM expressions only (the merge chain +
    octet_length + size), ZERO exchanges; NULL-text docs are filtered
    on both engines and empty docs clamp the divisor to 1."""
    n_bytes = F.octet_length(F.col(col)).cast("long")
    n_tokens = bpe_token_count_expr(col)
    n_words = F.size(F.split(F.col(col), " ")).cast("long")
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.col(id_col),
            n_bytes.alias("n_bytes"),
            n_tokens.alias("n_tokens"),
            n_words.alias("n_words"),
        )
        .select(
            id_col,
            "n_bytes",
            "n_tokens",
            "n_words",
            F.expr("n_bytes * 1000000 DIV greatest(n_tokens, 1)")
            .cast("long")
            .alias("bytes_per_token_micro"),
            F.expr("n_tokens * 1000000 DIV greatest(n_words, 1)")
            .cast("long")
            .alias("tokens_per_word_micro"),
        )
    )


#: bpe_train iteration count. Fixed — the oracle unrolls exactly this
#: many argmax-merge stages.
BPE_TRAIN_ITERS = 6


def bpe_train(
    df: DataFrame, col: str = "text", iters: int = BPE_TRAIN_ITERS
) -> DataFrame:
    """BPE merge-table TRAINING on the corpus (Sennrich et al.,
    arXiv:1508.07909 algorithm 1): starting from single characters,
    repeat ``iters`` times — count all adjacent token pairs across the
    corpus, pick the most frequent (count desc, then pair string asc:
    fully deterministic), merge it everywhere. Returns the learned
    table, one row per rank: (rank, left, right, pair_count) — the
    corpus-derived counterpart of the fixed literal MERGES table.

    Variant note: self-pairs (left == right) are excluded from the
    candidates — the two-pass replace used for exhaustive application
    (module docstring) relies on left != right, and excluding them
    keeps training and encoding semantics aligned.

    Scale shape: per iteration, pair extraction is per-row JVM array
    expressions over the evolving spaced encoding; the count is ONE
    keyed aggregation with map-side partials; the argmax is a
    distributed TakeOrdered(1) whose single row is collected (the
    bounded-driver-side pattern shared with the IVF quantizer and the
    perplexity thresholds) and applied as a LITERAL replace in the next
    iteration's expression — so the plan depth is a constant and no
    corpus row ever crosses an exchange as text. The DuckDB oracle
    unrolls the same ``iters`` stages with MATERIALIZED per-stage CTEs
    and replays counts, tie-breaks, and merges bit-for-bit."""
    spaced = F.concat(
        F.lit(" "),
        F.array_join(
            F.split(F.replace(F.col(col), F.lit(" "), F.lit(_SEP)), ""), " "
        ),
        F.lit(" "),
    )
    cur = df.filter(F.col(col).isNotNull()).select(spaced.alias("s"))
    learned: list[tuple[int, str, str, int]] = []
    cur = cur.persist()
    caches = [cur]
    for rank in range(iters):
        # HOIST the token array before the lambda touches it — the
        # split-inside-transform form re-splits per element access
        # (the O(chars²) trap, CLAUDE.md; measured 350 s → <20 s at
        # sf0.1 for this operator)
        toks = cur.select(F.split(F.trim(F.col("s")), " ").alias("__w"))
        pairs = (
            toks.select(
                F.explode(
                    # sequence() DESCENDS when hi < lo — guard docs too
                    # short to form a pair (CLAUDE.md gotcha)
                    F.expr(
                        "CASE WHEN size(__w) >= 2 THEN"
                        " transform(sequence(1, size(__w) - 1),"
                        "  i -> struct(element_at(__w, i) AS l,"
                        "              element_at(__w, i + 1) AS r))"
                        " ELSE CAST(array() AS"
                        "  ARRAY<STRUCT<l: STRING, r: STRING>>) END"
                    )
                ).alias("p")
            )
            .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .filter(
                (F.col("l") != _SEP)
                & (F.col("r") != _SEP)
                & (F.col("l") != F.col("r"))
            )
        )
        best = (
            pairs.groupBy("l", "r")
            .agg(F.count("*").alias("cnt"))
            .orderBy(
                F.desc("cnt"), F.asc(F.concat_ws(" ", "l", "r"))
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0].l, best[0].r, int(best[0].cnt)
        learned.append((rank, a, b, cnt))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        # two passes per rank = exhaustive (left != right enforced);
        # persist each round so iteration k+1 reads the merged strings
        # from cache instead of replaying the whole replace chain from
        # the source (the iterative-algorithm checkpoint convention)
        cur = cur.select(
            F.replace(
                F.replace(F.col("s"), F.lit(pat), F.lit(rep)),
                F.lit(pat),
                F.lit(rep),
            ).alias("s")
        ).persist()
        caches.append(cur)
    for c in caches:
        c.unpersist(False)  # training is fully collected — release now
    spark = df.sparkSession
    return spark.createDataFrame(
        learned, "rank int, left string, right string, pair_count long"
    )


def oracle_bpe_train_sql(iters: int = BPE_TRAIN_ITERS) -> str:
    """DuckDB replay of :func:`bpe_train` over the ``documents`` view:
    ``iters`` unrolled stages, each a MATERIALIZED pair count + argmax
    (count desc, pair asc) + literal-free merge application via a cross
    join against the 1-row best table (replace doubled per rank, the
    exhaustive-application convention)."""
    parts = [
        "WITH t0 AS MATERIALIZED (SELECT ' ' || array_to_string("
        "  string_split(replace(text, ' ', '|'), ''), ' ') || ' ' AS s"
        "  FROM documents WHERE text IS NOT NULL)"
    ]
    for k in range(iters):
        parts.append(
            f", p{k} AS MATERIALIZED (SELECT w[u.i] AS l, w[u.i + 1] AS r,"
            f"  COUNT(*) AS cnt FROM"
            f"  (SELECT string_split(trim(s), ' ') AS w FROM t{k}) tw,"
            f"  LATERAL unnest(range(1, greatest(len(w), 1))) u(i)"
            f"  WHERE w[u.i] <> '|' AND w[u.i + 1] <> '|'"
            f"   AND w[u.i] <> w[u.i + 1]"
            f"  GROUP BY 1, 2)"
            f", b{k} AS MATERIALIZED (SELECT l, r, cnt FROM p{k}"
            f"  ORDER BY cnt DESC, l || ' ' || r LIMIT 1)"
            f", t{k + 1} AS MATERIALIZED (SELECT replace(replace(t.s,"
            f"  ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' '),"
            f"  ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' ')"
            f"  AS s FROM t{k} t, b{k} b)"
        )
    sel = " UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS rank, l AS \"left\", r AS \"right\","
        f" CAST(cnt AS BIGINT) AS pair_count FROM b{k}"
        for k in range(iters)
    )
    parts.append(" " + sel)
    return "".join(parts)
