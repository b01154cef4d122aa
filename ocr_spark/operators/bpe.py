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
