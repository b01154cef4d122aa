"""BPE tokenizer: fixed literal merge table, JVM replace-chain encode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import bpe


def test_merge_table_validity_invariant():
    # every operand must be a base char or an earlier merge's output —
    # the property that makes rank-order single-pass application match
    # lowest-rank-first BPE (enforced at import by _build_vocab)
    seen = set(bpe.BASE_ALPHABET)
    for a, b in bpe.MERGES:
        assert a in seen and b in seen, (a, b)
        seen.add(a + b)


def test_vocab_ids_are_stable():
    assert bpe.VOCAB["a"] == 0 and bpe.VOCAB["z"] == 25
    assert bpe.VOCAB["th"] == 26  # first merge
    assert bpe.VOCAB["the"] == 27
    assert bpe.VOCAB["ers"] == 25 + len(bpe.MERGES)  # last merge
    assert len(bpe.VOCAB) == 26 + len(bpe.MERGES)


@pytest.mark.parametrize(
    "word,want",
    [
        ("the", ["the"]),
        ("thinking", ["th", "in", "k", "ing"]),
        ("understand", ["u", "n", "d", "er", "st", "and"]),
        ("errors", ["er", "r", "or", "s"]),
        ("a", ["a"]),
        ("", []),
        ("zebra7", ["z", "e", "b", "r", "a", "7"]),  # digit = UNK char
    ],
)
def test_encode_word_reference(word, want):
    assert bpe.encode_word(word) == want


def test_chained_merges_apply_in_rank_order():
    # 'and' needs (a,n) first; 'ing' needs (i,n); 'ers' needs (e,r)
    assert bpe.encode_word("and") == ["and"]
    assert bpe.encode_word("ing") == ["ing"]
    assert bpe.encode_word("ers") == ["ers"]


def test_spark_encode_matches_python_reference(spark):
    texts = [
        "the quick thinking fox jumps over errors",
        "understand tokens and their order",
        "a",
        "",
        "  double  spaces  survive",
        "qqq xyzzy 123",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = bpe.bpe_encode(df).orderBy("doc_id", "tok_pos").collect()
    got: dict[int, list] = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.tok_pos, r.token, r.token_id))
    for i, t in enumerate(texts):
        want_toks = [tok for w in t.split(" ") for tok in bpe.encode_word(w)]
        rows = got.get(i, [])
        assert [tok for _, tok, _ in rows] == want_toks, t
        assert [p for p, _, _ in rows] == list(range(len(want_toks)))
        for _, tok, tid in rows:
            assert tid == bpe.VOCAB.get(tok, -1)


def test_unknown_chars_are_unk_ids(spark):
    df = spark.createDataFrame([(0, "x9y")], "doc_id long, text string")
    out = bpe.bpe_encode(df).orderBy("tok_pos").collect()
    assert [(r.token, r.token_id) for r in out] == [
        ("x", 23),
        ("9", -1),
        ("y", 24),
    ]


def test_token_count_expr_matches_encode(spark):
    texts = ["the errors of the understanding", "", "a b the"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = (
        df.select("doc_id", bpe.bpe_token_count_expr("text").alias("n"))
        .orderBy("doc_id")
        .collect()
    )
    for r, t in zip(out, texts):
        assert r.n == sum(len(bpe.encode_word(w)) for w in t.split(" "))


def test_pack_sequences_on_bpe_axis(spark):
    from ocr_spark.operators import textops

    texts = ["the " * 40, "understand " * 30, "a " * 5]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    out = (
        textops.pack_sequences(
            df, budget=64, shards=1, token_count=bpe.bpe_token_count_expr("text")
        )
        .orderBy("doc_id")
        .collect()
    )
    # doc 0: 40 'the' = 40 tokens; doc 1: 'understand'×30 = 6 tok × 30
    assert out[0].n_tokens == 40 and out[0].start_off == 0
    assert out[1].n_tokens == 180 and out[1].start_off == 40
    assert out[1].seq_idx == 0 and out[1].pos_in_seq == 40
    assert out[2].start_off == 220 and out[2].seq_idx == 3
    assert out[2].pos_in_seq == 220 % 64


def test_bpe_encode_zero_exchanges_no_python(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = docs.sparkSession._sc._jvm.PythonSQLUtils.explainString(
        bpe.bpe_encode(docs)._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_encode_is_lossless_reconstruction():
    # tokens are a PARTITION of the word: concatenating them restores it
    # exactly, for any input over any alphabet (merges only ever glue
    # adjacent pieces, never rewrite content)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=0, max_size=24))
    def check(word):
        word = word.replace(" ", "")  # words are whitespace-pretokenized
        assert "".join(bpe.encode_word(word)) == word

    check()


def _classic_bpe(word):
    """Textbook lowest-rank-first BPE loop (the semantics the replace
    chain must reproduce)."""
    toks = list(word)
    ranks = {m: i for i, m in enumerate(bpe.MERGES)}
    while True:
        best, bi = None, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            return toks
        toks[bi : bi + 2] = [toks[bi] + toks[bi + 1]]


def test_encode_matches_classic_lowest_rank_first_bpe():
    # review finding (round 5): a single replace pass per rank dropped
    # the second of two chained same-rank occurrences ('inin', 'cocoa');
    # two passes per rank are exhaustive. Exhaustive over a merge-dense
    # alphabet up to length 6, plus the original repros.
    import itertools

    assert bpe.encode_word("inin") == ["in", "in"]
    assert bpe.encode_word("cocoa") == ["co", "co", "a"]
    for n in range(7):
        for tup in itertools.product("inacod", repeat=n):
            w = "".join(tup)
            assert bpe.encode_word(w) == _classic_bpe(w), w


def test_chained_same_rank_merges_on_spark(spark):
    df = spark.createDataFrame(
        [(0, "inin cocoa ananas")], "doc_id long, text string"
    )
    out = bpe.bpe_encode(df).orderBy("tok_pos").collect()
    toks = [r.token for r in out]
    want = [t for w in "inin cocoa ananas".split() for t in _classic_bpe(w)]
    assert toks == want


def test_pack_sequences_skips_null_text(spark):
    # review finding (round 5): size(split(NULL)) = -1 would emit a
    # bogus row AND shift later offsets; NULL-text docs now pack nothing
    from pyspark.sql import types as T

    from ocr_spark.operators import textops

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(0, "the the"), (1, None), (2, "a b c")], schema
    )
    for counter in (None, bpe.bpe_token_count_expr("text")):
        out = (
            textops.pack_sequences(df, shards=1, token_count=counter)
            .orderBy("doc_id")
            .collect()
        )
        assert [r.doc_id for r in out] == [0, 2]
        assert out[1].start_off == out[0].n_tokens  # no -1 shift


def test_token_compression_exact_values(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (0, "the the"),   # 2 words, each 1 token ("the" is a merge)
            (1, "xyz"),       # no merges apply: 3 single-char tokens
            (2, ""),          # empty: 0 tokens/bytes, divisor clamps to 1
            (3, None),        # filtered out
            (4, "数"),        # 3 UTF-8 bytes, 1 UNK token, 1 word
        ],
        schema,
    )
    out = {r.doc_id: r for r in bpe.token_compression(df).collect()}
    assert sorted(out) == [0, 1, 2, 4]
    assert out[0].n_bytes == 7 and out[0].n_tokens == 2
    assert out[0].bytes_per_token_micro == 7 * 1000000 // 2
    assert out[0].tokens_per_word_micro == 1000000    # 2 tokens / 2 words
    assert out[1].n_tokens == 3 and out[1].tokens_per_word_micro == 3000000
    assert out[2].n_tokens == 0 and out[2].bytes_per_token_micro == 0
    assert out[4].n_bytes == 3 and out[4].n_tokens == 1
    assert out[4].bytes_per_token_micro == 3000000


def _train_reference(texts, iters):
    # pure-python replay of the training contract
    from collections import Counter

    docs = [
        " " + " ".join("|".join(t.split(" "))) + " "
        for t in texts
        if t is not None
    ]
    learned = []
    for rank in range(iters):
        cnt = Counter()
        for s in docs:
            w = s.strip().split(" ")
            for i in range(len(w) - 1):
                if w[i] != "|" and w[i + 1] != "|" and w[i] != w[i + 1]:
                    cnt[(w[i], w[i + 1])] += 1
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), c = best
        learned.append((rank, a, b, c))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        docs = [s.replace(pat, rep).replace(pat, rep) for s in docs]
    return learned


def test_bpe_train_matches_python_replay(spark):
    import pandas as pd

    texts = [
        "the theme thesis",
        "then there the",
        "other ethers seethe",
        None,
        "zz qq",  # self-pairs excluded: zz/qq never become merges
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe.bpe_train(df, iters=4).orderBy("rank").collect()
    ]
    want = _train_reference(texts, 4)
    assert got == want
    # 'h e' dominates this corpus (every 'he' bigram): rank-0 merge
    assert got[0][1:3] == ("h", "e")
    assert all(l != r for _, l, r, _ in got)
