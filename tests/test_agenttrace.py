"""Agent-trace operator semantics (ocr_spark.operators.agenttrace)."""

from __future__ import annotations

import hashlib

from ocr_spark.operators import agenttrace


def _trace(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts_s long",
    )


def test_tool_stats_gap_is_to_next_turn_of_any_kind(spark):
    rows = [
        # the gap after the t0 search call runs to the PLAIN turn at
        # t1 (tool execution + response), not to the next tool call
        ("c1", 0, "assistant", "x", "search", 100),
        ("c1", 1, "assistant", "x", None, 130),
        ("c1", 2, "assistant", "x", "search", 190),
        # conversation-final call: counts a call but no gap
        ("c2", 0, "assistant", "x", "exec", 500),
    ]
    out = {r.tool: r for r in agenttrace.tool_stats(_trace(spark, rows)).collect()}
    assert out["search"].n_calls == 2
    assert out["search"].n_convs == 1
    # gaps: 100->130 (30) and 190->end of conv (none)
    assert out["search"].sum_gap_s == 30
    assert out["search"].n_gaps == 1
    assert out["exec"].n_calls == 1
    assert out["exec"].sum_gap_s is None
    assert out["exec"].n_gaps == 0


def test_tool_bigrams_skip_plain_turns(spark):
    rows = [
        ("c1", 0, "assistant", "x", "search", 0),
        ("c1", 1, "user", "x", None, 10),
        ("c1", 2, "assistant", "x", "exec", 20),
        ("c1", 3, "assistant", "x", "exec", 30),
        # a second conversation: its first call has no predecessor
        ("c2", 0, "assistant", "x", "exec", 0),
        ("c2", 1, "assistant", "x", "search", 5),
    ]
    out = {
        (r.prev_tool, r.tool): r.n_transitions
        for r in agenttrace.tool_bigrams(_trace(spark, rows)).collect()
    }
    # the user turn between search and exec does NOT break the chain
    assert out == {
        ("search", "exec"): 1,
        ("exec", "exec"): 1,
        ("exec", "search"): 1,
    }


def test_turn_latency_profile(spark):
    rows = [
        ("c1", 0, "user", "x", None, 1000),
        ("c1", 1, "assistant", "x", None, 1050),
        ("c1", 2, "user", "x", None, 1350),  # 300 s stall
        ("c1", 3, "assistant", "x", None, 1400),
        ("c2", 0, "user", "x", None, 9),  # single-turn conversation
    ]
    out = {
        r.conv_id: r
        for r in agenttrace.turn_latency(_trace(spark, rows)).collect()
    }
    c1 = out["c1"]
    assert (c1.n_turns, c1.duration_s, c1.max_gap_s, c1.n_stalled) == (
        4,
        400,
        300,
        1,
    )
    c2 = out["c2"]
    assert (c2.n_turns, c2.duration_s, c2.max_gap_s, c2.n_stalled) == (
        1,
        0,
        None,
        0,
    )


def test_tool_loops_islands(spark):
    rows = [
        # run of 3 'search' — the plain turn at t1 doesn't break it
        ("c1", 0, "assistant", "x", "search", 0),
        ("c1", 1, "assistant", "x", None, 1),
        ("c1", 2, "assistant", "x", "search", 2),
        ("c1", 3, "assistant", "x", "search", 3),
        ("c1", 4, "assistant", "x", "exec", 4),
        # 'search' again AFTER exec: a NEW island, length 1 → dropped
        ("c1", 5, "assistant", "x", "search", 5),
    ]
    out = agenttrace.tool_loops(_trace(spark, rows), min_run=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.conv_id, r.tool, r.start_turn, r.end_turn, r.run_len) == (
        "c1",
        "search",
        0,
        3,
        3,
    )


def test_code_blocks_multi_fence_order_and_hash(spark):
    text = "intro ```python\nx = 1\ny = 2\n``` mid ```sql\nselect 1\n``` out"
    rows = [
        ("c1", 0, "assistant", text, None, 0),
        ("c1", 1, "assistant", "no fence here", None, 1),
        ("c1", 2, "assistant", None, None, 2),  # NULL text → no rows
    ]
    out = sorted(
        agenttrace.code_blocks(_trace(spark, rows)).collect(),
        key=lambda r: r.block_idx,
    )
    assert [(r.block_idx, r.lang, r.n_chars, r.n_lines) for r in out] == [
        (0, "python", 11, 2),
        (1, "sql", 8, 1),
    ]
    assert out[0].code_md5 == hashlib.md5(b"x = 1\ny = 2").hexdigest()
    assert out[1].code_md5 == hashlib.md5(b"select 1").hexdigest()


def test_episodes_split_on_silence(spark):
    rows = [
        # conv c1: turns at t=0,60,120 then a 2h jump, then 2 more
        ("c1", 0, 1000), ("c1", 1, 1060), ("c1", 2, 1120),
        ("c1", 3, 8320), ("c1", 4, 8380),
        # boundary case: gap EXACTLY the threshold does NOT split
        ("c2", 0, 5000), ("c2", 1, 5600),
        # single-turn conversation: one episode, zero duration
        ("c3", 0, 42),
    ]
    turns = spark.createDataFrame(rows, ["conv_id", "turn_idx", "ts_s"])
    out = {
        (r.conv_id, r.episode_idx): (
            r.start_turn, r.end_turn, r.n_turns, r.duration_s
        )
        for r in agenttrace.episodes(turns, gap_s=600).collect()
    }
    assert out == {
        ("c1", 0): (0, 2, 3, 120),
        ("c1", 1): (3, 4, 2, 60),
        ("c2", 0): (0, 1, 2, 600),  # 600 s gap = threshold: same episode
        ("c3", 0): (0, 0, 1, 0),
    }
