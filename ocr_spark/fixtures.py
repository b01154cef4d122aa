"""Deterministic synthetic transcripts — the engine's test/bench corpus.

Schema = the driver contract's input hint:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)``. Everything is seeded (default 42) and generated from
per-(conv,turn) substream seeds, so any subset of the table is identical
regardless of generation order, partitioning, or process. No wall-clock:
``ts = 2026-01-01T00:00:00Z + 60s * global_turn_counter`` (FIXTURES.md §1).

Payload mix per turn (by tool):
- ``html`` — main-content paragraphs embedded in nav/header/footer/link-farm
  boilerplate; ground truth is the paragraph text.
- ``grid`` — GRIDv1 ink-mask grid images (header row + data rows, optional
  rotation) rendered from a fixed vocabulary.
- ``json`` — model-reply strings exercising the salvage parser: clean JSON,
  prose-wrapped, code-fenced, truncated (→ sentinel), brace-free (→
  sentinel), null-token soup, heterogeneous keys, empty table_data.
- ``null``/plain — pass-through text.
"""

from __future__ import annotations

import datetime as _dt
import json

import numpy as np
import pandas as pd

from ocr_spark.kernels.grid import CHARSET, encode_grid_payload, render_grid

VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu data table row column value spark arrow batch"
).split()

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("html", "grid", "json", "null")
_EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)

_GRID_SAFE = [w for w in VOCAB if all(c in CHARSET for c in w)]


def _words(rng: np.random.Generator, n: int) -> list[str]:
    return [VOCAB[i] for i in rng.integers(0, len(VOCAB), n)]


def html_payload(rng: np.random.Generator) -> tuple[str, str]:
    """Returns (html document, ground-truth main text)."""
    n_paras = int(rng.integers(1, 4))
    paras = [" ".join(_words(rng, int(rng.integers(8, 25)))) for _ in range(n_paras)]
    nav_links = "".join(
        f'<a href="/{w}">{w}</a>' for w in _words(rng, int(rng.integers(3, 7)))
    )
    farm = "".join(
        f'<li><a href="#">{" ".join(_words(rng, 2))}</a></li>'
        for _ in range(int(rng.integers(2, 6)))
    )
    body = "".join(f"<p>{p}</p>" for p in paras)
    doc = (
        "<html><head><title>t</title><style>p{color:red}</style></head><body>"
        f"<nav>{nav_links}</nav><header><h1>x</h1></header>"
        f'<div class="main">{body}</div>'
        f"<aside><ul>{farm}</ul></aside>"
        f"<footer>{nav_links}<span>(c) 2026</span></footer>"
        "</body></html>"
    )
    return doc, "\n".join(paras)


def grid_payload(rng: np.random.Generator) -> str:
    nrows = int(rng.integers(2, 6))
    ncols = int(rng.integers(2, 5))
    header = list(
        dict.fromkeys(_GRID_SAFE[i] for i in rng.integers(0, len(_GRID_SAFE), ncols))
    )
    cells = [header] + [
        [_GRID_SAFE[i] for i in rng.integers(0, len(_GRID_SAFE), len(header))]
        for _ in range(nrows - 1)
    ]
    rot = int(rng.choice([0, 0, 90, 180, 270]))
    return encode_grid_payload(render_grid(cells), rot=rot)


def json_payload(rng: np.random.Generator) -> str:
    kind = int(rng.integers(0, 8))
    cols = [f"col_{i}" for i in range(int(rng.integers(2, 5)))]
    rows = []
    for _ in range(int(rng.integers(1, 6))):
        rec = {}
        for c in cols:
            roll = int(rng.integers(0, 10))
            if roll < 6:
                rec[c] = " ".join(_words(rng, int(rng.integers(1, 3))))
            elif roll < 8:
                rec[c] = ["", "nan", "NaN", "null", "NULL"][int(rng.integers(0, 5))]
            elif roll == 8:
                rec[c] = int(rng.integers(0, 1000))
            # roll == 9: key omitted → heterogeneous records
        rows.append(rec)
    payload = json.dumps(
        {
            "table_data": rows,
            "summary": {
                "total_rows": len(rows),
                "total_columns": len(cols),
                "confidence": "high",
            },
        }
    )
    if kind == 0:
        return payload
    if kind == 1:
        return f"Here is the extracted table:\n{payload}\nDone."
    if kind == 2:
        return f"```json\n{payload}\n```"
    if kind == 3:
        return payload[: max(2, len(payload) // 2)]  # truncated → sentinel
    if kind == 4:
        return "no table found in this image"  # no braces → sentinel
    if kind == 5:
        return json.dumps({"table_data": [], "summary": {}})
    if kind == 6:
        return json.dumps({"message": "ok"})  # missing table_data
    return f"prefix {{not json}} {payload} suffix"


def turn_payload(seed: int, conv_i: int, turn_i: int) -> tuple[str, str]:
    """Deterministic (tool, text) for one turn, independent of call order."""
    rng = np.random.default_rng([seed, conv_i, turn_i])
    tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))]
    if tool == "html":
        text, _ = html_payload(rng)
    elif tool == "grid":
        text = grid_payload(rng)
    elif tool == "json":
        text = json_payload(rng)
    else:
        text = " ".join(_words(rng, int(rng.integers(3, 30))))
    return tool, text


def make_transcripts(
    n_convs: int = 200,
    turns_low: int = 5,
    turns_high: int = 40,
    seed: int = 42,
    skew_conv_turns: int = 0,
) -> pd.DataFrame:
    """Synthesize the transcripts table.

    ``skew_conv_turns`` > 0 appends one extra conversation holding that many
    turns — the long-conversation skew fixture (FIXTURES.md §1).
    """
    rng = np.random.default_rng([seed, 0])
    counts = rng.integers(turns_low, turns_high + 1, n_convs).tolist()
    if skew_conv_turns > 0:
        counts.append(skew_conv_turns)
    rows = []
    global_turn = 0
    for conv_i, n_turns in enumerate(counts):
        conv_id = f"conv_{conv_i:06d}"
        for turn_i in range(int(n_turns)):
            tool, text = turn_payload(seed, conv_i, turn_i)
            rows.append(
                (
                    conv_id,
                    np.int32(turn_i),
                    _ROLES[global_turn % 3],
                    text,
                    tool,
                    _EPOCH + _dt.timedelta(seconds=60 * global_turn),
                )
            )
            global_turn += 1
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # Spark's parquet reader rejects TIMESTAMP(NANOS); keep micros.
    df["ts"] = df["ts"].astype("datetime64[us, UTC]")
    return df


def write_transcripts_parquet(path: str, **kwargs) -> pd.DataFrame:
    """Materialize a fixture corpus to parquet (Spark-readable)."""
    df = make_transcripts(**kwargs)
    df.to_parquet(path, index=False)
    return df
