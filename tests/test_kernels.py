"""Unit tests for the pure extraction kernels (no Spark)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from ocr_spark.kernels import (
    EMPTY_SENTINEL,
    align_pages,
    clean_null_tokens,
    encode_grid_payload,
    extract_grid_table,
    page_table_from_records,
    render_grid,
    salvage_json,
    serialize_table,
    strip_html,
)
from ocr_spark.kernels.extract import extract_turn
from ocr_spark.kernels.grid import CHARSET, read_grid_cells, rot90_payload


class TestSalvage:
    # reference: scripts/ExtractX_OCR.py:384-404
    def test_clean_json(self):
        assert salvage_json('{"table_data": [{"a": "1"}]}') == {
            "table_data": [{"a": "1"}]
        }

    def test_prose_wrapped(self):
        assert salvage_json('Sure! {"a": 1} hope that helps') == {"a": 1}

    def test_code_fenced(self):
        assert salvage_json('```json\n{"a": 1}\n```') == {"a": 1}

    def test_first_brace_to_last_brace(self):
        # the slice is outermost-greedy: first { to LAST }
        assert salvage_json('{"a": {"b": 2}} trailing }') == EMPTY_SENTINEL

    def test_no_braces(self):
        assert salvage_json("no table found") == EMPTY_SENTINEL

    def test_truncated(self):
        assert salvage_json('{"table_data": [{"a": ') == EMPTY_SENTINEL

    def test_empty_and_none(self):
        assert salvage_json("") == EMPTY_SENTINEL
        assert salvage_json(None) == EMPTY_SENTINEL

    def test_non_dict_top_level(self):
        assert salvage_json("{}") == {}


class TestCleanAlign:
    def test_null_tokens(self):
        # reference: scripts/ExtractX_OCR.py:446
        for tok in ("", "nan", "NaN", "null", "NULL"):
            assert clean_null_tokens(tok) is None
        assert clean_null_tokens("Nan") == "Nan"  # not in the token list
        assert clean_null_tokens(0) == 0

    def test_first_seen_column_order(self):
        cols, rows = page_table_from_records([{"b": "1"}, {"a": "2", "b": "3"}])
        assert cols == ["b", "a"]
        assert rows == [["1", None], ["3", "2"]]

    def test_missing_key_is_na_not_fill(self):
        cols, rows = page_table_from_records([{"a": "x", "b": "y"}, {"a": "z"}])
        assert rows[1] == ["z", None]

    def test_align_fill_is_empty_string(self):
        # reference: '' fill happens AFTER cleaning → asymmetry observable
        p1 = page_table_from_records([{"a": "1", "b": ""}])
        p2 = page_table_from_records([{"b": "x", "c": "y"}])
        cols, rows = align_pages([p1, p2])
        assert cols == ["a", "b", "c"]
        assert rows == [["1", None, ""], ["", "x", "y"]]

    def test_single_page_fast_path(self):
        p1 = page_table_from_records([{"a": "1"}])
        assert align_pages([p1]) == p1
        assert align_pages([p1, ([], [])]) == p1  # empty pages dropped

    def test_all_empty(self):
        assert align_pages([([], []), ([], [])]) == ([], [])

    def test_serialize_distinguishes_na_from_fill(self):
        s = serialize_table((["a"], [[None], [""]]))
        assert json.loads(s) == {"columns": ["a"], "rows": [[None], [""]]}

    def test_non_string_scalars_preserved(self):
        cols, rows = page_table_from_records([{"a": 7, "b": 1.5}])
        assert rows == [[7, 1.5]]


class TestHtmlStrip:
    def test_keeps_main_drops_boilerplate(self):
        doc = (
            "<html><body><nav><a href='/'>home</a><a href='/x'>about</a></nav>"
            "<p>This is the main article content of the page.</p>"
            "<footer><a href='#'>terms</a> <a href='#'>privacy</a></footer>"
            "</body></html>"
        )
        assert strip_html(doc) == "This is the main article content of the page."

    def test_multiple_paragraphs_joined_by_newline(self):
        doc = "<div><p>first paragraph with enough text</p><p>second paragraph with enough text</p></div>"
        assert (
            strip_html(doc)
            == "first paragraph with enough text\nsecond paragraph with enough text"
        )

    def test_entities_unescaped(self):
        doc = "<p>fish &amp; chips &lt;for&gt; two people tonight</p>"
        assert strip_html(doc) == "fish & chips <for> two people tonight"

    def test_script_style_dropped(self):
        doc = "<style>p {c: 1}</style><script>var x = 'hello world text';</script><p>real content that is long enough</p>"
        assert strip_html(doc) == "real content that is long enough"

    def test_link_farm_dropped(self):
        doc = "<ul><li><a href='#'>one two</a></li><li><a href='#'>three four</a></li></ul>"
        assert strip_html(doc) == ""

    def test_plain_text_passthrough(self):
        assert strip_html("just  some   text") == "just some text"
        assert strip_html("") == ""
        assert strip_html(None) == ""

    def test_whitespace_normalized(self):
        doc = "<p>spread\n  across \t lines of this paragraph</p>"
        assert strip_html(doc) == "spread across lines of this paragraph"


class TestGrid:
    CELLS = [
        ["name", "qty", "note"],
        ["alpha", "12", "ok"],
        ["bravo", "7", "x y"],
    ]

    def test_render_read_roundtrip(self):
        img = render_grid(self.CELLS)
        assert read_grid_cells(img) == self.CELLS

    @pytest.mark.parametrize("rot", [0, 90, 180, 270])
    def test_payload_roundtrip_rotations(self, rot):
        payload = encode_grid_payload(render_grid(self.CELLS), rot=rot)
        res = extract_grid_table(payload)
        assert res["table_data"] == [
            {"name": "alpha", "qty": "12", "note": "ok"},
            {"name": "bravo", "qty": "7", "note": "x y"},
        ]

    def test_rot90_clockwise_semantics(self):
        # reference applies PIL rotate(-r) = clockwise for user r
        img = np.array([[1, 0], [0, 0]], dtype=np.uint8)
        cw = rot90_payload(img, 90)
        assert cw[0, 1] == 1  # top-left → top-right under clockwise 90
        assert rot90_payload(img, 0) is img  # no-op short-circuit

    def test_empty_cell(self):
        cells = [["a", "b"], ["", "zz"]]
        img = render_grid(cells)
        assert read_grid_cells(img) == cells

    def test_header_only_is_sentinel(self):
        payload = encode_grid_payload(render_grid([["a", "b"]]))
        assert extract_grid_table(payload) == EMPTY_SENTINEL

    def test_garbage_payload_is_sentinel(self):
        assert extract_grid_table("GRIDv1|{bad") == EMPTY_SENTINEL
        assert extract_grid_table("not a grid at all") == EMPTY_SENTINEL

    def test_charset_roundtrip(self):
        text = CHARSET.replace(" ", "")  # no trailing-space ambiguity
        img = render_grid([["h"], [text]])
        assert read_grid_cells(img) == [["h"], [text]]


class TestExtractTurn:
    def test_html(self):
        r = extract_turn("<p>long enough main content here</p>", "html")
        assert r["extracted_text"] == "long enough main content here"
        assert r["status"] == "ok"

    def test_json_tool(self):
        r = extract_turn('x {"table_data": [{"a": "1", "b": "nan"}]} y', "json")
        assert json.loads(r["extracted_text"]) == {
            "columns": ["a", "b"],
            "rows": [["1", None]],
        }
        assert (r["n_rows"], r["n_cols"]) == (1, 2)

    def test_passthrough(self):
        r = extract_turn("hello", None)
        assert r["extracted_text"] == "hello"

    def test_empty_sentinel_path(self):
        r = extract_turn("no json here", "json")
        assert json.loads(r["extracted_text"]) == {"columns": [], "rows": []}
        assert r["status"] == "empty"

    def test_never_raises(self):
        r = extract_turn(None, "grid")
        assert r["status"] in ("empty", "error")


class TestBorderless:
    """Whitespace layout analysis: tables with NO ruling lines (the
    reference's vision model reads those too, ExtractX_OCR.py:325-330)."""

    CELLS = [
        ["name", "qty", "note"],
        ["alpha", "12", "ok"],
        ["bravo", "7", "x y"],
    ]

    def test_render_read_roundtrip(self):
        from ocr_spark.kernels.grid import read_borderless_cells, render_borderless

        img = render_borderless(self.CELLS)
        assert read_borderless_cells(img) == self.CELLS

    def test_no_rule_lines_in_render(self):
        # the ruled detector must find NOTHING (that's what triggers the
        # fallback): no full-span line in either axis
        from ocr_spark.kernels.grid import detect_grid, render_borderless

        h_rows, v_cols = detect_grid(render_borderless(self.CELLS))
        assert h_rows == [] and v_cols == []

    @pytest.mark.parametrize("rot", [0, 90, 180, 270])
    def test_dispatch_falls_back_and_rotates(self, rot):
        from ocr_spark.kernels.grid import render_borderless

        payload = encode_grid_payload(render_borderless(self.CELLS), rot=rot)
        res = extract_grid_table(payload)
        assert res["table_data"] == [
            {"name": "alpha", "qty": "12", "note": "ok"},
            {"name": "bravo", "qty": "7", "note": "x y"},
        ]

    def test_anchor_only_glyph_rows(self):
        # a text line of all-'a' glyphs (charset index 0) inks ONLY the
        # anchor row — its projection band is 1 px tall; the cell slice
        # must still extend a full glyph box upward
        from ocr_spark.kernels.grid import read_borderless_cells, render_borderless

        cells = [["a", "aa"], ["aaa", "a"]]
        assert read_borderless_cells(render_borderless(cells)) == cells

    def test_empty_and_ragged_cells(self):
        from ocr_spark.kernels.grid import read_borderless_cells, render_borderless

        cells = [["col one", "c2", "z"], ["x", "", ":/%"], ["", "yy"]]
        img = render_borderless(cells)
        # ragged short row reads back padded with empty cells
        want = [["col one", "c2", "z"], ["x", "", ":/%"], ["", "yy", ""]]
        assert read_borderless_cells(img) == want

    def test_intra_cell_space_never_splits_column(self):
        # ' ' is a charset glyph with an inked anchor row, so a spaced
        # cell ("x y") stays one column
        from ocr_spark.kernels.grid import detect_borderless_layout, render_borderless

        img = render_borderless([["a b c d", "e"], ["x y", "z"]])
        _rows, cols = detect_borderless_layout(img)
        assert len(cols) == 2

    def test_blank_image_is_sentinel(self):
        from ocr_spark.kernels.grid import read_borderless_cells

        assert read_borderless_cells(np.zeros((20, 40), dtype=np.uint8)) == []
        payload = encode_grid_payload(np.zeros((20, 40), dtype=np.uint8))
        assert extract_grid_table(payload) == EMPTY_SENTINEL

    def test_ruled_still_wins_dispatch(self):
        # a ruled render keeps going through the line detector (same
        # cells, rule-line geometry) — fallback only fires on no-grid
        from ocr_spark.kernels.grid import read_any_cells, render_borderless

        assert read_any_cells(render_grid(self.CELLS)) == self.CELLS
        assert read_any_cells(render_borderless(self.CELLS)) == self.CELLS


class TestMultiTablePage:
    """Stacked tables on one page combine into one record stream
    (reference: 'if there are multiple tables, combine them logically')."""

    def _page(self):
        from ocr_spark.kernels.grid import render_borderless, render_page

        ruled = render_grid([["a", "b"], ["x1", "y1"]])
        borderless = render_borderless(
            [["c", "d"], ["x2", "y2"], ["x3", "y3"]]
        )
        return render_page([ruled, borderless])

    @pytest.mark.parametrize("rot", [0, 90, 180, 270])
    def test_mixed_layouts_combine_in_page_order(self, rot):
        payload = encode_grid_payload(self._page(), rot=rot)
        res = extract_grid_table(payload)
        assert res["table_data"] == [
            {"a": "x1", "b": "y1"},
            {"c": "x2", "d": "y2"},
            {"c": "x3", "d": "y3"},
        ]
        assert res["summary"] == {
            "total_rows": 3,
            "total_columns": 4,
            "confidence": "high",
        }

    def test_shared_headers_count_distinct_columns(self):
        from ocr_spark.kernels.grid import render_page

        ts = [
            render_grid([["k", "v"], [f"r{i}", f"s{i}"]]) for i in range(3)
        ]
        res = extract_grid_table(encode_grid_payload(render_page(ts)))
        assert res["table_data"] == [
            {"k": f"r{i}", "v": f"s{i}"} for i in range(3)
        ]
        assert res["summary"]["total_columns"] == 2

    def test_header_only_band_skipped(self):
        from ocr_spark.kernels.grid import render_borderless, render_page

        page = render_page(
            [
                render_borderless([["solo"]]),
                render_grid([["a", "b"], ["x", "y"]]),
            ]
        )
        res = extract_grid_table(encode_grid_payload(page))
        assert res["table_data"] == [{"a": "x", "b": "y"}]

    def test_all_bands_header_only_is_sentinel(self):
        from ocr_spark.kernels.grid import render_borderless, render_page

        page = render_page(
            [render_borderless([["only"]]), render_borderless([["head"]])]
        )
        assert extract_grid_table(encode_grid_payload(page)) == EMPTY_SENTINEL

    def test_band_starting_mid_glyph_box_decodes(self):
        # a band whose first line inks only its lower glyph rows (e.g.
        # 'c d') starts mid-glyph-box after the page split — the decoder
        # must pad the provably-blank rows back, not emit '?'
        from ocr_spark.kernels.grid import render_borderless, render_page

        page = render_page(
            [
                render_grid([["a", "b"], ["x", "y"]]),
                render_borderless([["c", "d"], ["u", "v"]]),
            ]
        )
        res = extract_grid_table(encode_grid_payload(page))
        assert res["table_data"] == [
            {"a": "x", "b": "y"},
            {"c": "u", "d": "v"},
        ]


class TestMergedCells:
    """Merged-cell repeat (reference: 'handle merged cells by repeating
    values appropriately')."""

    def test_merged_data_cell_repeats_value(self):
        cells = [["a", "b", "c"], ["v", "", "w"]]
        img = render_grid(cells, merges={(1, 0): 2})
        assert read_grid_cells(img) == [["a", "b", "c"], ["v", "v", "w"]]

    def test_three_wide_merge(self):
        img = render_grid(
            [["h1", "h2", "h3"], ["all", "", ""]], merges={(1, 0): 3}
        )
        assert read_grid_cells(img) == [
            ["h1", "h2", "h3"],
            ["all", "all", "all"],
        ]

    def test_merge_in_one_row_leaves_others_intact(self):
        cells = [["a", "b", "c"], ["m", "", "z"], ["x", "y", "q"]]
        img = render_grid(cells, merges={(1, 0): 2})
        assert read_grid_cells(img) == [
            ["a", "b", "c"],
            ["m", "m", "z"],
            ["x", "y", "q"],
        ]

    @pytest.mark.parametrize("rot", [0, 90, 180, 270])
    def test_full_extract_path_with_rotation(self, rot):
        cells = [["a", "b", "c"], ["v", "", "w"]]
        payload = encode_grid_payload(
            render_grid(cells, merges={(1, 0): 2}), rot=rot
        )
        res = extract_grid_table(payload)
        assert res["table_data"] == [{"a": "v", "b": "v", "c": "w"}]

    def test_plain_grid_unchanged(self):
        cells = [["a", "b"], ["x", "y"], ["", "q"]]
        assert read_grid_cells(render_grid(cells)) == cells

    def test_width_skewed_tables_both_extract(self):
        # round-5 review repro: a ruled table narrower than half the
        # padded page width must still pass rule detection (the band is
        # cropped to its ink bbox before the fraction test)
        from ocr_spark.kernels.grid import render_borderless, render_page

        page = render_page(
            [
                render_grid([["a", "b", "c"], ["a", "a", "a"]]),
                render_borderless(
                    [["d", "e", "f"], ["customer", "customer", "stream"]]
                ),
            ]
        )
        res = extract_grid_table(encode_grid_payload(page))
        assert res["table_data"] == [
            {"a": "a", "b": "a", "c": "a"},
            {"d": "customer", "e": "customer", "f": "stream"},
        ]


class TestAutoOrient:
    """Orientation detection (the Tesseract-OSD preprocessing step):
    undeclared quarter turns recovered by glyph-validity scoring."""

    CELLS = [
        ["name", "qty", "note"],
        ["alpha", "12", "ok"],
        ["bravo", "7", "x y"],
    ]

    @pytest.mark.parametrize("rot", [0, 90, 180, 270])
    @pytest.mark.parametrize("render", ["ruled", "borderless"])
    def test_detects_all_quarter_turns(self, rot, render):
        import numpy as np

        from ocr_spark.kernels.grid import (
            detect_orientation,
            render_borderless,
            render_grid,
        )

        img = (render_grid if render == "ruled" else render_borderless)(
            self.CELLS
        )
        stored = np.rot90(img, k=rot // 90) if rot else img
        assert detect_orientation(stored) == rot

    @pytest.mark.parametrize("rot", [0, 90, 180, 270])
    def test_auto_orient_roundtrip(self, rot):
        import numpy as np

        from ocr_spark.kernels.grid import render_grid

        img = render_grid(self.CELLS)
        stored = np.rot90(img, k=rot // 90) if rot else img
        res = extract_grid_table(
            encode_grid_payload(stored, rot=0), auto_orient=True
        )
        assert res["table_data"] == [
            {"name": "alpha", "qty": "12", "note": "ok"},
            {"name": "bravo", "qty": "7", "note": "x y"},
        ]

    def test_blank_page_keeps_rot0_and_degrades(self):
        import numpy as np

        from ocr_spark.kernels.grid import detect_orientation

        blank = np.zeros((40, 40), dtype=np.uint8)
        assert detect_orientation(blank) == 0
        res = extract_grid_table(
            encode_grid_payload(blank, rot=0), auto_orient=True
        )
        assert res["table_data"] == []

    def test_declared_rot_composes_with_auto_orient(self):
        # a payload that declares 90 AND bakes a further undeclared 180
        # restores upright: declared first, detected residual second
        import numpy as np

        from ocr_spark.kernels.grid import render_grid, rot90_payload

        img = render_grid(self.CELLS)
        baked = np.rot90(img, k=2)  # undeclared 180
        payload = encode_grid_payload(baked, rot=90)  # declares 90 more
        res = extract_grid_table(payload, auto_orient=True)
        assert res["table_data"][0]["name"] == "alpha"


def test_reading_order_column_major_not_row_major():
    from ocr_spark.kernels.grid import (
        read_columns_text,
        render_columns,
        read_borderless_cells,
    )

    cols = [["one two", "three four", "five six"], ["seven", "eight"]]
    img = render_columns(cols)
    # column-major linearization, ragged bottoms intact
    assert read_columns_text(img) == [
        "one two", "three four", "five six", "seven", "eight",
    ]
    # the table-style parse of the same pixels is row-major — the
    # failure mode the XY-cut exists to avoid
    flat = [c for row in read_borderless_cells(img) for c in row]
    assert flat[:2] == ["one two", "seven"]


def test_reading_order_survives_declared_rotation():
    from ocr_spark.kernels.grid import (
        decode_grid_payload,
        encode_grid_payload,
        read_columns_text,
        render_columns,
        rot90_payload,
    )

    img = render_columns([["alpha beta", "gamma"], ["delta"]])
    for rot in (0, 90, 180, 270):
        payload = encode_grid_payload(img, rot=rot)
        got, r = decode_grid_payload(payload)
        assert read_columns_text(rot90_payload(got, r)) == [
            "alpha beta", "gamma", "delta",
        ]


def test_reading_order_empty_and_single_column():
    import numpy as np
    from ocr_spark.kernels.grid import read_columns_text, render_columns

    assert read_columns_text(np.zeros((8, 8), dtype=np.uint8)) == []
    img = render_columns([["only col line a", "line b"]])
    assert read_columns_text(img) == ["only col line a", "line b"]


def test_stitch_tables_continuation_rules():
    from ocr_spark.kernels.grid import stitch_tables

    t1 = [{"a": "1", "b": "2"}]
    t2 = [{"a": "3", "b": "4"}]
    t3 = [{"x": "5"}]
    # same keys on consecutive pages merge into one logical table;
    # a new key set starts a new table
    recs, n = stitch_tables([t1, t2, t3])
    assert recs == t1 + t2 + t3 and n == 2
    # a blank page breaks any open continuation
    recs, n = stitch_tables([t1, [], t2])
    assert recs == t1 + t2 and n == 2
    assert stitch_tables([]) == ([], 0)
    # a page may hold several STACKED tables flattened into one record
    # list: only its first run continues the open table, its last run
    # is what the next page may continue
    stacked = t2 + t3  # a/b continuation, then a new x table
    recs, n = stitch_tables([t1, stacked, t3])
    assert recs == t1 + t2 + t3 + t3
    assert n == 2  # {t1+t2}, {t3 across the page break}
    recs, n = stitch_tables([t1, stacked, t1])
    assert n == 3  # x table does NOT continue into a/b keys
