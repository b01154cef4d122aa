"""Grid-image table extraction — pure NumPy (no OpenCV/PIL in sandbox).

The reference rasterizes PDF pages and has a vision model read the table
(scripts/ExtractX_OCR.py:240-288, 314-376). This rebuild replaces that
network hop with a deterministic layout-analysis kernel in the classic
OpenCV recipe, expressed in NumPy:

1. morphological OPEN with a 1×k horizontal kernel and a k×1 vertical
   kernel (erosion∘dilation via sliding-window min/max) → rule-line masks
2. line positions → grid coordinates → cell bounding boxes
3. per-cell glyph recognition against a fixed synthetic bitmap font
4. row/column reconstruction: first grid row = header, remaining rows
   become records keyed by header text (the shape the reference's prompt
   demands, scripts/ExtractX_OCR.py:332-343).

Rotation semantics match the reference: user rotation r ∈ {0,90,180,270}
is applied CLOCKWISE (PIL ``img.rotate(-r, expand=True)``,
scripts/ExtractX_OCR.py:271-272), with the r==0 no-op short-circuit
(scripts/ExtractX_OCR.py:294-295).

Payload wire format (the ``text`` column of a ``tool='grid'`` turn):
``GRIDv1|{json header h,w,rot}|{base64(np.packbits(img))}`` — img is a
uint8 0/1 ink mask, stored pre-rotated by ``rot`` degrees counterclockwise
so the extractor must rotate clockwise by ``rot`` to restore upright.
"""

from __future__ import annotations

import base64
import json

import numpy as np

#: Synthetic bitmap font: glyph = 3 wide × 5 tall; rows 0-3 encode the
#: 12-bit charset index (MSB first, row-major), row 4 is all-ink (anchors
#: positional segmentation). All glyphs distinct by construction.
CHARSET = "abcdefghijklmnopqrstuvwxyz0123456789 .,-_:/%+()"
_CHAR_IDX = {c: i for i, c in enumerate(CHARSET)}

GLYPH_W, GLYPH_H, GLYPH_PITCH = 3, 5, 4  # 1px inter-glyph gap
_CELL_PAD = 2
_LINE_FRACTION = 0.5  # a detected line must span ≥50% of the image


def _glyph(ch: str) -> np.ndarray:
    idx = _CHAR_IDX.get(ch)
    if idx is None:
        idx = _CHAR_IDX["?"] if "?" in _CHAR_IDX else 0
    g = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    for bit in range(12):
        if (idx >> (11 - bit)) & 1:
            g[bit // 3, bit % 3] = 1
    g[GLYPH_H - 1, :] = 1
    return g


def _render_text(text: str) -> np.ndarray:
    if not text:
        return np.zeros((GLYPH_H, 0), dtype=np.uint8)
    w = GLYPH_PITCH * len(text) - 1
    out = np.zeros((GLYPH_H, w), dtype=np.uint8)
    for i, ch in enumerate(text):
        out[:, i * GLYPH_PITCH : i * GLYPH_PITCH + GLYPH_W] = _glyph(ch)
    return out


def render_grid(
    cells: list[list[str]],
    merges: "dict[tuple[int, int], int] | None" = None,
) -> np.ndarray:
    """Render an R×C grid of cell texts into a 0/1 ink mask with rule
    lines. ``merges`` maps (row, col) → span: that cell spans ``span``
    columns — the interior vertical rule segments inside the span are
    erased (the covered cells' texts should be ''), producing the
    merged-cell geometry real tables have."""
    nrows = len(cells)
    ncols = max(len(r) for r in cells)
    maxlen = max(1, max(len(c) for row in cells for c in row))
    cell_h = GLYPH_H + 2 * _CELL_PAD
    cell_w = GLYPH_PITCH * maxlen - 1 + 2 * _CELL_PAD
    height = nrows * (cell_h + 1) + 1
    width = ncols * (cell_w + 1) + 1
    img = np.zeros((height, width), dtype=np.uint8)
    img[:: cell_h + 1, :] = 1  # horizontal rules
    img[:, :: cell_w + 1] = 1  # vertical rules
    for (r, c0), span in (merges or {}).items():
        y0 = r * (cell_h + 1) + 1
        for k in range(c0 + 1, c0 + span):
            img[y0 : y0 + cell_h, k * (cell_w + 1)] = 0
    for r, row in enumerate(cells):
        for c, text in enumerate(row):
            glyphs = _render_text(text)
            y = 1 + r * (cell_h + 1) + _CELL_PAD
            x = 1 + c * (cell_w + 1) + _CELL_PAD
            img[y : y + GLYPH_H, x : x + glyphs.shape[1]] = glyphs
    return img


def rot90_payload(img: np.ndarray, rotation: int) -> np.ndarray:
    """Apply the user rotation CLOCKWISE (reference semantics); 0 is a no-op."""
    if rotation % 360 == 0:
        return img  # short-circuit, scripts/ExtractX_OCR.py:294-295
    return np.rot90(img, k=-(rotation // 90))


def encode_grid_payload(img: np.ndarray, rot: int = 0) -> str:
    """Serialize an ink mask into the GRIDv1 text payload.

    ``rot`` > 0 stores the image rotated ``rot`` degrees counterclockwise;
    the extractor restores it with a clockwise rotation.
    """
    if rot % 360:
        img = np.rot90(img, k=rot // 90)
    h, w = img.shape
    header = json.dumps({"h": int(h), "w": int(w), "rot": int(rot % 360)})
    body = base64.b64encode(np.packbits(img)).decode("ascii")
    return f"GRIDv1|{header}|{body}"


def decode_grid_payload(payload: str) -> tuple[np.ndarray, int]:
    """Parse a GRIDv1 payload → (ink mask as stored, rotation to undo)."""
    magic, header_s, body = payload.split("|", 2)
    if magic != "GRIDv1":
        raise ValueError("not a GRIDv1 payload")
    header = json.loads(header_s)
    h, w = int(header["h"]), int(header["w"])
    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(body), dtype=np.uint8), count=h * w
    )
    return bits.reshape(h, w).astype(np.uint8), int(header.get("rot", 0))


def _movsum_last(x: np.ndarray, k: int) -> np.ndarray:
    """Moving window-sum of length k along the last axis (len n-k+1)."""
    cs = np.cumsum(x, axis=-1, dtype=np.int32)
    out = cs[..., k - 1 :].copy()
    out[..., 1:] -= cs[..., :-k]
    return out


def _open_1d(img: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Morphological opening with a 1D kernel of length k along ``axis``.

    erosion = sliding-window min, dilation = sliding-window max — the same
    operation cv2.morphologyEx(MORPH_OPEN, 1×k / k×1 kernel) performs. For
    a 0/1 mask both reduce to window sums (min=1 ⟺ sum==k; max=1 ⟺
    sum>0), so the whole opening is two cumsum passes — no strided
    window materialization.
    """
    if img.shape[axis] < k:
        return np.zeros_like(img)
    x = np.moveaxis(img, axis, -1)
    eroded_core = _movsum_last(x, k) == k  # window min over k
    pad = [(0, 0)] * (x.ndim - 1) + [(k - 1, k - 1)]
    eroded = np.pad(eroded_core, pad, constant_values=False)
    dilated = _movsum_last(eroded, k) > 0  # window max over k
    return np.moveaxis(dilated, -1, axis).astype(np.uint8)


def _line_positions(mask_1d: np.ndarray) -> list[int]:
    """Centers of consecutive runs of True in a 1D boolean array."""
    idx = np.flatnonzero(mask_1d)
    if idx.size == 0:
        return []
    splits = np.split(idx, np.flatnonzero(np.diff(idx) > 1) + 1)
    return [int(run[0]) for run in splits]


def detect_grid(img: np.ndarray) -> tuple[list[int], list[int]]:
    """Rule-line detection → (horizontal line rows, vertical line cols)."""
    h, w = img.shape
    kh = max(8, w // 16)
    kv = max(8, h // 16)
    h_open = _open_1d(img, min(kh, w), axis=1)
    v_open = _open_1d(img, min(kv, h), axis=0)
    h_rows = _line_positions(h_open.sum(axis=1) >= _LINE_FRACTION * w)
    v_cols = _line_positions(v_open.sum(axis=0) >= _LINE_FRACTION * h)
    return h_rows, v_cols


#: MSB-first weights for the 12-bit glyph index (bit position = row*3+col).
_BIT_POW = (1 << np.arange(11, -1, -1)).astype(np.int32)

_CHAR_LUT = np.array(list(CHARSET) + ["?"] * (4096 - len(CHARSET)))


def _decode_cell(cell: np.ndarray) -> str:
    """All glyphs of a cell decoded in one matrix product: slice the glyph
    band, reshape to (n_glyphs, 12) index bits, dot with the bit weights,
    look up the charset. A glyph whose 3-column block would run past the
    cell edge decodes as '?' (the per-glyph loop's short-block behavior).
    """
    ys, xs = np.nonzero(cell)
    if ys.size == 0:
        return ""
    # Every glyph's bottom row is all-ink, so the LAST inked row anchors the
    # glyph baseline (the index rows above it may be empty, e.g. charset[0]).
    y0 = int(ys.max()) - (GLYPH_H - 1)
    if y0 < 0:
        return "?"
    x0, x1 = int(xs.min()), int(xs.max())
    n = (x1 - x0 + 2) // GLYPH_PITCH
    if n <= 0:
        return ""
    w = cell.shape[1]
    band = cell[y0 : y0 + 4, x0 : x0 + n * GLYPH_PITCH]
    if band.shape[1] < n * GLYPH_PITCH:
        band = np.pad(band, ((0, 0), (0, n * GLYPH_PITCH - band.shape[1])))
    bits = (
        band.reshape(4, n, GLYPH_PITCH)[:, :, :GLYPH_W]
        .transpose(1, 0, 2)
        .reshape(n, 12)
        .astype(np.int32)
    )
    idx = bits @ _BIT_POW
    chars = _CHAR_LUT[idx]
    # short last block (would have shape != (5,3) in the scalar loop) → '?'
    starts = x0 + np.arange(n) * GLYPH_PITCH
    chars[starts + GLYPH_W > w] = "?"
    return "".join(chars)


# -- Borderless layout analysis --------------------------------------------
#
# The reference's vision model reads tables with NO ruling lines at all
# (scripts/ExtractX_OCR.py:325-330 — "identify table structures even
# without clear borders"). This is the classic whitespace layout-analysis
# fallback: rows come from horizontal ink-projection bands, columns from
# clustering the blank gaps of the vertical ink projection. It engages
# whenever rule-line detection finds no grid.
#
# Geometry contract that makes the split unambiguous: the inter-glyph gap
# is exactly 1 px (GLYPH_PITCH = GLYPH_W + 1) and every charset glyph —
# including ' ' — inks its bottom anchor row, so intra-cell whitespace
# never opens a blank run wider than 1 px. Any blank run of
# >= _COL_SPLIT_GAP px in the global column projection is therefore an
# inter-column gutter. The renderer leaves BORDERLESS_COL_GAP >=
# _COL_SPLIT_GAP blank px between column slots.

BORDERLESS_COL_GAP = 6
BORDERLESS_ROW_GAP = 5
_COL_SPLIT_GAP = 4
#: A text line can ink as few as two of its five glyph rows (e.g. a line
#: of 'y' glyphs inks only row 2 and the anchor), leaving internal blank
#: runs of up to GLYPH_H - 2 = 3 rows — so row bands merge across gaps
#: < _ROW_SPLIT_GAP and the renderer separates lines by more than that.
_ROW_SPLIT_GAP = 4
_BORDERLESS_MARGIN = 2


def render_borderless(cells: list[list[str]]) -> np.ndarray:
    """Render an R×C grid of cell texts WITHOUT rule lines: left-aligned
    column slots sized to the longest cell of each column, separated by
    BORDERLESS_COL_GAP blank px; rows separated by BORDERLESS_ROW_GAP
    blank rows."""
    nrows = len(cells)
    ncols = max(len(r) for r in cells)
    col_w = []
    for c in range(ncols):
        longest = max(
            (len(row[c]) for row in cells if c < len(row)), default=1
        )
        col_w.append(GLYPH_PITCH * max(longest, 1) - 1)
    height = 2 * _BORDERLESS_MARGIN + nrows * GLYPH_H
    height += (nrows - 1) * BORDERLESS_ROW_GAP
    width = 2 * _BORDERLESS_MARGIN + sum(col_w)
    width += (ncols - 1) * BORDERLESS_COL_GAP
    img = np.zeros((height, width), dtype=np.uint8)
    for r, row in enumerate(cells):
        y = _BORDERLESS_MARGIN + r * (GLYPH_H + BORDERLESS_ROW_GAP)
        x = _BORDERLESS_MARGIN
        for c in range(ncols):
            if c < len(row) and row[c]:
                g = _render_text(row[c])
                img[y : y + GLYPH_H, x : x + g.shape[1]] = g
            x += col_w[c] + BORDERLESS_COL_GAP
    return img


def _ink_bands(mask_1d: np.ndarray, split_gap: int) -> list[tuple[int, int]]:
    """(start, end) extents of ink runs, merging runs whose blank
    separation is < ``split_gap`` px."""
    idx = np.flatnonzero(mask_1d)
    if idx.size == 0:
        return []
    runs = np.split(idx, np.flatnonzero(np.diff(idx) >= split_gap + 1) + 1)
    return [(int(r[0]), int(r[-1])) for r in runs]


def detect_borderless_layout(
    img: np.ndarray,
) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    """(row bands, column spans) from ink projections: blank runs >=
    _ROW_SPLIT_GAP split text lines (smaller blanks are intra-line, see
    _ROW_SPLIT_GAP note); gutters >= _COL_SPLIT_GAP split columns."""
    rows = _ink_bands(img.sum(axis=1) > 0, split_gap=_ROW_SPLIT_GAP)
    cols = _ink_bands(img.sum(axis=0) > 0, split_gap=_COL_SPLIT_GAP)
    return rows, cols


def read_borderless_cells(img: np.ndarray) -> list[list[str]]:
    """Whitespace layout parse: projection bands → cell slices → glyph
    recognition. Every glyph's bottom anchor row is the lowest ink of its
    text line, so a band's END anchors the glyph box even when the index
    rows are blank (e.g. a line of all-'a' glyphs inks ONLY the anchor
    row and its detected band is 1 px tall)."""
    row_bands, col_spans = detect_borderless_layout(img)
    if not row_bands or not col_spans:
        return []
    out: list[list[str]] = []
    for _r0, r1 in row_bands:
        top = r1 - (GLYPH_H - 1)
        band = img[max(0, top) : r1 + 1]
        if top < 0:
            # image cropped mid-glyph-box (e.g. a page band starting at
            # the first ink row of a line whose glyphs leave their upper
            # index rows blank): the missing rows are provably blank —
            # no ink exists above the crop — so restore them as blanks
            band = np.pad(band, ((-top, 0), (0, 0)))
        out.append(
            [_decode_cell(band[:, c0 : c1 + 1]) for c0, c1 in col_spans]
        )
    return out


def read_grid_cells(img: np.ndarray) -> list[list[str]]:
    """Full layout parse: lines → cell bboxes → glyph recognition.

    Merged cells (a vertical rule segment absent within one row's band)
    decode once across the merged span and REPEAT the value into every
    covered column — the reference's merged-cell contract ("handle
    merged cells by repeating values appropriately",
    scripts/ExtractX_OCR.py:327). Ordinary grids ink every interior
    segment, so their behavior is unchanged."""
    h_rows, v_cols = detect_grid(img)
    if len(h_rows) < 2 or len(v_cols) < 2:
        return []
    ncols = len(v_cols) - 1

    def segment_present(r: int, k: int) -> bool:
        return bool(
            img[h_rows[r] + 1 : h_rows[r + 1], v_cols[k]].max(initial=0)
        )

    out: list[list[str]] = []
    for r in range(len(h_rows) - 1):
        row: list[str] = []
        c = 0
        while c < ncols:
            end = c
            while end + 1 < ncols and not segment_present(r, end + 1):
                end += 1
            cell = img[
                h_rows[r] + 1 : h_rows[r + 1],
                v_cols[c] + 1 : v_cols[end + 1],
            ]
            text = _decode_cell(cell)
            row.extend([text] * (end - c + 1))
            c = end + 1
        out.append(row)
    return out


#: Blank-row run separating stacked tables on one page. Must exceed any
#: intra-table blank: ruled grids have NO fully-blank rows (the vertical
#: rule lines ink every row), borderless tables blank at most
#: BORDERLESS_ROW_GAP = 5 rows between lines.
TABLE_SPLIT_GAP = 12


def split_table_bands(img: np.ndarray) -> list[tuple[int, int]]:
    """(y0, y1) extents of vertically separated content bands — one per
    stacked table (or other ink block) on the page."""
    return _ink_bands(img.sum(axis=1) > 0, split_gap=TABLE_SPLIT_GAP)


def render_page(
    tables: list[np.ndarray], gap: int = 2 * TABLE_SPLIT_GAP
) -> np.ndarray:
    """Stack pre-rendered table images vertically with ``gap`` blank rows
    (fixture generator for multi-table pages)."""
    width = max(t.shape[1] for t in tables)
    padded = [
        np.pad(t, ((0, 0), (0, width - t.shape[1]))) for t in tables
    ]
    blank = np.zeros((gap, width), dtype=np.uint8)
    rows = [padded[0]]
    for t in padded[1:]:
        rows += [blank, t]
    return np.concatenate(rows, axis=0)


def read_any_cells(img: np.ndarray) -> list[list[str]]:
    """Layout dispatch: rule-line grid parse first; when line detection
    finds no grid (a borderless table — the reference's vision model reads
    those too, scripts/ExtractX_OCR.py:325-330), fall back to whitespace
    layout analysis.

    The image is first cropped to its ink bounding box: detect_grid's
    line test is a FRACTION of image width/height, so a table narrower
    than half a padded page (e.g. a render_page band padded to a wider
    sibling's width) would otherwise fail rule detection and silently
    lose its records (round-5 review finding, repro'd)."""
    ys, xs = np.nonzero(img)
    if ys.size == 0:
        return []
    img = img[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
    cells = read_grid_cells(img)
    if cells:
        return cells
    return read_borderless_cells(img)


def _parse_bands(img: np.ndarray) -> "list[list[list[str]]]":
    """Full layout parse of a page: per stacked table band, its cell
    matrix via the ruled/borderless dispatch."""
    return [
        read_any_cells(img[y0 : y1 + 1]) for y0, y1 in split_table_bands(img)
    ]


def detect_orientation(img: np.ndarray, return_parse: bool = False):
    """Page-orientation detection (the Tesseract-OSD preprocessing step:
    real scans arrive rotated by arbitrary quarter turns with no
    declared orientation): try all four clockwise restore rotations,
    parse each candidate with the full layout dispatch, and score it by
    the number of glyphs that decode to a real charset character. The
    upright orientation decodes every glyph; a wrong quarter turn feeds
    the recognizer arbitrary 12-bit patterns, which mostly land in the
    '?' padding of the 4096-entry LUT. Ties (e.g. a blank page) keep the
    smallest rotation, so the scorer is deterministic given pixels.

    Cost: four layout parses per page — the standard price of
    orientation search; the parse is pure numpy and stays inside the
    same fused extraction stage.  ``return_parse=True`` hands back the
    winning rotation's parsed bands so the caller never pays a fifth
    parse re-deriving what the search already computed."""
    best_score, best_rot, best_bands = -1, 0, []
    for rot in (0, 90, 180, 270):
        cand = rot90_payload(img, rot)
        bands = _parse_bands(cand)
        score = sum(
            1
            for cells in bands
            for row in cells
            for cell in row
            for ch in cell
            if ch != "?"
        )
        if score > best_score:
            best_score, best_rot, best_bands = score, rot, bands
    if return_parse:
        return best_rot, best_bands
    return best_rot


def extract_grid_table(payload: str, auto_orient: bool = False) -> dict:
    """GRIDv1 payload → reference-shaped extraction result.

    Each stacked table on the page (blank bands >= TABLE_SPLIT_GAP rows
    separate them) parses independently — ruled or borderless
    (read_any_cells) — with its first row as the header; records from
    every table concatenate in page order, keyed by each table's own
    header ("if there are multiple tables, combine them logically",
    scripts/ExtractX_OCR.py:328-330). ``total_columns`` counts distinct
    keys across the combined records in first-seen order. Any failure
    degrades to the empty sentinel — a bad page never fails the job
    (scripts/ExtractX_OCR.py:282-284, 397).
    """
    from ocr_spark.kernels.salvage import _sentinel

    try:
        img, rot = decode_grid_payload(payload)
        img = rot90_payload(img, rot)
        if auto_orient:
            # the orientation search already parsed the winner fully —
            # reuse its bands instead of paying a fifth layout parse
            _, bands = detect_orientation(img, return_parse=True)
        else:
            bands = _parse_bands(img)
        records: list[dict] = []
        keys: dict[str, None] = {}
        for cells in bands:
            if len(cells) < 2:  # header-only / non-table ink block
                continue
            header = cells[0]
            keys.update({k: None for k in header})
            records += [
                {header[c]: row[c] for c in range(len(header))}
                for row in cells[1:]
            ]
    except Exception:
        return _sentinel()
    if not records:
        return _sentinel()
    return {
        "table_data": records,
        "summary": {
            "total_rows": len(records),
            "total_columns": len(keys),
            "confidence": "high",
        },
    }


# -- Multi-column prose reading order ---------------------------------------
#
# A two-column scan is NOT a table: each column is an independent text
# flow, and the correct linearization is column-major (all lines of the
# left column, then the right column). Reading it row-major — what a
# table parse would do — interleaves unrelated sentences, the classic
# OCR reading-order failure the reference's vision model avoids
# implicitly. This is the XY-cut step of classic layout analysis.

#: Blank gutter between prose columns (render). Must be >=
#: _COL_SPLIT_GAP; intra-column blanks never exceed the 1 px glyph gap
#: (the x projection is the ink UNION over all of a column's lines, and
#: every line is a contiguous glyph run from the column's left edge).
PROSE_COL_GAP = 10


def render_columns(columns: "list[list[str]]") -> np.ndarray:
    """Render a multi-column prose page: each column an independent
    list of left-aligned text lines; columns separated by PROSE_COL_GAP
    blank px, lines by BORDERLESS_ROW_GAP blank rows. Columns may have
    different line counts (ragged bottoms, like real pages)."""
    col_imgs = []
    for lines in columns:
        w = max(GLYPH_PITCH * max(len(t), 1) - 1 for t in lines)
        h = len(lines) * GLYPH_H + (len(lines) - 1) * BORDERLESS_ROW_GAP
        img = np.zeros((h, w), dtype=np.uint8)
        for i, t in enumerate(lines):
            g = _render_text(t)
            y = i * (GLYPH_H + BORDERLESS_ROW_GAP)
            img[y : y + GLYPH_H, : g.shape[1]] = g
        col_imgs.append(img)
    height = max(c.shape[0] for c in col_imgs)
    padded = [
        np.pad(c, ((0, height - c.shape[0]), (0, 0))) for c in col_imgs
    ]
    parts = [padded[0]]
    for c in padded[1:]:
        parts += [np.zeros((height, PROSE_COL_GAP), dtype=np.uint8), c]
    return np.pad(
        np.concatenate(parts, axis=1), _BORDERLESS_MARGIN
    ).astype(np.uint8)


def read_columns_text(img: np.ndarray) -> "list[str]":
    """Reading-order linearization of a multi-column prose page:
    columns from gutter gaps >= _COL_SPLIT_GAP in the x ink projection
    (an XY-cut), then per-column text lines from that column's own y
    projection (columns are cut FIRST, so ragged bottoms and unequal
    line counts never cross-talk), each line decoded with the anchored
    glyph box. Returns lines in reading order: every line of the
    leftmost column, then the next column."""
    ys, xs = np.nonzero(img)
    if ys.size == 0:
        return []
    img = img[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
    out: list[str] = []
    for c0, c1 in _ink_bands(img.sum(axis=0) > 0, _COL_SPLIT_GAP):
        sub = img[:, c0 : c1 + 1]
        for _r0, r1 in _ink_bands(sub.sum(axis=1) > 0, _ROW_SPLIT_GAP):
            top = r1 - (GLYPH_H - 1)
            band = sub[max(0, top) : r1 + 1]
            if top < 0:
                band = np.pad(band, ((-top, 0), (0, 0)))
            out.append(_decode_cell(band))
    return out


def stitch_tables(
    page_tables: "list[list[dict]]",
) -> "tuple[list[dict], int]":
    """Cross-PAGE table continuation merge: a table that continues onto
    the next page repeats its header row there (the universal print
    layout), so consecutive pages whose parsed column keys match are ONE
    logical table — their record streams concatenate, and the repeated
    header contributes no extra record (each page's parse already
    consumed its own header row). A page opening with different keys
    starts a new table; a blank page breaks any open continuation.
    A page may itself hold several STACKED tables, which
    extract_grid_table flattens into one record list — so each page
    first splits into runs of consecutive same-key records; only the
    page's FIRST run can continue the previous page's table, and its
    LAST run is what the next page may continue.

    Returns (records in page order, number of logical tables) — the
    reference's "combine them logically" contract
    (scripts/ExtractX_OCR.py:328-330) applied across page boundaries."""
    records: list[dict] = []
    n_tables = 0
    prev_keys: "tuple | None" = None
    for tbl in page_tables:
        if not tbl:
            prev_keys = None
            continue
        runs: "list[tuple[tuple, list[dict]]]" = []
        for rec in tbl:
            keys = tuple(rec.keys())
            if runs and runs[-1][0] == keys:
                runs[-1][1].append(rec)
            else:
                runs.append((keys, [rec]))
        for ri, (keys, recs) in enumerate(runs):
            if not (ri == 0 and keys == prev_keys):
                n_tables += 1
            records.extend(recs)
        prev_keys = runs[-1][0]
    return records, n_tables
