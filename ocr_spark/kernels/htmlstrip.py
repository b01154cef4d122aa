"""HTML main-content extraction via DOM-density heuristics.

Boilerplate stripping in the classic text-to-tag-ratio / link-density style
(Kohlschütter et al., "Boilerplate Detection Using Shallow Text Features",
WSDM 2010 — public method). No HTML parser libraries: a single compiled
regex token scan segments the document into block-level regions, then each
block is kept or dropped on three fixed, deterministic features:

- ``text_len``    — normalized visible text length of the block
- ``link_density``— chars inside <a> / total chars
- ``text_to_tag`` — text_len / (1 + inline tag count)

Thresholds are constants (never tuned per input) so results are stable
across runs, partitions, and parallelism levels.
"""

from __future__ import annotations

import html as _html
import re

# Tags that delimit block-level regions. script/style contents are dropped.
_BLOCK_TAGS = frozenset(
    """html head body title p div br hr h1 h2 h3 h4 h5 h6 li ul ol dl dt dd
    table thead tbody tfoot tr td th nav footer header aside section article
    main blockquote pre form figure figcaption""".split()
)

_TOKEN_RE = re.compile(r"<!--.*?-->|<[^>]*>|[^<]+", re.DOTALL)
_SCRIPT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)
_WS_RE = re.compile(r"\s+")
_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")

MIN_TEXT_LEN = 10
MAX_LINK_DENSITY = 0.35
MIN_TEXT_TO_TAG = 8.0


def _norm(parts: list[str]) -> str:
    return _WS_RE.sub(" ", _html.unescape("".join(parts))).strip()


def strip_html(doc: str | None) -> str:
    """Return the main-content text: kept blocks joined by newline."""
    if not doc or "<" not in doc:
        # plain text payload — normalize and return as-is
        return _WS_RE.sub(" ", _html.unescape(doc or "")).strip()
    doc = _SCRIPT_RE.sub(" ", doc)

    kept: list[str] = []
    text_parts: list[str] = []
    link_parts: list[str] = []
    n_inline_tags = 0
    link_depth = 0

    def flush() -> None:
        nonlocal text_parts, link_parts, n_inline_tags
        text = _norm(text_parts)
        if text:
            n = len(text)
            link_density = len(_norm(link_parts)) / n
            if (
                n >= MIN_TEXT_LEN
                and link_density <= MAX_LINK_DENSITY
                and n / (1.0 + n_inline_tags) >= MIN_TEXT_TO_TAG
            ):
                kept.append(text)
        text_parts = []
        link_parts = []
        n_inline_tags = 0

    for m in _TOKEN_RE.finditer(doc):
        tok = m.group(0)
        if tok.startswith("<!--"):
            continue
        if tok.startswith("<"):
            name_m = _TAG_NAME_RE.match(tok)
            name = name_m.group(1).lower() if name_m else ""
            if name in _BLOCK_TAGS:
                flush()
                link_depth = 0
            else:
                n_inline_tags += 1
                if name == "a":
                    if tok.startswith("</"):
                        link_depth = max(0, link_depth - 1)
                    elif not tok.endswith("/>"):
                        link_depth += 1
        else:
            text_parts.append(tok)
            if link_depth > 0:
                link_parts.append(tok)
    flush()
    return "\n".join(kept)
