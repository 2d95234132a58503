"""HTML text extraction [EXT — the web-corpus ingestion stage].

The reference analyses documents it is given (see
/root/reference/mongo_analyser/core/analyser.py); a 100-TB training-data
pipeline is usually given crawled HTML instead, and the first operator
it runs is strip-markup-to-text. This module implements that stage on
stdlib only (``html.parser`` + ``html.unescape`` — both public Python),
in the spirit of trafilatura/jusText but deterministic and
dependency-free:

* ``<script>``/``<style>``/``<template>`` subtrees and comments are
  dropped entirely;
* character references (named and numeric) decode to text;
* block-level elements and ``<br>`` introduce line breaks, inline
  elements do not — so paragraph structure survives as newlines;
* runs of intra-line whitespace collapse to one space, blank lines
  collapse to one, and the result is stripped.

The Spark-side contract is the codec pattern: adaptive fanout → one
Arrow-batched ``mapInPandas`` stage emitting fixed-width feature rows —
embarrassingly parallel, no shuffle of document bodies.
"""

from __future__ import annotations

from html.parser import HTMLParser

#: elements whose subtree is not content
_SKIP = {"script", "style", "template"}

#: elements that force a line break before AND after their content
#: (HTML5 flow-level block elements plus table/list structure)
_BLOCK = {
    "address", "article", "aside", "blockquote", "body", "caption",
    "dd", "details", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "head", "header", "hr", "html", "li", "main", "nav", "ol", "p",
    "pre", "section", "summary", "table", "tbody", "td", "tfoot",
    "th", "thead", "title", "tr", "ul",
}


class _TextExtractor(HTMLParser):
    """Streaming extractor: collects text chunks and line-break marks.

    ``convert_charrefs=True`` (the default) makes the parser decode
    named and numeric character references before ``handle_data`` —
    entity handling rides the stdlib state machine.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []  # text chunks and "\n" marks

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return  # e.g. a <p> inside <template> is not content
        if tag == "br" or tag in _BLOCK:
            self._parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if self._skip_depth:
            return
        if tag == "br" or tag in _BLOCK:
            self._parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag in _BLOCK:
            self._parts.append("\n")

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self._parts.append(data)

    def text(self) -> str:
        """Assemble with the whitespace policy from the module doc."""
        lines: list[str] = []
        cur: list[str] = []
        for part in self._parts:
            if part == "\n":
                lines.append("".join(cur))
                cur = []
            else:
                cur.append(part)
        lines.append("".join(cur))
        out: list[str] = []
        for line in lines:
            collapsed = " ".join(line.split())
            if collapsed:
                out.append(collapsed)
        return "\n".join(out)


def extract_text_html(html: str) -> str:
    """Markup-stripped text of an HTML document (see module doc for
    the whitespace/line policy). Malformed markup never raises — the
    stdlib parser is tolerant by design, so this is safe on crawled
    input without an armor wrapper."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    return p.text()


def sniff_charset(
    body: bytes, content_type: str | None = None
) -> tuple[str, bool]:
    """(encoding, certain) for crawled HTML bytes — the HTML5 §13.2.3
    order: BOM (decisive), then the transport-layer Content-Type
    charset parameter, then a prescan of the first 1024 bytes for
    ``<meta charset=...>`` / ``<meta http-equiv=content-type ...>``,
    else the spec's windows-1252 default (certain=False)."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8", True
    if body[:2] == b"\xff\xfe":
        return "utf-16-le", True
    if body[:2] == b"\xfe\xff":
        return "utf-16-be", True
    if content_type:
        for part in content_type.split(";")[1:]:
            k, sep, v = part.partition("=")
            if sep and k.strip().lower() == "charset":
                return v.strip().strip("\"'").lower(), True
    head = body[:1024].decode("iso-8859-1", "replace").lower()
    i = 0
    while True:
        i = head.find("<meta", i)
        if i < 0:
            break
        j = head.find(">", i)
        tag = head[i:j if j > 0 else len(head)]
        m = tag.find("charset")
        if m >= 0:
            rest = tag[m + 7:].lstrip().lstrip("=").strip()
            # charset=X or content="text/html; charset=X"
            enc = rest.split(";")[0].strip(" \"'/")
            for stop in (" ", "\"", "'"):
                enc = enc.split(stop)[0]
            if enc:
                return enc.lower(), True
        i += 5
    return "windows-1252", False


def decode_html_bytes(
    body: bytes, content_type: str | None = None
) -> tuple[str, str]:
    """(encoding, decoded text) — sniff, strip the BOM, decode with
    replacement (crawled bytes lie about their own charset)."""
    enc, _certain = sniff_charset(body, content_type)
    if body[:3] == b"\xef\xbb\xbf":
        body = body[3:]
    elif body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        body = body[2:]
    try:
        return enc, body.decode(enc, "replace")
    except LookupError:  # unknown label in the wild -> spec default
        return "windows-1252", body.decode("cp1252", "replace")


def html_text_features(html: str) -> dict:
    """Deterministic features of the extracted text: the numbers a
    quality-filter stage reads before deciding to keep a crawled page
    (text length, line count, markup ratio)."""
    text = extract_text_html(html)
    raw_len = len(html or "")
    return {
        "text": text,
        "n_chars": len(text),
        "n_lines": text.count("\n") + 1 if text else 0,
        "text_ratio": round(len(text) / raw_len, 4) if raw_len else 0.0,
    }
