"""HTML text extraction (operators/textextract.py, round 15)."""

from mongo_analyser_spark.operators.textextract import (
    extract_text_html,
    html_text_features,
)


def test_entities_decode_named_numeric_hex():
    assert extract_text_html(
        "<p>a &amp; b &lt;c&gt; &#65; &#x42; &quot;q&quot;</p>"
    ) == 'a & b <c> A B "q"'


def test_script_style_template_subtrees_dropped():
    h = (
        "<body><script>var p = '<p>fake</p>';</script>keep1"
        "<style>h1 {color: red}</style>keep2"
        "<template><p>shadow</p></template>keep3</body>"
    )
    # script/style/template are invisible: adjacent text concatenates
    # (browser semantics), and the template's inner <p> contributes
    # neither text nor a line break
    assert extract_text_html(h) == "keep1keep2keep3"


def test_cdata_content_and_comments_browser_consistent():
    # stdlib CDATA mode: script content is raw until the FIRST
    # </script>, so the inner '<script>' is dropped as content, 'x' is
    # visible text after it, and the stray close tag is ignored —
    # exactly what a browser renders
    h = "<div>a<!-- <p>ghost</p> --><script><script></script>x</script>b</div>"
    assert extract_text_html(h) == "axb"


def test_block_elements_break_lines_inline_do_not():
    h = (
        "<h1>head</h1><p>one <b>bold</b> <i>ital</i> para</p>"
        "<ul><li>first</li><li>second</li></ul>before<br>after"
    )
    assert extract_text_html(h) == (
        "head\none bold ital para\nfirst\nsecond\nbefore\nafter"
    )
    # self-closing br (XHTML) too
    assert extract_text_html("a<br/>b") == "a\nb"


def test_whitespace_policy():
    h = "<p>  spaced\tout\n\nwords  </p><p></p><p>  </p><div>tail</div>"
    # intra-line runs collapse, empty lines vanish
    assert extract_text_html(h) == "spaced out words\ntail"


def test_malformed_markup_never_raises():
    for bad in (
        "<p>unclosed", "</b>stray", "<a href='>weird", "", None,
        "plain text", "<" * 100, "&#xZZ; &unknown; &#999999999;",
    ):
        extract_text_html(bad)  # tolerant by contract


def test_features():
    f = html_text_features("<h1>t</h1><p>a b</p>")
    assert f["n_chars"] == len("t\na b")
    assert f["n_lines"] == 2
    assert 0 < f["text_ratio"] < 1
    assert html_text_features("") == {
        "text": "", "n_chars": 0, "n_lines": 0, "text_ratio": 0.0,
    }


def test_sniff_charset_precedence():
    from mongo_analyser_spark.operators.textextract import sniff_charset

    t = "héllo"
    # BOM is decisive and beats any header
    assert sniff_charset(
        b"\xef\xbb\xbf" + t.encode("utf-8"),
        "text/html; charset=iso-8859-1",
    ) == ("utf-8", True)
    assert sniff_charset(b"\xff\xfex\x00", None) == ("utf-16-le", True)
    assert sniff_charset(b"\xfe\xff\x00x", None) == ("utf-16-be", True)
    # transport header beats the meta prescan
    assert sniff_charset(
        b'<meta charset="utf-8">x', "text/html; charset=ISO-8859-1"
    ) == ("iso-8859-1", True)
    # meta variants
    assert sniff_charset(b'<meta charset="utf-8">x', None) == (
        "utf-8", True,
    )
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=iso-8859-1">x',
        None,
    ) == ("iso-8859-1", True)
    # nothing declared -> the spec default, uncertain
    assert sniff_charset(b"plain ascii", None) == ("windows-1252", False)


def test_decode_html_bytes_strips_bom_and_survives_bogus_labels():
    from mongo_analyser_spark.operators.textextract import decode_html_bytes

    t = "héllo wörld"
    enc, txt = decode_html_bytes(b"\xef\xbb\xbf" + t.encode("utf-8"))
    assert (enc, txt) == ("utf-8", t)
    enc, txt = decode_html_bytes(b"\xff\xfe" + t.encode("utf-16-le"))
    assert (enc, txt) == ("utf-16-le", t)
    enc, txt = decode_html_bytes(
        t.encode("latin-1"), "text/html; charset=ISO-8859-1"
    )
    assert (enc, txt) == ("iso-8859-1", t)
    # an unknown label in the wild falls back to the spec default
    enc, txt = decode_html_bytes(b"<meta charset=bogus-enc>xyz")
    assert enc == "windows-1252" and txt.endswith("xyz")
