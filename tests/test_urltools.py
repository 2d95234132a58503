"""URL canonicalization (operators/urltools.py, round 15)."""

import pytest

from mongo_analyser_spark.operators.urltools import (
    canonicalize_url,
    normalize_percent,
    remove_dot_segments,
    url_features,
)


@pytest.mark.parametrize(
    "url,want",
    [
        # scheme/host case + default port + dot segments + fragment
        ("HTTP://Example.COM:80/a/b/../c?x=1#f", "http://example.com/a/c?x=1"),
        ("https://EXAMPLE.com:443/./p/", "https://example.com/p/"),
        # empty path -> "/", empty query drops its "?"
        ("http://example.com", "http://example.com/"),
        ("http://example.com/p?", "http://example.com/p"),
        # percent policy: unreserved decode, reserved uppercase hex,
        # malformed escapes pass through
        ("http://example.com/%41x%2f?q=%7e", "http://example.com/Ax%2F?q=~"),
        ("http://example.com/%zz", "http://example.com/%zz"),
        # credentials strip; non-default ports stay
        ("http://u:p@example.com/p?t=1", "http://example.com/p?t=1"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # doubled slashes are NOT collapsed (distinct resources)
        ("http://example.com/a//b", "http://example.com/a//b"),
        # dot-segment underflow clamps at root
        ("http://example.com/../..", "http://example.com/"),
        # ws/ftp default ports
        ("ws://example.com:80/s", "ws://example.com/s"),
        ("ftp://example.com:21/f", "ftp://example.com/f"),
    ],
)
def test_canonical_forms(url, want):
    assert canonicalize_url(url) == want


@pytest.mark.parametrize(
    "url", ["not a url", "/relative/only", "", None, "http://",
            "http://example.com:abc/x"],
)
def test_unkeyable_inputs_return_none(url):
    assert canonicalize_url(url) is None


def test_tracking_params_drop_only_when_asked():
    u = "http://example.com/a?utm_source=x&y=2&fbclid=9&UTM_medium=m"
    assert canonicalize_url(u) == u
    assert (
        canonicalize_url(u, drop_tracking=True)
        == "http://example.com/a?y=2"
    )
    assert (
        canonicalize_url("http://example.com/a?utm_source=x",
                         drop_tracking=True)
        == "http://example.com/a"
    )


def test_idna_host():
    assert (
        canonicalize_url("http://bücher.example/x")
        == "http://xn--bcher-kva.example/x"
    )


def test_rfc3986_dot_segment_examples():
    # §5.2.4's worked examples
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"


def test_percent_normalization_unit():
    assert normalize_percent("%41%61%2f%ZZ%7e") == "Aa%2F%ZZ~"
    assert normalize_percent("%4") == "%4"  # truncated escape


def test_url_features():
    f = url_features("HTTP://Example.COM:80/a/b/../c?x=1#f")
    assert f == {
        "canonical": "http://example.com/a/c?x=1",
        "host": "example.com",
        "path_depth": 2,
        "has_query": True,
    }
    assert url_features("garbage")["canonical"] is None


def test_robots_features_first_match_and_groups():
    from mongo_analyser_spark.operators.urltools import robots_features

    # first-match-wins: the later Allow cannot rescue /private/ok
    f = robots_features(
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
        "Crawl-delay: 2\n",
        "sparkbot",
        ["http://e.com/private/ok", "http://e.com/pub"],
    )
    assert f == {"allowed": [False, True], "crawl_delay": 2,
                 "n_sitemaps": 0}
    # group selection: the specific agent's total block wins over the
    # open wildcard group
    f = robots_features(
        "User-agent: sparkbot\nDisallow: /\n\nUser-agent: *\nDisallow:\n",
        "sparkbot",
        ["http://e.com/x"],
    )
    assert f["allowed"] == [False]
    f = robots_features(
        "User-agent: sparkbot\nDisallow: /\n\nUser-agent: *\nDisallow:\n",
        "otherbot",
        ["http://e.com/x"],
    )
    assert f["allowed"] == [True]
    # sitemaps count; empty/None bodies allow everything
    f = robots_features(
        "User-agent: *\nDisallow: /p\nSitemap: http://e.com/s.xml\n",
        "sparkbot",
        ["http://e.com/p", "http://e.com/q"],
    )
    assert f == {"allowed": [False, True], "crawl_delay": None,
                 "n_sitemaps": 1}
    assert robots_features(None, "a", ["http://e.com/x"])["allowed"] == [
        True,
    ]


def test_parse_sitemap_urlset_index_gzip_and_armor():
    import gzip as _gzip

    from mongo_analyser_spark.operators.urltools import parse_sitemap

    sm = (
        b'<?xml version="1.0" encoding="UTF-8"?>'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>http://e.com/a</loc><lastmod>2026-01-02</lastmod>"
        b"<priority>0.8</priority></url>"
        b"<url><loc>http://e.com/b</loc><priority>junk</priority></url>"
        b"<url><lastmod>2026-01-01</lastmod></url>"  # no loc -> skipped
        b"</urlset>"
    )
    out = parse_sitemap(sm)
    assert out["kind"] == "urlset"
    assert [e["loc"] for e in out["entries"]] == [
        "http://e.com/a", "http://e.com/b",
    ]
    assert out["entries"][0]["lastmod"] == "2026-01-02"
    assert out["entries"][0]["priority"] == 0.8
    assert out["entries"][1]["priority"] is None  # junk tolerated
    # gzip wrapper
    assert parse_sitemap(_gzip.compress(sm)) == out
    # sitemap index
    idx = (
        b'<sitemapindex xmlns='
        b'"http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<sitemap><loc>http://e.com/s1.xml.gz</loc></sitemap>"
        b"</sitemapindex>"
    )
    out = parse_sitemap(idx)
    assert out["kind"] == "sitemapindex"
    assert out["entries"][0]["loc"] == "http://e.com/s1.xml.gz"
    # armor
    import pytest as _pytest

    with _pytest.raises(ValueError, match="malformed sitemap XML"):
        parse_sitemap(b"<urlset><url>")
    with _pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap(b"<html></html>")
    with _pytest.raises(ValueError, match="corrupt gzip"):
        parse_sitemap(b"\x1f\x8b\x00nope")
