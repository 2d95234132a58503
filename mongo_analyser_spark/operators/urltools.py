"""URL canonicalization [EXT — the crawl-dedup key of the pipeline tier].

A web corpus dedups first by URL: the same page is crawled under
scheme/case/port/dot-segment/percent-encoding variants, and the
canonical form is the join key. This implements RFC 3986 §6
(syntax-based normalization) on stdlib ``urllib.parse``:

* scheme and host lowercase; default ports (http:80, https:443) drop;
* userinfo strips (credentials never belong in a dedup key);
* dot-segments resolve per §5.2.4 (the algorithm verbatim below);
* percent-escapes of UNRESERVED characters decode (%41 -> A, %7E -> ~),
  all remaining escapes uppercase their hex (%2f -> %2F) — §6.2.2.1-2;
* an empty path becomes "/" and fragments drop (they never reach the
  server); an empty query keeps no "?";
* non-ASCII hosts ASCIIfy through the stdlib IDNA codec when they can;
* optionally, tracking parameters (``utm_*`` and friends) drop — the
  one step beyond pure syntax, standard crawler practice.

Everything is a per-row string transform: in Spark it runs inside the
same Arrow-batched stages as the other text operators, and the
canonical string then feeds the ordinary exact-dedup shuffle
(groupBy(canonical)) — no new distributed machinery.
"""

from __future__ import annotations

from urllib.parse import urlsplit

#: RFC 3986 §2.3 unreserved characters
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)

_DEFAULT_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443,
                  "ftp": 21}

#: tracking parameters dropped with drop_tracking=True (public crawler
#: convention — the utm_* family plus the common click identifiers)
_TRACKING = ("utm_",)
_TRACKING_EXACT = frozenset(
    {"gclid", "fbclid", "msclkid", "mc_eid", "igshid"}
)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4, verbatim state machine."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            if i < 0:
                i = len(inp)
            out.append(inp[:i])
            inp = inp[i:]
    return "".join(out)


def normalize_percent(s: str) -> str:
    """§6.2.2: decode escapes of unreserved characters, uppercase the
    hex of every other escape; malformed escapes pass through untouched
    (tolerant — crawled URLs lie)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1 and i + 3 <= n:
            hx = s[i + 1:i + 3]
            if len(hx) == 2 and all(
                ch in "0123456789abcdefABCDEF" for ch in hx
            ):
                v = chr(int(hx, 16))
                if v in _UNRESERVED:
                    out.append(v)
                else:
                    out.append("%" + hx.upper())
                i += 3
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _ascii_host(host: str) -> str:
    if host.isascii():
        return host
    try:
        return host.encode("idna").decode("ascii")
    except UnicodeError:
        return host  # tolerant: leave as lowercased unicode


def canonicalize_url(url: str, drop_tracking: bool = False) -> str | None:
    """Canonical form per the module doc, or None when the input has no
    recognizable scheme+host (relative references are not page keys)."""
    try:
        parts = urlsplit((url or "").strip())
    except ValueError:
        return None
    if not parts.scheme or not parts.hostname:
        return None
    scheme = parts.scheme.lower()
    host = _ascii_host(parts.hostname.lower())
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = normalize_percent(remove_dot_segments(parts.path)) or "/"
    query = normalize_percent(parts.query)
    if drop_tracking and query:
        kept = [
            kv
            for kv in query.split("&")
            if kv
            and not kv.split("=", 1)[0].lower().startswith(_TRACKING)
            and kv.split("=", 1)[0].lower() not in _TRACKING_EXACT
        ]
        query = "&".join(kept)
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def robots_features(
    robots_txt: str, agent: str, urls: list[str]
) -> dict:
    """Crawl-politeness features from a robots.txt body (stdlib
    ``urllib.robotparser`` — first-match-wins per the original REP
    draft, which is that module's documented behavior): per-URL allow
    flags for ``agent``, the agent's crawl delay, and the sitemap
    count. The corpus-build filter joins these against the URL table
    before fetching."""
    from urllib.robotparser import RobotFileParser

    rp = RobotFileParser()
    rp.parse((robots_txt or "").splitlines())
    delay = rp.crawl_delay(agent)
    maps = rp.site_maps()
    return {
        "allowed": [bool(rp.can_fetch(agent, u)) for u in urls],
        "crawl_delay": int(delay) if delay is not None else None,
        "n_sitemaps": len(maps) if maps else 0,
    }


def parse_sitemap(data: bytes) -> dict:
    """Sitemap-protocol parse (sitemaps.org 0.9, stdlib ElementTree):
    ``{"kind": "urlset"|"sitemapindex", "entries": [{"loc", "lastmod",
    "priority"}...]}``. Gzip-wrapped sitemaps (the ``.xml.gz``
    convention robots.txt links to) decompress first, bounded. Entries
    without a <loc> are skipped; malformed XML raises ValueError (the
    untrusted-input contract)."""
    import gzip
    import xml.etree.ElementTree as ET

    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError) as exc:
            raise ValueError(f"corrupt gzip sitemap: {exc}") from None
        if len(data) > (1 << 26):
            raise ValueError("sitemap exceeds the 64 MiB bound")
    try:
        root = ET.fromstring(data)
    except ET.ParseError as exc:
        raise ValueError(f"malformed sitemap XML: {exc}") from None
    kind = root.tag.split("}")[-1]
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap document ({kind})")
    entries = []
    for child in root:
        fields = {c.tag.split("}")[-1]: (c.text or "").strip()
                  for c in child}
        if fields.get("loc"):
            try:
                prio = float(fields["priority"])
            except (KeyError, ValueError):
                prio = None  # tolerant: junk priorities are common
            entries.append(
                {
                    "loc": fields["loc"],
                    "lastmod": fields.get("lastmod"),
                    "priority": prio,
                }
            )
    return {"kind": kind, "entries": entries}


def url_features(url: str, drop_tracking: bool = False) -> dict:
    """The per-URL columns a curation stage keys on."""
    canon = canonicalize_url(url, drop_tracking=drop_tracking)
    if canon is None:
        return {
            "canonical": None, "host": None, "path_depth": None,
            "has_query": None,
        }
    parts = urlsplit(canon)
    depth = sum(1 for seg in parts.path.split("/") if seg)
    return {
        "canonical": canon,
        "host": parts.hostname,
        "path_depth": depth,
        "has_query": bool(parts.query),
    }
