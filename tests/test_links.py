"""Outlink kernel + crawl-graph operators (r5)."""

from __future__ import annotations

from gemini_ocr_batch_spark.kernels.links import extract_links
from gemini_ocr_batch_spark.operators.links import (
    domain_link_stats,
    page_links,
)


def test_extract_links_basic_order_and_text():
    html = (
        '<html><body><a href="/one">First <b>bold</b> link</a>'
        '<p>noise</p><a href="https://x.example/p?q=1">second</a>'
        "<a>no href dropped</a></body></html>"
    )
    assert extract_links(html) == [
        ("/one", "First bold link"),
        ("https://x.example/p?q=1", "second"),
    ]


def test_extract_links_skips_script_and_entities():
    html = (
        '<script>var a = \'<a href="/fake">x</a>\';</script>'
        '<a href="/r&amp;d">R&amp;D</a>'
    )
    assert extract_links(html) == [("/r&d", "R&D")]


def test_extract_links_nested_and_unterminated():
    # inner anchor's text belongs to the innermost; unterminated anchor
    # flushes at EOF
    html = '<a href="/outer">out <a href="/inner">in</a><a href="/tail">t'
    links = extract_links(html)
    assert ("/inner", "in") in links
    assert ("/tail", "t") in links
    assert ("/outer", "out") in links


def test_extract_links_eof_flush_keeps_document_order():
    # several anchors left open at EOF must flush in open (= document)
    # order, not innermost-first (r5 ADVICE)
    html = '<a href="/first">one <a href="/second">two <a href="/third">three'
    assert [h for h, _ in extract_links(html)] == [
        "/first", "/second", "/third"
    ]


def test_extract_links_never_raises_on_junk():
    for junk in ("", "<a href=", "<<<>>>", "\x00\x01<a href='/x'>y</a>"):
        assert isinstance(extract_links(junk), list)


def test_page_links_skips_non_html(spark):
    rows = [
        ("https://a.example/1.html",
         b'<html><body><a href="/x">x</a></body></html>'),
        ("https://a.example/2.pdf", b"%PDF-1.4 not html"),
        ("https://a.example/3.html", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = page_links(df).collect()
    assert [(r["url"], r["link_no"], r["href"], r["anchor"])
            for r in got] == [("https://a.example/1.html", 0, "/x", "x")]


def test_domain_link_stats_resolves_relative_to_src(spark):
    rows = [
        ("https://a.example/1.html", 0, "/local", "l"),
        ("https://a.example/1.html", 1, "https://b.example/x", "b"),
        ("https://a.example/2.html", 0, "https://b.example/y", "b2"),
        ("https://a.example/2.html", 1, "https://b.example/y", "dup"),
    ]
    links = spark.createDataFrame(
        rows, "url string, link_no int, href string, anchor string"
    )
    got = {
        (r["src_domain"], r["dst_domain"]): (r["n_links"], r["n_unique_hrefs"])
        for r in domain_link_stats(links).collect()
    }
    assert got[("a.example", "a.example")] == (1, 1)
    assert got[("a.example", "b.example")] == (3, 2)


def test_domain_link_stats_drops_non_hierarchical_hrefs(spark):
    # mailto:/javascript:/tel:/data: and bare fragments are not edges —
    # they must not inflate the intra-domain count (r5 ADVICE)
    rows = [
        ("https://a.example/1.html", 0, "/real", "l"),
        ("https://a.example/1.html", 1, "mailto:x@y.z", "mail"),
        ("https://a.example/1.html", 2, "javascript:void(0)", "js"),
        ("https://a.example/1.html", 3, "tel:+123", "tel"),
        ("https://a.example/1.html", 4, "data:text/plain,hi", "data"),
        ("https://a.example/1.html", 5, "#top", "frag"),
    ]
    links = spark.createDataFrame(
        rows, "url string, link_no int, href string, anchor string"
    )
    got = {
        (r["src_domain"], r["dst_domain"]): (r["n_links"], r["n_unique_hrefs"])
        for r in domain_link_stats(links).collect()
    }
    assert got == {("a.example", "a.example"): (1, 1)}


def test_extract_links_fuzz_never_raises_and_respects_contract():
    """Property fuzz: on arbitrary tag-soup, extract_links returns a list
    of (non-empty href, normalized anchor) pairs and never raises."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.sampled_from([
        '<a href="/x">', "<a>", "</a>", '<a href="">', "<a href='y'>",
        "text", "<script>", "</script>", "<p>", "&amp;", "<", ">", '"',
        "<a href=/bare>", "<!-- c -->", "\x00", "</p>", "<a href",
    ])
    soup = st.lists(frag, min_size=0, max_size=30).map("".join)

    @settings(max_examples=200, deadline=None)
    @given(soup)
    def run(html):
        links = extract_links(html)
        for href, anchor in links:
            assert href  # hrefless anchors are dropped
            assert anchor == " ".join(anchor.split())  # normalized

    run()


def test_extract_page_meta_fields():
    from gemini_ocr_batch_spark.kernels.links import extract_page_meta

    html = (
        "<html><head><title> My   Page &amp; Co </title>"
        '<meta name="Description" content="a summary here">'
        '<meta name="description" content="second ignored">'
        '<link rel="canonical" href="https://ex.com/real">'
        "<script>var t = '<title>fake</title>';</script>"
        "</head><body>body</body></html>"
    )
    title, desc, canon = extract_page_meta(html)
    assert title == "My Page & Co"
    assert desc == "a summary here"          # first wins
    assert canon == "https://ex.com/real"
    assert extract_page_meta("<p>no head</p>") == (None, None, None)
    assert extract_page_meta("") == (None, None, None)


def test_page_metadata_null_row_for_non_html(spark):
    from gemini_ocr_batch_spark.operators.links import page_metadata

    rows = [
        ("https://a.example/1.html",
         b"<html><head><title>one</title></head><body>x</body></html>"),
        ("https://a.example/2.pdf", b"%PDF-1.4 whatever"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in page_metadata(df).collect()}
    assert len(got) == 2                      # 1:1 with input
    assert got["https://a.example/1.html"]["title"] == "one"
    assert got["https://a.example/2.pdf"]["title"] is None


def test_extract_page_meta_fuzz_never_raises():
    """Property fuzz for the metadata parser: same contract as the link
    parser — never raises, normalized title, first-description-wins."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gemini_ocr_batch_spark.kernels.links import extract_page_meta

    frag = st.sampled_from([
        "<title>", "</title>", "t1", " t2 ", "<head>", "</head>",
        '<meta name="description" content="d1">', "<meta name=description>",
        '<link rel="canonical" href="/c">', '<link rel=canonical>',
        "<script>", "</script>", "&amp;", "<", ">", "\x00", "<titl",
    ])
    soup = st.lists(frag, min_size=0, max_size=25).map("".join)

    @settings(max_examples=200, deadline=None)
    @given(soup)
    def run(html):
        title, desc, canon = extract_page_meta(html)
        if title is not None:
            assert title == " ".join(title.split()) and title
        assert canon is None or canon

    run()


def test_incoming_anchor_texts_top_n_and_counts(spark):
    from gemini_ocr_batch_spark.operators.links import incoming_anchor_texts

    rows = []
    for i in range(5):
        rows.append((f"https://s/{i}", 0, "/t", "popular anchor"))
    rows.append(("https://s/9", 0, "/t", "rare anchor"))
    rows.append(("https://s/9", 1, "/t", "zz mid anchor"))
    rows.append(("https://s/9", 2, "/t", "zz mid anchor"))
    rows.append(("https://s/9", 3, "/other", "solo"))
    links = spark.createDataFrame(
        rows, "url string, link_no int, href string, anchor string"
    )
    got = {r["href"]: r for r in
           incoming_anchor_texts(links, top_n=2).collect()}
    t = got["/t"]
    assert t["n_refs"] == 8 and t["n_unique_anchors"] == 3
    # top-2 by count desc then text asc: popular(5), zz mid(2); rare cut
    assert t["top_anchors"] == "popular anchor|zz mid anchor"
    assert got["/other"]["top_anchors"] == "solo"


def test_domain_link_stats_survives_malformed_urls(spark):
    """ANSI parse_url throws on garbage; crawl hrefs contain garbage —
    the rollup must treat unparseable hosts as hostless, not crash
    (r6 review find, confirmed crash before the try_parse_url fix)."""
    rows = [
        ("https://a.example/1.html", 0, "/has space in href", "sp"),
        ("not a url at all", 0, "/x", "rel"),
        ("https://a.example/1.html", 1, "https://b.example/ok", "ok"),
    ]
    links = spark.createDataFrame(
        rows, "url string, link_no int, href string, anchor string"
    )
    got = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in domain_link_stats(links).collect()
    }
    assert got[("a.example", "b.example")] == 1
    # malformed page url: host falls back to the raw url string
    assert got[("not a url at all", "not a url at all")] == 1
    assert got[("a.example", "a.example")] == 1  # space-href = relative


def _py_pagerank(edges, iterations=10, damping=0.85):
    """Reference power iteration with identical semantics (weighted
    shares, uniform dangling redistribution)."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    rank = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            contrib[d] += rank[s] * (w / out_w[s])
        dangling = sum(r for v, r in rank.items() if v not in out_w)
        rank = {
            v: base + damping * (contrib[v] + dangling / n) for v in nodes
        }
    return rank


def test_domain_pagerank_matches_reference_power_iteration(spark):
    from gemini_ocr_batch_spark.operators.links import domain_pagerank

    edges = [
        ("a.example", "b.example", 3.0),
        ("b.example", "c.example", 1.0),
        ("c.example", "a.example", 1.0),
        ("a.example", "c.example", 1.0),
        ("d.example", "b.example", 2.0),   # d has no inlinks
        # e is dangling (no outlinks): only receives
        ("b.example", "e.example", 1.0),
    ]
    df = spark.createDataFrame(
        [(s, d, int(w)) for s, d, w in edges],
        "src_domain string, dst_domain string, n_links long",
    )
    got = {
        r["domain"]: r["rank"]
        for r in domain_pagerank(df, iterations=12).collect()
    }
    want = _py_pagerank(edges, iterations=12)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_domain_pagerank_self_loops_and_cycle(spark):
    from gemini_ocr_batch_spark.operators.links import domain_pagerank

    # pure 3-cycle (+ a self-loop that must be ignored): uniform ranks
    df = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1), ("a", "a", 99)],
        "src_domain string, dst_domain string, n_links long",
    )
    got = {r["domain"]: r["rank"]
           for r in domain_pagerank(df, iterations=8).collect()}
    for v in ("a", "b", "c"):
        assert abs(got[v] - 1.0 / 3) < 1e-9


def test_domain_pagerank_single_domain_corpus_survives(spark):
    # a corpus whose only edges are self-loops (one-domain crawl) keeps
    # the domain as a dangling node with total rank 1.0
    from gemini_ocr_batch_spark.operators.links import domain_pagerank

    df = spark.createDataFrame(
        [("only.example", "only.example", 50)],
        "src_domain string, dst_domain string, n_links long",
    )
    got = domain_pagerank(df, iterations=3).collect()
    assert len(got) == 1
    assert got[0]["domain"] == "only.example"
    assert abs(got[0]["rank"] - 1.0) < 1e-9
