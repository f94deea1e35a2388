"""robots.txt kernel + retroactive robots_filter (r6)."""

from __future__ import annotations

from gemini_ocr_batch_spark.kernels.robots import parse_robots, robots_allows

SAMPLE = """
# crawl policy
User-agent: megabot
Disallow: /private/

User-agent: *
Disallow: /tmp/
Allow: /tmp/public/
Disallow: /logs
"""


def test_parse_robots_groups_and_order():
    star = parse_robots(SAMPLE, agent="*")
    assert star == [("/tmp/", False), ("/tmp/public/", True),
                    ("/logs", False)]
    mega = parse_robots(SAMPLE, agent="megabot/2.1")
    assert mega == [("/private/", False)]
    assert parse_robots("", agent="*") == []
    assert parse_robots("garbage\n\x00:::\n", agent="*") == []


def test_robots_allows_first_match_semantics():
    rules = parse_robots(SAMPLE, agent="*")
    assert robots_allows(rules, "/index.html") is True
    assert robots_allows(rules, "/tmp/x") is False
    # stdlib semantics: FIRST match in file order decides, so the later
    # Allow: /tmp/public/ never fires behind Disallow: /tmp/
    assert robots_allows(rules, "/tmp/public/ok") is False
    assert robots_allows(rules, "/logs/app.log") is False
    # empty Disallow allows everything
    assert robots_allows(parse_robots("User-agent: *\nDisallow:"), "/x")


def test_robots_twin_fuzz_vs_stdlib():
    """On the shared subset (plain ascii path prefixes, no wildcards, no
    %-escapes, agent '*'), parse+match must agree with
    urllib.robotparser.can_fetch."""
    import urllib.robotparser

    from hypothesis import given, settings
    from hypothesis import strategies as st

    seg = st.sampled_from(["a", "bb", "c1", "dir", "x"])
    path = st.lists(seg, min_size=0, max_size=3).map(
        lambda p: "/" + "/".join(p)
    )
    rule = st.tuples(st.sampled_from(["Disallow", "Allow"]), path)
    robots_file = st.lists(rule, min_size=0, max_size=6).map(
        lambda rs: "User-agent: *\n"
        + "\n".join(f"{f}: {p}" for f, p in rs)
    )

    @settings(max_examples=300, deadline=None)
    @given(robots_file, path)
    def run(txt, p):
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(txt.splitlines())
        want = rp.can_fetch("*", f"https://h.example{p}")
        got = robots_allows(parse_robots(txt), p)
        assert got == want, (txt, p)

    run()


def test_robots_filter_spark(spark):
    from gemini_ocr_batch_spark.operators.blocklist import robots_filter

    pages = spark.createDataFrame(
        [
            ("https://a.example/tmp/x", "p0"),
            ("https://a.example/ok/page", "p1"),
            ("https://a.example/logs", "p2"),
            ("https://b.example/tmp/x", "p3"),   # no robots row: kept
            ("not a url", "p4"),                 # unparseable: kept
        ],
        "url string, text string",
    )
    robots = spark.createDataFrame(
        [("a.example", SAMPLE)], "domain string, robots_txt string"
    )
    kept = sorted(
        r["text"] for r in robots_filter(pages, robots).collect()
    )
    assert kept == ["p1", "p3", "p4"]
    # schema passthrough
    assert robots_filter(pages, robots).columns == ["url", "text"]


def test_robots_filter_spark_agrees_with_python_twin(spark):
    """Matrix of paths × one rules file: the Spark in-array matcher and
    the python twin decide identically."""
    from gemini_ocr_batch_spark.operators.blocklist import robots_filter

    paths = ["/", "/tmp/", "/tmp/a", "/tmp/public/b", "/logs", "/logs2",
             "/deep/tmp/x", "/private/", "/a/b/c"]
    pages = spark.createDataFrame(
        [(f"https://h.example{p}", p) for p in paths],
        "url string, p string",
    )
    robots = spark.createDataFrame(
        [("h.example", SAMPLE)], "domain string, robots_txt string"
    )
    got = {r["p"] for r in robots_filter(pages, robots).collect()}
    rules = parse_robots(SAMPLE)
    want = {p for p in paths if robots_allows(rules, p)}
    assert got == want


def test_robots_filter_plan_broadcast_no_page_shuffle(spark):
    from gemini_ocr_batch_spark.operators.blocklist import robots_filter

    pages = spark.createDataFrame(
        [("https://a.example/x", "t")], "url string, text string"
    )
    robots = spark.createDataFrame(
        [("a.example", SAMPLE)], "domain string, robots_txt string"
    )
    from gemini_ocr_batch_spark.plans import formatted_plan

    df = robots_filter(pages, robots)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the per-domain capture-resolution aggregate shuffles the SMALL
    # robots side only; no exchange may carry the pages' text column
    fp = formatted_plan(df)
    for s in fp.split("\n\n"):
        if s.lstrip().startswith("(") and ") Exchange" in s.splitlines()[0]:
            input_line = next(
                l for l in s.splitlines() if l.startswith("Input")
            )
            assert "text#" not in input_line, s


def test_apply_input_filters_robots_integration(spark, tmp_path):
    from gemini_ocr_batch_spark.config import FiltersConfig, load_config
    from gemini_ocr_batch_spark.job import apply_input_filters

    robots = spark.createDataFrame(
        [("a.example", SAMPLE)], "domain string, robots_txt string"
    )
    rpath = str(tmp_path / "robots")
    robots.write.parquet(rpath)
    pages = spark.createDataFrame(
        [
            ("https://a.example/tmp/x", "blocked"),
            ("https://a.example/fine", "kept"),
        ],
        "url string, text string",
    )
    kept = apply_input_filters(
        pages, FiltersConfig(robots_path=rpath)
    ).collect()
    assert [r["text"] for r in kept] == ["kept"]

    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        "paths:\n  pages: /p\n  out: /o\n"
        f"filters:\n  robots_path: {rpath}\n"
    )
    assert load_config(str(cfg_file)).filters.robots_path == rpath


def test_robots_filter_duplicate_captures_do_not_multiply_pages(spark):
    """An archive holds many captures per domain; the build side must
    resolve to one row per domain or the join fans pages out (r6 review
    find)."""
    from gemini_ocr_batch_spark.operators.blocklist import robots_filter

    pages = spark.createDataFrame(
        [("https://a.example/ok", "p0"), ("https://a.example/tmp/x", "p1")],
        "url string, text string",
    )
    robots = spark.createDataFrame(
        [("a.example", SAMPLE), ("a.example", SAMPLE),
         ("a.example", "User-agent: *\nDisallow: /tmp/")],
        "domain string, robots_txt string",
    )
    got = robots_filter(pages, robots).collect()
    assert [r["text"] for r in got] == ["p0"]  # exactly once, no fanout
