"""robots.txt parsing + URL admission (operators/robots.py): RFC 9309
group semantics, agent selection, longest-prefix matching."""
from riskloc_spark.operators.robots import parse_robots, robots_verdicts


ROBOTS_A = """# site A
User-agent: *
Disallow: /private/
Allow: /private/public/

User-agent: evilbot
User-agent: badbot
Disallow: /

Crawl-delay: 3
Sitemap: https://a.com/sitemap.xml
"""

ROBOTS_B = """User-agent: goodbot
Disallow:
"""


def _rules(spark):
    df = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        "host string, body string",
    )
    return parse_robots(df)


def test_parse_robots_groups_and_stacked_agents(spark):
    rows = {
        (r["host"], r["agent"], r["rule_type"], r["path"])
        for r in _rules(spark).collect()
    }
    # group 1: '*' gets both rules
    assert ("a.com", "*", "disallow", "/private/") in rows
    assert ("a.com", "*", "allow", "/private/public/") in rows
    # group 2: BOTH stacked agents share the Disallow: / ... and the
    # crawl-delay directly after (same group: no rule line between)
    for agent in ("evilbot", "badbot"):
        assert ("a.com", agent, "disallow", "/") in rows
        assert ("a.com", agent, "crawl-delay", "3") in rows
    # '*' group must NOT get the second group's rules
    assert ("a.com", "*", "disallow", "/") not in rows
    # sitemap surfaces globally (group -1 semantics checked via type)
    assert ("a.com", "*", "sitemap", "https://a.com/sitemap.xml") in rows
    # empty Disallow parses but carries empty path
    assert ("b.com", "goodbot", "disallow", "") in rows


def test_robots_verdicts_longest_prefix_and_tie(spark):
    urls = spark.createDataFrame(
        [
            ("a.com", "/private/secret.html"),   # disallowed
            ("a.com", "/private/public/x.html"), # deeper Allow wins
            ("a.com", "/open/x.html"),           # no rule -> allowed
            ("b.com", "/anything"),              # empty Disallow -> allowed
            ("c.com", "/no/robots"),             # host without rules
        ],
        "host string, path string",
    )
    got = {
        (r["host"], r["path"]): r["allowed"]
        for r in robots_verdicts(_rules(spark), urls).collect()
    }
    assert got == {
        ("a.com", "/private/secret.html"): False,
        ("a.com", "/private/public/x.html"): True,
        ("a.com", "/open/x.html"): True,
        ("b.com", "/anything"): True,
        ("c.com", "/no/robots"): True,
    }


def test_robots_verdicts_agent_selection(spark):
    urls = spark.createDataFrame(
        [("a.com", "/private/secret.html"), ("a.com", "/open/x.html")],
        "host string, path string",
    )
    # evilbot has a specific group: Disallow / -> everything blocked,
    # and the '*' rules must NOT apply (no /private/public override)
    got = {
        r["path"]: r["allowed"]
        for r in robots_verdicts(
            _rules(spark), urls, agent="EvilBot"
        ).collect()
    }
    assert got == {"/private/secret.html": False, "/open/x.html": False}
    # goodbot has no group on a.com -> falls back to '*'
    got2 = {
        r["path"]: r["allowed"]
        for r in robots_verdicts(
            _rules(spark), urls, agent="goodbot"
        ).collect()
    }
    assert got2 == {"/private/secret.html": False, "/open/x.html": True}


def test_robots_tie_allow_beats_disallow(spark):
    body = "User-agent: *\nDisallow: /x/\nAllow: /x/\n"
    rules = parse_robots(
        spark.createDataFrame([("t.com", body)], "host string, body string")
    )
    urls = spark.createDataFrame(
        [("t.com", "/x/page")], "host string, path string"
    )
    assert robots_verdicts(rules, urls).collect()[0]["allowed"] is True


ROBOTS_WILD = """User-agent: *
Disallow: /*.pdf$
Disallow: /tmp/*/doc-
Disallow: /dl/*
Allow: /dl/ok/
Disallow: /lit$eral/
"""


def _wild_verdicts(spark, paths):
    rules = parse_robots(
        spark.createDataFrame(
            [("w.com", ROBOTS_WILD)], "host string, body string"
        )
    )
    urls = spark.createDataFrame(
        [("w.com", p) for p in paths], "host string, path string"
    )
    return {
        r["path"]: r["allowed"]
        for r in robots_verdicts(rules, urls).collect()
    }


def test_robots_wildcard_star_and_dollar(spark):
    """RFC 9309 §2.2.3: '*' matches any run, trailing '$' anchors the
    end, '$' elsewhere is literal; regex metachars in rule paths stay
    literal (the '.' in '.pdf' must not match 'xpdf')."""
    got = _wild_verdicts(
        spark,
        [
            "/cache/a.pdf",        # /*.pdf$ -> blocked
            "/cache/a.pdfx",       # $ anchored: not an end match
            "/cache/axpdf",        # '.' is literal, not regex-any
            "/tmp/sub/doc-1",      # interior '*' spans 'sub' -> blocked
            "/tmp/doc-1",          # both literal '/'s required: the
                                   # pattern needs /tmp/<run>/doc- and
                                   # this path has no second '/'
            "/dl/ok/file",         # Allow /dl/ok/ (len 7) beats
                                   # Disallow /dl/* (len 6)
            "/dl/other/file",      # /dl/* blocked
            "/lit$eral/x",         # interior '$' literal -> blocked
            "/liteeral/x",         # and NOT a regex anchor mess
        ],
    )
    assert got == {
        "/cache/a.pdf": False,
        "/cache/a.pdfx": True,
        "/cache/axpdf": True,
        "/tmp/sub/doc-1": False,
        "/tmp/doc-1": True,
        "/dl/ok/file": True,
        "/dl/other/file": False,
        "/lit$eral/x": False,
        "/liteeral/x": True,
    }


def test_robots_empty_group_suppresses_star_fallback(spark):
    """A group naming an agent with NO allow/disallow rules (bare
    marker group, or crawl-delay-only) still counts as 'host has a
    specific group': the '*' restrictions must NOT apply (RFC 9309 —
    a bare 'User-agent: foo' group means foo may fetch everything)."""
    body = (
        "User-agent: *\nDisallow: /private/\n\n"
        "User-agent: quietbot\nCrawl-delay: 7\n\n"
        "User-agent: freebot\n"
    )
    rules = parse_robots(
        spark.createDataFrame([("e.com", body)], "host string, body string")
    )
    # the bare group surfaces as a marker row
    rows = {
        (r["agent"], r["rule_type"], r["path"])
        for r in rules.collect()
    }
    assert ("freebot", "agent", "") in rows
    urls = spark.createDataFrame(
        [("e.com", "/private/x")], "host string, path string"
    )
    for agent in ("quietbot", "freebot"):
        got = robots_verdicts(rules, urls, agent=agent).collect()
        assert got[0]["allowed"] is True, agent
    # and '*' itself still blocks
    assert (
        robots_verdicts(rules, urls).collect()[0]["allowed"] is False
    )


def test_robots_broadcast_probe_and_shuffle_fallback(spark):
    """The rules-side join regime is probed, not hinted
    unconditionally: under the host budget the plan broadcasts the
    rules table; past it (limit=0) the hint is dropped and the join
    shuffles on host instead of force-broadcasting."""
    rules = parse_robots(
        spark.createDataFrame(
            [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
            "host string, body string",
        )
    )
    urls = spark.createDataFrame(
        [("a.com", "/private/x"), ("b.com", "/y")],
        "host string, path string",
    )
    fast = robots_verdicts(rules, urls)
    plan_fast = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_fast, plan_fast
    wide = robots_verdicts(rules, urls, broadcast_hosts_limit=0)
    plan_wide = wide._jdf.queryExecution().executedPlan().toString()
    # the URL-side admission join must not be a broadcast join in the
    # fallback regime (the small agent-selection joins upstream of the
    # rules aggregation may still broadcast — they are rules-sized)
    # decisive check: verdicts identical across regimes
    assert sorted(
        (r["host"], r["path"], r["allowed"]) for r in fast.collect()
    ) == sorted(
        (r["host"], r["path"], r["allowed"]) for r in wide.collect()
    )
    assert (
        "SortMergeJoin" in plan_wide or "ShuffledHashJoin" in plan_wide
    ), plan_wide
