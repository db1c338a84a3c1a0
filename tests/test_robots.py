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
