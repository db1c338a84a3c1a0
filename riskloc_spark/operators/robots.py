"""robots.txt parsing and URL admission for crawl pipelines.

The politeness step of crawl ingestion (the one crawl-side operator
the WARC/HTML/URL suite did not yet cover): parse the Robots Exclusion
Protocol files a crawl fetched, and decide per URL whether a given
agent may fetch it.  Semantics follow RFC 9309 / the Google REP
implementation, reduced to the deterministic core:

* groups = consecutive ``User-agent`` lines followed by their rules,
  until a ``User-agent`` line that follows a rule line starts the next
  group; every agent named in a group's header shares all its rules.
* agent selection per host: the rules of groups naming the target
  agent EXACTLY (case-insensitive); if the host has none, the ``*``
  groups.  Never both.
* rule matching per URL: longest-path-prefix rule wins; on a length
  tie ``Allow`` beats ``Disallow``; no matching rule means allowed.
  Empty rule paths ("Disallow:" = disallow nothing) never match.

Stated seams (documented non-goals, html.py discipline): ``*`` and
``$`` wildcards inside rule paths are matched LITERALLY (RFC 9309
optional feature); ``Crawl-delay`` and ``Sitemap`` lines are parsed
and returned but take no part in admission; byte-level %-decoding
equivalence is not attempted.

Scale shapes: parsing is a posexplode + two windows PARTITIONED BY
the robots file's host — per-host files are KBs, so the window never
sees more than one small file's lines per key, and the parse output
(the rules table) is millions of rows for a billion-page crawl, tiny
next to the URL table.  Admission pre-groups the (agent-filtered)
rules per host, broadcasts that array table, and folds the
longest-prefix match IN-ROW on the URL side — the URL scan is the
only corpus-volume pass, with no shuffle, grouping, or transient row
keys (for rules tables past the broadcast budget, the same join
shuffles on host).

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# directive: value   (comments and surrounding whitespace removed
# upstream; explicit classes parse identically in Java and RE2)
_DIRECTIVE_RE = r"^([A-Za-z-]+)[ \t]*:[ \t]*(.*)$"


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, robots.txt body) -> one row per (host, group_id, agent,
    rule_type, path): the flattened rules table.  ``rule_type`` is
    'allow' or 'disallow'; crawl-delay and sitemap lines surface as
    rule_type 'crawl-delay' / 'sitemap' with the value in ``path``
    (attached to the group for delay, group -1 for sitemap, which is
    global per RFC 9309).

    Group boundaries per the RFC: a user-agent line FOLLOWING a rule
    line starts a new group; consecutive user-agent lines stack onto
    the same group.  Lines that parse as no known directive, comment
    lines, and blank lines are dropped (blank lines do NOT delimit
    groups in RFC 9309).  The agent x rule flattening is a per-(host,
    group) self-join: group headers are a handful of agents, so the
    fan-out is bounded."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\r?\n")).alias(
            "pos", "__raw"
        ),
    )
    cleaned = lines.withColumn(
        "__line",
        F.trim(F.regexp_replace(F.col("__raw"), r"#.*$", "")),
    ).filter(F.col("__line") != "")
    parsed = cleaned.select(
        "host",
        "pos",
        F.lower(
            F.regexp_extract(F.col("__line"), _DIRECTIVE_RE, 1)
        ).alias("directive"),
        F.trim(
            F.regexp_extract(F.col("__line"), _DIRECTIVE_RE, 2)
        ).alias("value"),
    ).filter(
        F.col("directive").isin(
            "user-agent", "allow", "disallow", "crawl-delay", "sitemap"
        )
    )
    w = Window.partitionBy("host").orderBy("pos")
    grouped = parsed.withColumns(
        {
            "__is_ua": (F.col("directive") == "user-agent").cast("int"),
            "__prev_ua": F.lag(
                (F.col("directive") == "user-agent").cast("int"), 1, 0
            ).over(w),
        }
    ).withColumn(
        "group_id",
        F.sum(
            ((F.col("__is_ua") == 1) & (F.col("__prev_ua") == 0)).cast(
                "int"
            )
        ).over(w),
    )
    agents = grouped.filter(F.col("directive") == "user-agent").select(
        "host",
        "group_id",
        F.lower(F.col("value")).alias("agent"),
    )
    rules = grouped.filter(
        F.col("directive").isin("allow", "disallow", "crawl-delay")
    ).select(
        "host",
        "group_id",
        F.col("directive").alias("rule_type"),
        F.col("value").alias("path"),
    )
    flat = agents.join(rules, ["host", "group_id"]).select(
        "host", "group_id", "agent", "rule_type", "path"
    )
    sitemaps = grouped.filter(F.col("directive") == "sitemap").select(
        "host",
        F.lit(-1).alias("group_id"),
        F.lit("*").alias("agent"),
        F.lit("sitemap").alias("rule_type"),
        F.col("value").alias("path"),
    )
    return flat.unionAll(sitemaps)


def robots_verdicts(
    rules: DataFrame,
    urls: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """(parse_robots output, URLs as (host, path)) -> the URL frame
    plus ``allowed`` — the admission decision for ``agent``.

    Selection and matching per the module header: exact-agent groups
    if the host has any, else the ``*`` groups; longest-prefix rule
    wins, Allow beats Disallow on ties, no match (or no rules for the
    host at all) = allowed.  One broadcast join on host plus an
    in-row fold — see the inline note for why the URL side is never
    shuffled and why the fold is order-independent."""
    a = agent.lower()
    ar = rules.filter(F.col("rule_type").isin("allow", "disallow"))
    has_specific = (
        ar.filter(F.col("agent") == a)
        .select(F.col("host").alias("__h"))
        .distinct()
    )
    if a == "*":
        chosen = ar.filter(F.col("agent") == "*")
    else:
        specific = ar.join(
            has_specific, ar["host"] == has_specific["__h"]
        ).filter(F.col("agent") == a)
        fallback = ar.join(
            has_specific,
            ar["host"] == has_specific["__h"],
            "left_anti",
        ).filter(F.col("agent") == "*")
        chosen = specific.drop("__h").unionAll(fallback)
    chosen = chosen.filter(F.length("path") > 0).select(
        F.col("host").alias("__rhost"),
        F.col("rule_type").alias("__rtype"),
        F.col("path").alias("__rpath"),
    )
    # the corpus-scale shape: rules PRE-GROUPED per host into an array
    # and broadcast (hosts x a handful of rules — bounded), then the
    # longest-match reduction runs IN-ROW over that array — the URL
    # side is never shuffled, never grouped, never keyed by a
    # transient id (monotonically_increasing_id would be
    # retry-nondeterministic).  The fold is order-independent: a
    # strictly longer match always replaces, an equal-length match
    # replaces only when it is an Allow — every arrival order of the
    # collect_list lands on the same (l, al), so the plan is
    # deterministic despite the unordered array.  (A higher-order fold
    # is interpreter-slow per element — the winnow experiment — but
    # the array here is one host's rules, tens of entries, against
    # the alternative of a corpus-volume shuffle.)
    host_rules = chosen.groupBy("__rhost").agg(
        F.collect_list(
            F.struct(
                F.col("__rpath").alias("p"),
                (F.col("__rtype") == "allow").alias("al"),
            )
        ).alias("__rules")
    )
    out = urls.join(
        F.broadcast(host_rules),
        F.col(host_col) == F.col("__rhost"),
        "left_outer",
    )
    path = F.col(path_col)
    best = F.aggregate(
        F.coalesce(F.col("__rules"), F.array()),
        F.struct(
            F.lit(-1).alias("l"), F.lit(True).alias("al")
        ),
        lambda acc, r: F.when(
            (path.substr(F.lit(1), F.length(r["p"])) == r["p"])
            & (
                (F.length(r["p"]) > acc["l"])
                | ((F.length(r["p"]) == acc["l"]) & r["al"])
            ),
            F.struct(
                F.length(r["p"]).alias("l"), r["al"].alias("al")
            ),
        ).otherwise(acc),
    )
    return (
        out.withColumn("__best", best)
        .withColumn("allowed", F.col("__best.al"))
        .drop("__rhost", "__rules", "__best")
    )
