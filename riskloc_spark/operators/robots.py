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
* rule matching per URL: the most specific matching rule wins —
  specificity is the rule path's pattern length; on a length tie
  ``Allow`` beats ``Disallow``; no matching rule means allowed.
  Empty rule paths ("Disallow:" = disallow nothing) never match.
* RFC 9309 §2.2.3 special characters: ``*`` in a rule path matches
  any run of characters and a TRAILING ``$`` anchors the end of the
  URL path (a ``$`` anywhere else is literal, matching the Google
  REP matcher).  Wildcard-free rules keep the fast prefix compare;
  wildcard rules compile once (on the tiny rules table) to an
  anchored Java regex evaluated per candidate rule in-row.

Stated seams (documented non-goals, html.py discipline):
``Crawl-delay`` and ``Sitemap`` lines are parsed and returned but
take no part in admission; byte-level %-decoding equivalence is not
attempted; specificity counts characters, not octets (identical for
the ASCII rule paths robots files overwhelmingly use).

Scale shapes: parsing is a posexplode + two windows PARTITIONED BY
the robots file's host — per-host files are KBs, so the window never
sees more than one small file's lines per key, and the parse output
(the rules table) is millions of rows for a billion-page crawl, tiny
next to the URL table.  Admission pre-groups the (agent-filtered)
rules per host and folds the longest-match reduction IN-ROW on the
URL side — the URL scan is the only corpus-volume pass.  The
per-host rules table's size is PROBED, not assumed: up to
``broadcast_hosts_limit`` distinct hosts it broadcasts (URL side
never shuffled); past the budget (a 100M-host crawl whose rules
table would OOM the driver under a forced hint) the same join
shuffles on host instead — the trigram-LM discipline from
functions/text.py.

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from riskloc_spark.operators.dedup import reuse_checkpoint

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
    fan-out is bounded.  A group with NO rule lines at all (a bare
    ``User-agent: foo`` meaning "foo may fetch everything") still
    surfaces as one marker row per agent with rule_type ``agent`` and
    an empty path, so agent selection downstream can see that the
    group exists and suppress the ``*`` fallback."""
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
    flat = agents.join(rules, ["host", "group_id"], "left_outer").select(
        "host",
        "group_id",
        "agent",
        F.coalesce(F.col("rule_type"), F.lit("agent")).alias("rule_type"),
        F.coalesce(F.col("path"), F.lit("")).alias("path"),
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
    broadcast_hosts_limit: int = 2_000_000,
) -> DataFrame:
    """(parse_robots output, URLs as (host, path)) -> the URL frame
    plus ``allowed`` — the admission decision for ``agent``.

    Selection and matching per the module header: exact-agent groups
    if the host has ANY group naming the agent (even a rule-less one —
    a bare ``User-agent: foo`` group means foo may fetch everything,
    so the ``*`` restrictions must NOT apply), else the ``*`` groups;
    most-specific (longest-pattern) rule wins, Allow beats Disallow on
    ties, no match (or no rules for the host at all) = allowed.
    RFC 9309 §2.2.3 ``*`` / trailing ``$`` wildcards are honored —
    wildcard rules are compiled to anchored regexes ONCE on the tiny
    rules table; wildcard-free rules keep the prefix compare.

    One join on host plus an in-row fold.  The join side is chosen by
    a PROBE of the distinct-host count (one cheap job over the rules
    table, which is KBs-to-GBs against a corpus-volume URL table): at
    or under ``broadcast_hosts_limit`` hosts the rules array table is
    broadcast and the URL side is never shuffled; past it the hint is
    dropped and the join shuffles both sides on host — an explicit
    broadcast hint would override ``autoBroadcastJoinThreshold`` and
    OOM the driver on a 100M-host crawl."""
    a = agent.lower()
    groups = rules.filter(F.col("rule_type") != "sitemap")
    ar = groups.filter(F.col("rule_type").isin("allow", "disallow"))
    if a == "*":
        chosen = ar.filter(F.col("agent") == "*")
    else:
        # a host "has" the agent when ANY group names it — including
        # crawl-delay-only and bare marker groups, which carry no
        # allow/disallow rows but still suppress the '*' fallback
        has_specific = (
            groups.filter(F.col("agent") == a)
            .select(F.col("host").alias("__h"))
            .distinct()
        )
        specific = (
            ar.join(has_specific, ar["host"] == has_specific["__h"])
            .filter(F.col("agent") == a)
            .drop("__h")
        )
        fallback = ar.join(
            has_specific,
            ar["host"] == has_specific["__h"],
            "left_anti",
        ).filter(F.col("agent") == "*")
        chosen = specific.unionAll(fallback)
    chosen = chosen.filter(F.length("path") > 0).select(
        F.col("host").alias("__rhost"),
        (F.col("rule_type") == "allow").alias("__al"),
        F.col("path").alias("__rpath"),
    )
    # RFC 9309 §2.2.3 compile, run ONCE per rule on the tiny rules
    # table: escape Java-regex metacharacters (except '*'), turn '*'
    # into '.*', turn a TRAILING '$' (now escaped) back into the end
    # anchor, and anchor the whole pattern at the start.  '$' anywhere
    # but the end stays literal (Google REP behavior).
    esc = F.regexp_replace(
        F.col("__rpath"), r"[.\[\]{}()^$|?+\\]", r"\\$0"
    )
    rx = F.regexp_replace(esc, r"\*", ".*")
    rx = F.regexp_replace(rx, r"\\\$$", r"\$")
    wild = F.col("__rpath").contains("*") | F.col("__rpath").endswith(
        "$"
    )
    compiled = chosen.select(
        "__rhost",
        F.struct(
            F.col("__rpath").alias("p"),
            F.col("__al").alias("al"),
            wild.alias("w"),
            F.when(wild, F.concat(F.lit("^"), rx)).alias("rx"),
        ).alias("__r"),
    )
    # the corpus-scale shape: rules PRE-GROUPED per host into an array
    # (hosts x a handful of rules — bounded), then the longest-match
    # reduction runs IN-ROW over that array — the URL side is never
    # grouped or keyed by a transient id (monotonically_increasing_id
    # would be retry-nondeterministic).  The fold is
    # order-independent: a strictly longer match always replaces, an
    # equal-length match replaces only when it is an Allow — every
    # arrival order of the collect_list lands on the same (l, al), so
    # the plan is deterministic despite the unordered array.  (A
    # higher-order fold is interpreter-slow per element — the winnow
    # experiment — but the array here is one host's rules, tens of
    # entries, against the alternative of an unconditional
    # corpus-volume shuffle.)
    # checkpointed: host_rules feeds BOTH the size probe below and the
    # admission join — without it the whole parse pipeline (posexplode
    # + two windows + agent-selection joins) executes twice per call
    # (once for the eager count, once under the join), and a caller
    # unioning several agent walks pays it once per branch (the
    # r14 bench's robots_agent_groups carried 126 Exchanges).  The
    # probe also counts the GROUPED table now — one row per host with
    # >= 1 allow/disallow rule, the same cardinality the distinct-host
    # count measured, but over the materialized KB-sized frame.
    host_rules = reuse_checkpoint(
        compiled.groupBy("__rhost").agg(
            F.collect_list("__r").alias("__rules")
        )
    )
    n_hosts = host_rules.count()
    rules_side = (
        F.broadcast(host_rules)
        if n_hosts <= broadcast_hosts_limit
        else host_rules
    )
    out = urls.join(
        rules_side, F.col(host_col) == F.col("__rhost"), "left_outer"
    )
    path = F.col(path_col)

    def _hit(r):
        return F.when(
            r["w"], F.regexp_like(path, r["rx"])
        ).otherwise(
            path.substr(F.lit(1), F.length(r["p"])) == r["p"]
        )

    best = F.aggregate(
        F.coalesce(F.col("__rules"), F.array()),
        F.struct(
            F.lit(-1).alias("l"), F.lit(True).alias("al")
        ),
        lambda acc, r: F.when(
            _hit(r)
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
