"""robots.txt parsing and URL admission (RFC 9309) — the crawl-side
filter a web-corpus pipeline applies before a page may enter the
training set at all. Together with URL canonicalization (the dedup
key), the WARC/WAT/WET readers, HTML→text, and the near-dup engine,
this completes the public-web ingestion story.

Everything here is **pure JVM expressions** — line split + posexplode,
regexp field extraction, a window-sum group assignment, and the
longest-match ranking — so parsing a robots corpus and admitting a
100 TB URL list are both whole-stage-codegen plans with ONE broadcast
join (robots tables are tiny next to URL corpora: one small row set
per host).

Semantics implemented (RFC 9309):

* **groups** — consecutive ``User-agent:`` lines share the rule block
  that follows; a new group starts at a UA line whose previous
  significant line is not a UA line (§2.1). Comments (``#``) and
  blank/other lines are ignored; field names are case-insensitive.
* **agent selection** — a crawler uses the union of groups whose
  product token is a case-insensitive EXACT match; only if none
  exists do the ``*`` groups apply (§2.2.1).
* **rule matching** — ``Allow``/``Disallow`` values are path prefixes
  with ``*`` (any substring) and a trailing ``$`` (end anchor)
  (§2.2.2-2.2.3); an empty pattern matches nothing. The most specific
  (longest-pattern) match wins; at equal length Allow wins (§2.2.2).
  A URL nothing matches is allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: regex-metacharacter class escaped during pattern→regex translation
#: (everything special EXCEPT ``*``, which becomes ``.*``; the
#: trailing ``$`` anchor is split off before escaping). Engine seam:
#: Spark SQL string literals process backslash escapes (so every
#: backslash doubles) while DuckDB literals do not — the same
#: TOKENS_SPARK/TOKENS_DUCK split as text.py. Replacements differ
#: too: Java backrefs are ``$1`` (a literal backslash is ``\\``),
#: RE2's are ``\1``.
_ESC_CLASS_SPARK = r"([.\\\\+?\\[\\]()^{}|$])"
_ESC_CLASS_DUCK = r"([.\\+?\[\]()^{}|$])"
_ESC_REPL_SPARK = r"\\\\$1"
_ESC_REPL_DUCK = r"\\\1"


def _pattern_rx(pattern_col: str, *, duck: bool) -> str:
    """SQL expression translating a robots path pattern (in column
    ``pattern_col``) to an anchored regex: trailing ``$`` → end
    anchor, ``*`` → ``.*``, everything else literal."""
    p = pattern_col
    ends = f"({p} LIKE '%$')"
    body = f"CASE WHEN {ends} THEN substring({p}, 1, length({p}) - 1) ELSE {p} END"
    if duck:
        esc = (
            f"regexp_replace({body}, '{_ESC_CLASS_DUCK}', "
            f"'{_ESC_REPL_DUCK}', 'g')"
        )
    else:
        esc = (
            f"regexp_replace({body}, '{_ESC_CLASS_SPARK}', "
            f"'{_ESC_REPL_SPARK}')"
        )
    return (
        f"'^' || replace({esc}, '*', '.*') || "
        f"CASE WHEN {ends} THEN '$' ELSE '' END"
    )


def robots_rules(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, agent, allow, pattern, plen, rx) — one row per
    (group-member agent × rule) parsed from per-host robots.txt
    bodies. All JVM: the group structure falls out of one window sum
    (a group starts at a UA line whose previous significant line is
    not UA), and the pattern→regex translation is string expressions,
    so the whole parse is one codegen stage + one small self-join on
    (host, grp)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "line"),
    )
    fields = lines.select(
        "host",
        "pos",
        F.expr("lower(regexp_extract(trim(regexp_replace(line, '#.*', '')), "
               "'^([A-Za-z-]+)\\\\s*:', 1))").alias("key"),
        F.expr("trim(regexp_extract(trim(regexp_replace(line, '#.*', '')), "
               "'^[A-Za-z-]+\\\\s*:(.*)$', 1))").alias("val"),
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("pos")
    grouped = fields.withColumn(
        "grp",
        F.sum(
            F.when(
                (F.col("key") == "user-agent")
                & ~F.coalesce(
                    F.lag(F.col("key") == "user-agent").over(w), F.lit(False)
                ),
                1,
            ).otherwise(0)
        ).over(w),
    )
    agents = grouped.filter(F.col("key") == "user-agent").select(
        "host", "grp", F.lower(F.col("val")).alias("agent")
    )
    rules = grouped.filter(
        (F.col("key") != "user-agent") & (F.col("val") != "")
    ).select(
        "host",
        "grp",
        (F.col("key") == "allow").alias("allow"),
        F.col("val").alias("pattern"),
    )
    return (
        rules.join(agents, ["host", "grp"])
        .select(
            "host",
            "agent",
            "allow",
            "pattern",
            F.length("pattern").cast("long").alias("plen"),
            F.expr(_pattern_rx("pattern", duck=False)).alias("rx"),
        )
    )


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap) — the ``Sitemap:`` directives of each robots
    body (r13): the sitemaps.org extension every major crawler honors
    and the usual SEED of the discovery loop (robots → sitemap →
    frontier). Group-INDEPENDENT per the protocol (a Sitemap line
    applies regardless of which User-agent group surrounds it), so
    the parse is one line explode + field extraction — no window, no
    join, pure codegen."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(txt_col), "\n")).alias("line"),
    )
    return lines.select(
        "host",
        F.expr(
            "trim(regexp_extract(trim(regexp_replace(line, '#.*', '')), "
            "'^[Ss][Ii][Tt][Ee][Mm][Aa][Pp]\\\\s*:(.*)$', 1))"
        ).alias("sitemap"),
    ).filter(F.col("sitemap") != "")


def robots_crawl_delay(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """(host, crawl_delay) — the ``Crawl-delay:`` politeness value the
    crawler named ``agent`` must honor per host (r13): the de-facto
    extension every large crawler schedules by. Group semantics follow
    RFC 9309 agent selection — the value comes from the exact-agent
    group(s) when ANY exist for the host (even an exact group WITHOUT
    a delay means no delay — the ``*`` groups don't apply), else from
    the ``*`` groups; multiple selected values take the MAX (the
    polite resolution). Hosts whose selected groups carry no delay are
    absent from the result (no-delay default). Same shape as the rules
    parse: one window-sum grouping + tiny-robots joins, broadcastable
    against a frontier table."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "line"),
    )
    fields = lines.select(
        "host",
        "pos",
        F.expr(
            "lower(regexp_extract(trim(regexp_replace(line, '#.*', '')), "
            "'^([A-Za-z-]+)\\\\s*:', 1))"
        ).alias("key"),
        F.expr(
            "trim(regexp_extract(trim(regexp_replace(line, '#.*', '')), "
            "'^[A-Za-z-]+\\\\s*:(.*)$', 1))"
        ).alias("val"),
    ).filter(
        # allow/disallow lines stay in the grouping pass: a UA line is
        # a group START only when the previous SIGNIFICANT line is not
        # UA, and rule lines are exactly what separates groups — drop
        # them and adjacent groups would merge (their delays with them)
        F.col("key").isin("user-agent", "crawl-delay", "allow", "disallow")
    )
    w = Window.partitionBy("host").orderBy("pos")
    grouped = fields.withColumn(
        "grp",
        F.sum(
            F.when(
                (F.col("key") == "user-agent")
                & ~F.coalesce(
                    F.lag(F.col("key") == "user-agent").over(w), F.lit(False)
                ),
                1,
            ).otherwise(0)
        ).over(w),
    )
    ua = grouped.filter(F.col("key") == "user-agent").select(
        "host", "grp", F.lower(F.col("val")).alias("ua")
    )
    delays = grouped.filter(
        (F.col("key") == "crawl-delay")
        & F.col("val").rlike("^[0-9]+([.][0-9]+)?$")
    ).select("host", "grp", F.col("val").cast("double").alias("delay"))
    exact_grps = ua.filter(F.col("ua") == agent.lower()).select("host", "grp")
    star_grps = ua.filter(F.col("ua") == "*").select("host", "grp")
    has_exact = exact_grps.select("host").distinct()
    exact_delay = delays.join(exact_grps, ["host", "grp"])
    star_delay = delays.join(star_grps, ["host", "grp"]).join(
        has_exact, "host", "left_anti"
    )
    return (
        exact_delay.unionByName(star_delay)
        .groupBy("host")
        .agg(F.max("delay").alias("crawl_delay"))
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    *,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """urls + (allowed, win_plen) — RFC 9309 admission for crawler
    ``agent``: exact-matching agent groups win over ``*`` groups,
    longest pattern wins, Allow wins length ties, no match → allowed
    (win_plen 0). ONE broadcast join of the URL corpus against the
    per-host rule set — the 100 TB-side plan (URLs stream map-side;
    the rule table is small by construction)."""
    a = agent.lower()
    exact = rules.filter(F.col("agent") == a)
    star = rules.filter(F.col("agent") == "*")
    hosts_exact = exact.select("host").distinct()
    chosen = exact.unionByName(
        star.join(hosts_exact, "host", "left_anti")
    ).select("host", "allow", "plen", "rx", "pattern")
    if host_col != "host":
        urls = urls.withColumnRenamed(host_col, "host")
    key = ["host", path_col]
    matched = urls.join(F.broadcast(chosen), "host").filter(
        F.expr(f"{path_col} rlike rx")
    )
    w = Window.partitionBy(*key).orderBy(
        F.col("plen").desc(), F.col("allow").desc(), F.col("pattern").asc()
    )
    winners = (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*key, F.col("allow").alias("_win_allow"), F.col("plen").alias("_win_plen"))
    )
    return urls.join(winners, key, "left").select(
        *[F.col(c) for c in urls.columns],
        F.coalesce("_win_allow", F.lit(True)).alias("allowed"),
        F.coalesce("_win_plen", F.lit(0)).cast("long").alias("win_plen"),
    )
