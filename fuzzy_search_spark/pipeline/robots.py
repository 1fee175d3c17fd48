"""robots.txt interpretation (RFC 9309): distributed parse + URL admission.

A crawl-derived corpus must honor (or at least record) robots exclusion:
pages fetched from paths a host disallows are both a compliance and a
quality liability.  This module evaluates robots rules over the page table
entirely JVM-side:

* ``parse_robots`` — robots.txt text -> one row per (host, agent, rule).
  Line handling follows RFC 9309 §2.2: ``#`` comments stripped, fields
  case-insensitive, a rule belongs to the nearest preceding *contiguous
  run* of ``User-agent`` lines (a group may name several agents), empty
  ``Disallow:`` values are no-ops.  The implementation is pure column
  algebra: split -> posexplode -> per-host window to assign group ids —
  robots files are tiny, so the per-host window state is bounded by the
  file's line count, never by corpus size.
* ``robots_allowed`` — admission per (url, agent): the most specific
  group wins (exact agent-token match if the host has one, else the
  ``*`` group — RFC 9309 §2.2.1: the generic group is IGNORED when a
  specific one exists); among matching rules the LONGEST path pattern
  wins, ``Allow`` beating ``Disallow`` on ties (§2.2.2); no matching
  rule (or no robots.txt for the host) means allowed.  ``*`` wildcards
  and the ``$`` end anchor are supported by compiling each rule to a SQL
  LIKE pattern once, host-locally.

Scale shape: rules tables are per-host and small (one robots.txt each);
the admission join shuffles urls once on host, then ranks matches with a
per-url window whose partition size is bounded by that host's rule count.
The reference library has no crawl layer (builder-brief scope).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def parse_robots(df: DataFrame, host_col: str = "host",
                 robots_col: str = "robots_txt") -> DataFrame:
    """Parse robots.txt bodies into ``(host, agent, rule, path, pattern,
    path_len)`` rows — one row per (agent in group) x (rule in group)."""
    line = F.trim(F.regexp_replace(F.col("line"), r"#.*$", ""))
    field = F.lower(F.regexp_extract(line, r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract(line, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))

    lines = (df.select(F.col(host_col).alias("host"),
                       F.posexplode(F.split(F.col(robots_col), r"\r?\n"))
                       .alias("pos", "line"))
             .select("host", "pos", field.alias("field"),
                     value.alias("value"))
             .filter(F.col("field").isin("user-agent", "allow",
                                         "disallow")))

    w = Window.partitionBy("host").orderBy("pos")
    is_agent = F.col("field") == "user-agent"
    prev_field = F.lag("field").over(w)
    group_start = (is_agent &
                   (prev_field.isNull() | (prev_field != "user-agent")))
    grouped = lines.withColumn(
        "grp",
        F.sum(group_start.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))

    agents = (grouped.filter(is_agent)
              .select("host", "grp", F.lower("value").alias("agent"))
              .distinct())
    rules = (grouped.filter(~is_agent & (F.col("value") != ""))
             .select("host", "grp", F.col("field").alias("rule"),
                     F.col("value").alias("path")))
    # compile each rule to a LIKE pattern: escape metacharacters,
    # * -> %, trailing $ anchors the end (otherwise prefix -> append %)
    out = (rules.join(agents, ["host", "grp"])
           .withColumn("esc_pat",
                       F.regexp_replace(F.col("path"), r"([%_\\])",
                                        r"\\$1")))
    anchored = F.col("esc_pat").endswith("$")
    body = F.when(anchored,
                  F.expr("substring(esc_pat, 1, length(esc_pat) - 1)")
                  ).otherwise(F.col("esc_pat"))
    pat = F.replace(body, F.lit("*"), F.lit("%"))
    pat = F.when(anchored, pat).otherwise(F.concat(pat, F.lit("%")))
    return out.select(
        "host", "agent", "rule", "path", pat.alias("pattern"),
        F.length("path").alias("path_len"))


def robots_allowed(urls: DataFrame, rules: DataFrame, agent: str = "*",
                   url_col: str = "url") -> DataFrame:
    """Admission decision per url for one agent token:
    ``(url, allowed, matched_rule, matched_path)``."""
    agent_lc = agent.lower()
    host_has_specific = (rules.filter(F.col("agent") == agent_lc)
                         .select("host").distinct()
                         .withColumn("has_specific", F.lit(True)))
    effective = (rules.join(host_has_specific, "host", "left")
                 .filter(((F.col("has_specific").isNotNull()) &
                          (F.col("agent") == agent_lc)) |
                         (F.col("has_specific").isNull() &
                          (F.col("agent") == "*")))
                 .withColumnRenamed("path", "rule_path"))

    u = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(F.col(url_col), _HOST_RE, 1).alias("host"),
        F.regexp_extract(F.col(url_col), _PATH_RE, 1).alias("path"))
    u = u.withColumn("path",
                     F.when(F.col("path") == "", "/")
                     .otherwise(F.col("path")))

    cand = (u.join(effective, "host", "left")
            .withColumn("hit",
                        F.col("pattern").isNotNull() &
                        F.expr(r"path like pattern escape '\\'")))
    w = Window.partitionBy("url").orderBy(
        F.col("hit").desc(),
        F.col("path_len").desc(),
        (F.col("rule") == "allow").desc())
    best = (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    return best.select(
        "url",
        F.when(F.col("hit").isNull() | ~F.col("hit"), F.lit(True))
        .otherwise(F.col("rule") == "allow").alias("allowed"),
        F.when(F.col("hit"), F.col("rule")).otherwise(F.lit(None))
        .alias("matched_rule"),
        F.when(F.col("hit"), F.col("rule_path")).otherwise(F.lit(None))
        .alias("matched_path"))
