"""URL canonicalization + domain blocklist filtering (C1/C13 adjunct).

Every Common-Crawl curation pipeline dedups on CANONICAL urls before
content dedup — ``http://A/?utm=x`` and ``http://A/`` are the same
page. Normalization implemented entirely as JVM column expressions
(regexp_extract / regexp_replace / conditional concat — no Python in
the hot path):

- scheme and host lowercased;
- default ports stripped (``:80`` for http, ``:443`` for https; other
  ports kept);
- fragment dropped;
- tracking params removed (``utm_*``, ``fbclid``, ``gclid``), with
  separator cleanup and the ``?`` dropped when the query empties;
- empty path normalized to ``/``;
- strings that don't parse as absolute URLs pass through unchanged
  (never throw at 10^12 rows).

Blocklist filtering broadcasts the (small) domain list: a column
predicate for in-plan lists, a broadcast anti-join for a DataFrame
blocklist — the corpus side never shuffles either way.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared Java-regex/RE2 syntax (the t11 pattern) — no backreferences,
# so Spark and any RE2-based oracle agree exactly
SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
HOSTPORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
PATHQS_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"
HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)"
TRACKING_RE = "(^|&)(utm_[a-zA-Z0-9_]*|fbclid|gclid)=[^&]*"


def host_col(url: str = "url") -> Column:
    """Lowercased host (no port) of an absolute URL; '' if unparseable."""
    return F.lower(F.regexp_extract(F.col(url), HOST_RE, 1))


def canonical_url_col(url: str = "url") -> Column:
    u = F.col(url)
    scheme = F.lower(F.regexp_extract(u, SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, HOSTPORT_RE, 1))
    host = (
        F.when(
            (scheme == "http") & hostport.endswith(":80"),
            F.substring(hostport, F.lit(1), F.length(hostport) - 3),
        )
        .when(
            (scheme == "https") & hostport.endswith(":443"),
            F.substring(hostport, F.lit(1), F.length(hostport) - 4),
        )
        .otherwise(hostport)
    )
    path_qs = F.regexp_extract(u, PATHQS_RE, 1)
    path = F.regexp_extract(path_qs, "^([^?]*)", 1)
    query = F.regexp_extract(path_qs, r"\?(.*)$", 1)
    q = F.regexp_replace(F.regexp_replace(query, TRACKING_RE, ""), "^&+", "")
    return F.when(scheme == "", u).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(path == "", F.lit("/")).otherwise(path),
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )


def is_blocked_col(host: Column, domains: Iterable[str]) -> Column:
    """True when ``host`` equals a blocked domain or is a subdomain of
    one. The list folds into the plan (tiny, ships with the task — the
    broadcast-small-dictionary pattern); use :func:`filter_blocklist_df`
    for a blocklist that lives in a table."""
    cond = F.lit(False)
    for d in domains:
        d = d.lower()
        cond = cond | (host == d) | host.endswith("." + d)
    return cond


def filter_blocklist(
    docs: DataFrame, domains: Iterable[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose url host is on (or under) a blocked domain."""
    return docs.filter(~is_blocked_col(host_col(url_col), domains))


def filter_blocklist_df(
    docs: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Blocklist-as-table variant: broadcast LEFT ANTI join on
    (host == domain OR host endswith '.'||domain). The blocklist side is
    explicitly broadcast (it is small by nature); the corpus side never
    shuffles. The OR-condition plans as BroadcastNestedLoopJoin — fine
    for a list of domains, and the right shape at 100 TB because cost is
    |corpus| × |blocklist| row-tests with zero data movement."""
    h = host_col(url_col)
    d = F.lower(blocklist["domain"])
    return docs.join(
        F.broadcast(blocklist),
        (h == d) | h.endswith(F.concat(F.lit("."), d)),
        "left_anti",
    )
