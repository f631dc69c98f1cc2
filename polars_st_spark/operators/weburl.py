"""URL / domain operators for web-corpus curation.

Crawl-derived training corpora are filtered and rebalanced BY DOMAIN
(C4 blocklists, RefinedWeb/FineWeb URL dedup and per-domain caps — all
public): the unit of curation policy is the registered domain, not the
raw URL. Everything here is pure codegen SQL (Java∩RE2 portable regex,
split/array ops) — no UDF, no shuffle; the blocklist join broadcasts.

- :func:`url_host` — hostname from a URL (scheme/userinfo/port aware).
- :func:`registered_domain` — eTLD+1 heuristic: last two labels, or last
  three when the second-level label is a common public second-level
  registry (co/com/net/org/ac/gov/edu under a ccTLD, e.g. ``bbc.co.uk``).
  A full public-suffix-list lookup is a data file, not an algorithm —
  callers with the PSL load it as a broadcast join table; the heuristic
  covers the overwhelming bulk of crawl traffic.
- :func:`url_strip_tracking` — drop utm_*/fbclid/gclid query params (the
  canonicalization step before URL-level exact dedup).
- :func:`domain_blocklist_filter` — drop rows whose registered domain is
  on a blocklist (tiny list → codegen isin; DataFrame → broadcast
  anti-join, the 100 TB path for large blocklists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_st_spark.functions.factory import col_or_lit

__all__ = [
    "domain_blocklist_filter",
    "registered_domain",
    "url_host",
    "url_strip_tracking",
]

# scheme :// [userinfo@] host [:port] — host stops at / : ? #
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)"

# public second-level registry labels (the common ccTLD pattern)
_SECOND_LEVEL = ("co", "com", "net", "org", "ac", "gov", "edu")


def url_host(url) -> Column:
    """Lower-cased hostname of a URL; empty string when the value does not
    parse as an absolute URL (curation treats those as policy-less)."""
    c = col_or_lit(url)
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def registered_domain(host) -> Column:
    """eTLD+1 from a hostname (see module docstring for the heuristic's
    contract). Guarded element_at under ANSI mode: negative indices are
    only evaluated in branches where the label count allows them."""
    h = col_or_lit(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    two = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    three = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(
            n >= 3,
            F.when(F.element_at(parts, -2).isin(*_SECOND_LEVEL), three).otherwise(two),
        )
        .when(n == 2, two)
        .otherwise(h)
    )


def url_strip_tracking(url) -> Column:
    """Remove utm_* / fbclid / gclid / msclkid query parameters, then any
    orphaned ``?``/``&`` the removal left behind — the canonical form for
    URL-level exact dedup."""
    c = col_or_lit(url)
    # exact split/filter/rejoin (regex-replace chains miss runs of
    # consecutive tracking params): base ? kept-params # fragment
    base = F.regexp_extract(c, r"^([^?#]*)", 1)
    q = F.regexp_extract(c, r"\?([^#]*)", 1)
    frag = F.regexp_extract(c, r"(#.*)$", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: ~p.rlike(r"^(?:utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid)="),
    )
    qs = F.when(
        (q != "") & (F.size(kept) > 0),
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    return F.concat(base, qs, frag)


def domain_blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked,
    keep_col: str | None = None,
) -> DataFrame:
    """Drop (or, with ``keep_col``, flag) rows whose registered domain is
    blocked. ``blocked`` is a Python iterable of domains (codegen isin —
    right for policy lists of up to a few thousand entries) or a
    one-column DataFrame (broadcast left-anti join — the scale path for
    crawl-wide blocklists)."""
    dom = registered_domain(url_host(F.col(url_col)))
    if isinstance(blocked, DataFrame):
        bcol = blocked.columns[0]
        b = blocked.select(F.col(bcol).alias("_blocked_dom")).distinct()
        if keep_col is not None:
            flagged = df.withColumn("_dom", dom).join(
                F.broadcast(b), F.col("_dom") == F.col("_blocked_dom"), "left"
            )
            return flagged.withColumn(
                keep_col, F.col("_blocked_dom").isNull()
            ).drop("_dom", "_blocked_dom")
        return df.withColumn("_dom", dom).join(
            F.broadcast(b), F.col("_dom") == F.col("_blocked_dom"), "left_anti"
        ).drop("_dom")
    blocked = [str(d).lower() for d in blocked]
    hit = dom.isin(*blocked) if blocked else F.lit(False)
    if keep_col is not None:
        return df.withColumn(keep_col, ~hit)
    return df.where(~hit)
