"""URL operators for web-corpus pipelines: host extraction, heuristic
registered-domain, and normalization into a stable dedup key.

Web-crawl cleaning (CCNet, RefinedWeb) dedups and rate-balances by URL and
by domain before any content pass — these keys must be deterministic and
cheap.  Everything here is a regex-only Column expression (no UDF, no
``parse_url`` — kept regex-only so the exact same patterns run in DuckDB /
Trino for conformance checks; RE2-compatible: no lookahead/lookbehind).

``registered_domain`` is the last-two-labels heuristic, NOT the Public
Suffix List — ``foo.co.uk`` yields ``co.uk``.  Wire a PSL lookup (a
broadcast join against the published list) where that matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dqx_spark.rule import to_col

__all__ = ["url_host", "registered_domain", "url_normalize", "dedup_by_url", "link_pattern", "extract_links"]

#: scheme://[userinfo@]HOST[:port][/...]
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def url_host(column: str | Column) -> Column:
    """Lowercased host of an absolute URL ('' when not parseable)."""
    return F.lower(F.regexp_extract(to_col(column), _HOST_RE, 1))


def registered_domain(column: str | Column) -> Column:
    """Last two dot-labels of the host (heuristic eTLD+1): bare hosts pass
    through ('localhost' -> 'localhost')."""
    host = url_host(column)
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$|^([^.]+)$", 0)


def url_normalize(column: str | Column) -> Column:
    """Canonical dedup key for a URL:

    * scheme and host lowercased; ``www.`` prefix and default ports
      (``:80``/``:443``) dropped,
    * fragment dropped,
    * tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``) dropped,
      with a dangling ``?``/``&`` cleaned up,
    * trailing ``/`` dropped (but a bare host keeps none to drop).
    """
    col = F.coalesce(to_col(column), F.lit(""))
    # lowercase scheme://host prefix only (path/query stay case-sensitive)
    prefix = F.lower(F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.concat(prefix, rest)
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")
    u = F.regexp_replace(u, r"^(https?://[^/?#:]+):(?:80|443)(/|\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"#.*$", "")
    # tracking params must be anchored to a ?/& separator ('?href=x' keeps
    # its h!); removal leaves the separator, then debris collapses:
    # '?utm_a=1&utm_b=2&q=3' -> '?&&q=3' -> '?q=3'
    u = F.regexp_replace(u, r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"([?&])&+", r"$1")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


def dedup_by_url(df, id_col: str, url_col: str, keep_col: str | None = None, kept_col: str = "kept"):
    """Flag one keeper per normalized URL (the RefinedWeb first-stage
    discipline: URL dedup before any content pass).  Adds boolean
    ``kept_col``: true for the keeper of each :func:`url_normalize` key
    and for every row whose URL has no parseable host (non-URLs never
    merge with each other — a content-hash pass owns those).

    Keeper policy mirrors :func:`~dqx_spark.pipeline.dedup.
    keep_best_per_group`: smallest id, or with a numeric ``keep_col`` the
    highest value (nulls lose), ties to the smallest id.

    Scale shape: one map-side-combined min-struct aggregation on the
    normalized key (the key is a regex projection, computed scan-side)
    and a slim join-back — the same skew-immune shape as
    ``drop_exact_duplicates``; no window over member rows.
    """
    from dqx_spark.pipeline.dedup import keeper_pick  # noqa: PLC0415 (dedup imports text, not web)

    parseable = url_host(url_col) != ""
    with_key = df.withColumn("__ukey", F.when(parseable, url_normalize(url_col)))
    pick = keeper_pick(id_col, keep_col)
    winners = (
        with_key.where(F.col("__ukey").isNotNull())
        .groupBy("__ukey")
        .agg(F.min(pick).alias("__k"))
        .select("__ukey", F.col("__k.kid").alias("__keep"))
    )
    out = with_key.join(winners, "__ukey", "left")
    return out.withColumn(
        kept_col, F.col("__ukey").isNull() | (F.col(id_col) == F.col("__keep"))
    ).drop("__ukey", "__keep")


def link_pattern(attrs: tuple = ("href", "src")) -> str:
    """The shared attribute-value regex used by :func:`extract_links` —
    exposed so oracle twins interpolate the IDENTICAL string.

    The attribute name must follow start-of-string or a char that is
    neither a word char nor ``-`` — a bare ``\\b`` would also fire after
    a hyphen, swallowing ``data-src=``/``data-href=`` lazy-loading
    attributes as if they were the real ones (r8 review).  Prose like
    ``set href=x`` still matches: that ambiguity is inherent to
    regex-tier extraction (no lookbehinds in RE2) and documented."""
    for a in attrs:
        if not a or not all(c.isalnum() or c in "-_" for c in a):
            raise ValueError(f"invalid attribute name {a!r}")
    alts = "|".join(attrs)
    return "(?i)(?:^|[^\\w-])(?:" + alts + ")\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s\"'>]+)"


def extract_links(column: str | Column, attrs: tuple = ("href", "src")) -> Column:
    """Array of link targets from raw HTML — the URL values of ``href`` /
    ``src`` attributes (double-, single-, or un-quoted), in document
    order.  Feeds :func:`dedup_by_url` / :func:`registered_domain` for
    outlink-graph and domain-balance passes over a crawl.

    Regex-only like the rest of this module (RE2-compatible, so oracle
    engines run the identical pattern).  One capture group holds the
    value WITH its quotes (alternatives inside the group — extract_all
    returns a single group, and RE2 has no backreferences to pair the
    quote styles), stripped per element afterwards.  Fragment-only links
    (``#...``) and empty values are excluded.  Null HTML -> empty
    array."""
    pat = link_pattern(attrs)
    col = F.coalesce(to_col(column), F.lit(""))
    vals = F.transform(
        F.regexp_extract_all(col, F.lit(pat), 1),
        lambda m: F.regexp_replace(m, "^[\"']|[\"']$", ""),
    )
    return F.filter(vals, lambda v: (v != "") & ~v.startswith("#"))
