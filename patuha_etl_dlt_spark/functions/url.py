"""URL canonicalization — native columns, no UDF.

A url-keyed web CDC engine (north rule: pages keyed by ``url``) needs a
canonical key: ``http://Example.com:80/a/?utm_source=x#top`` and
``http://example.com/a`` are the same page. Without canonicalization the
merge key fragments and the lake holds duplicate rows per real page.

All steps are built-in ``pyspark.sql.functions`` (regexp/array ops inside
whole-stage codegen) and intentionally simple enough to re-express in
ANSI/DuckDB SQL for the oracle gate:

1. scheme and host lowercased;
2. default ports dropped (``:80`` for http, ``:443`` for https);
3. fragment dropped;
4. tracking params dropped (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
   remaining params sorted (order-insensitive equality);
5. trailing ``/`` dropped from non-root paths; empty path → ``/``.

No reference analog (the reference syncs opaque rows); this is part of
the training-data-pipeline layer, like the dedup tiers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "ref=")

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored to the pre-fragment prefix: a '?' inside the fragment
# ('http://x/p#a?b=1', SPA '#/route?x=y') is NOT a query — matching it
# would fabricate a query from fragment content and conflate/split pages
# on the canonical merge key
_QUERY = r"^[^#?]*\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module docstring).
    NULL and scheme-less strings pass through unchanged."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT, 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    path = F.regexp_extract(url, _PATH, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(url, _QUERY, 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "")
                & ~p.startswith("utm_")
                & ~p.startswith("fbclid")
                & ~p.startswith("gclid")
                & ~p.startswith("ref="),
            )
        ),
        "&",
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    return F.when(url.isNull() | (scheme == ""), url).otherwise(rebuilt)


def canonical_url_groups(df, url_col: str = "url"):
    """Group rows by canonical URL: (canonical_url, n_variants, min raw)."""
    return (
        df.select(F.col(url_col).alias("raw"), canonicalize_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_variants"), F.min("raw").alias("first_raw"))
    )
