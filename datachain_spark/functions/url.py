"""URL canonicalization — pure Catalyst expressions, no UDF.

Web-corpus pipelines dedup by canonical URL before content hashing
(the reference leaves this to user code; Common Crawl / C4-style
pipelines all carry a variant of these rules). Everything here is
regexp + higher-order array functions, so it rides whole-stage codegen
over billions of rows.

Canonicalization rules (documented contract, applied in order):
  1. trim; drop the fragment (`#...`).
  2. scheme lowercased.
  3. host lowercased, leading `www.` stripped, default port stripped
     (`:80` for http, `:443` for https).
  4. path: collapse trailing slashes away (root becomes empty).
  5. query: split on `&`, drop tracking params (utm_*, gclid, fbclid,
     ref), sort the rest byte-wise, rejoin; an emptied query drops `?`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=&]*|gclid|fbclid|ref)(=|$)"


def canonicalize_url(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(F.trim(u), "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([^:/?#]+)://", 1))
    hostport = F.lower(F.regexp_extract(no_frag, r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(no_frag, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    query = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qtail = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qtail)


def url_host(url: Column | str) -> Column:
    """Canonical host only (registrable-domain grouping is the common
    corpus-stats axis)."""
    u = F.col(url) if isinstance(url, str) else url
    hostport = F.lower(F.regexp_extract(F.trim(u), r"^[^:/?#]+://([^/?#]*)", 1))
    return F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":\d+$", ""
    )


def dedup_by_url(df, url_col: str, id_col: str):
    """Keep one row per canonical URL (lowest id wins) — the standard
    first-stage web-corpus dedup. One hash-aggregate shuffle on the
    canonical key; at 100 TB this is the cheapest possible exact dedup."""
    ranked = df.withColumn("__canon", canonicalize_url(url_col))
    keep = ranked.groupBy("__canon").agg(F.min(id_col).alias(id_col))
    return (
        ranked.join(keep, ["__canon", id_col], "left_semi").drop("__canon")
    )


__all__ = ["TRACKING_PARAM_RE", "canonicalize_url", "dedup_by_url", "url_host"]
