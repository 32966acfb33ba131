"""URL canonicalization column functions — the first dedup signal in a
web-corpus build (CCNet/FineWeb run URL-level exact dedup before any
content hashing, and per-domain caps need a normalized host).

Everything is a composition of regexp_extract / split / list ops with
engine-portable semantics — no capture-group replacements (Spark `$1` vs
RE2 `\\1` replacement syntax differs, and RE2 global capture-replace has
known re-application quirks), no lookarounds (RE2 has none). The DuckDB
oracle mirrors each step with split_part / list_filter / list_sort.

Canonicalization rules (the common subset of Safe Browsing / crawler
practice):
- lowercase scheme and host; strip a leading ``www.``
- strip the default port (``:80`` for http, ``:443`` for https)
- strip the fragment
- drop tracking query params (``utm_*``, ``fbclid``, ``gclid``), sort the
  survivors bytewise, drop an empty query entirely
- strip one trailing slash from the path
- strings that don't parse as ``scheme://host...`` are returned trimmed
  but otherwise untouched (never guess at relative URLs)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"

TRACKING_PARAM_PREFIXES = ("utm_", "fbclid", "gclid")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _is_tracking(p: Column) -> Column:
    out = F.lit(False)
    for pref in TRACKING_PARAM_PREFIXES:
        out = out | p.startswith(pref)
    return out


def url_host(c: Column | str) -> Column:
    """Normalized host of a URL ('' when the string doesn't parse):
    lowercased, ``www.`` and default ports stripped. The natural domain
    key for cap_per_domain / per-site stats."""
    u = F.trim(_col(c))
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host = F.when(host.startswith("www."), F.substring(host, 5, 2_000_000)).otherwise(
        host
    )
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.substring(host, 1, F.length(host) - 3),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.substring(host, 1, F.length(host) - 4),
    ).otherwise(host)
    return host


def normalize_url(c: Column | str) -> Column:
    """Canonical form of a URL column (see module docstring for the rule
    set). Unparseable strings pass through trimmed."""
    u = F.trim(_col(c))
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    rest = F.regexp_extract(u, _URL_RE, 3)

    # fragment off, then path / query split on the FIRST '?' only
    nofrag = F.substring_index(rest, "#", 1)
    qpos = F.locate("?", nofrag)
    path = F.when(qpos > 0, F.substring(nofrag, F.lit(1), qpos - 1)).otherwise(nofrag)
    qs = F.when(qpos > 0, F.substring(nofrag, qpos + 1, F.lit(2_000_000))).otherwise(
        F.lit("")
    )

    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~_is_tracking(p),
        )
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))

    path = F.when(
        path.endswith("/"), F.substring(path, 1, F.length(path) - 1)
    ).otherwise(path)

    canon = F.concat(scheme, F.lit("://"), url_host(u), path, query)
    return F.when(scheme != "", canon).otherwise(u)
