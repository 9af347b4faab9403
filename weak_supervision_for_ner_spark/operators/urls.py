"""URL canonicalization for web corpora — the dedup-by-url step every
Common-Crawl-style pipeline runs before content dedup (two crawls of
``HTTP://WWW.Example.com/a/?utm_source=x&b=1#frag`` and
``http://example.com/a?b=1`` are the same page).

The KG pipeline keys everything by url (per-url text identity,
url-hash partitioning), so canonical urls directly improve triple
provenance: without this, one page crawled through tracking-decorated
links contributes duplicate (subj, pred, obj, url) evidence.

Canonicalization rules (deterministic, documented, mirrored exactly
by the DuckDB oracle — every regex stays inside the Java∩RE2 subset
and every list op has a DuckDB twin):

1. scheme lowercased;
2. host lowercased, one leading ``www.`` stripped;
3. default ports removed (``:80`` for http, ``:443`` for https);
4. fragment dropped;
5. tracking params dropped: name matches ``utm_*``, ``fbclid``,
   ``gclid`` or ``msclkid``;
6. remaining query params sorted lexicographically (param ORDER is
   not semantic; duplicates and valueless params are kept verbatim);
7. trailing ``/`` stripped from a non-root path; empty path → ``/``.

Inputs without a ``scheme://`` prefix pass through unchanged (the
operator never guesses a scheme). Everything is built-in
split/filter/sort/concat expressions — one codegen'd projection, no
UDF, no shuffle for the canonical form itself; the duplicate-group
aggregation is one count shuffle on the canonical url (at 100 TB the
hot-url groups are exactly the heavy hitters AQE's skew handling
splits, and the 8-byte ``url_group`` hash travels instead of the url
string wherever downstream joins allow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TRACKING = r"^(utm_[^=]*|fbclid|gclid|msclkid)(=.*)?$"


def canonical_url_expr(url_col: str):
    """The canonical-url column expression (shared by the operator and
    any caller that wants the form without the dup-count shuffle)."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")          # 4. fragment
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = F.substring(rest, F.length(hostport) + 1, F.lit(2_000_000))
    host = F.lower(hostport)
    host = F.regexp_replace(host, r"^www\.", "")        # 2. www.
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")) \
            .when(scheme == "https", F.regexp_replace(host, r":443$", "")) \
            .otherwise(host)                            # 3. default ports
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.substring(tail, F.length(path) + 2, F.lit(2_000_000))
    # 5+6: drop tracking params, sort the rest
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING),
    ))
    # 7: ONE trailing slash off non-root paths; empty path -> "/"
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(path != "/", F.regexp_replace(path, "/$", "")).otherwise(path)
    )
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(F.size(kept) > 0,
               F.concat(F.lit("?"), F.concat_ws("&", kept))).otherwise(F.lit("")),
    )
    return F.when(u.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), canon).otherwise(u)


def canonicalize_urls(documents: DataFrame, url_col: str = "url",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, url, canonical_url, url_group, n_same_url) — canonical
    form per the module rules, an 8-byte ``xxhash64(canonical_url)``
    group key (joins downstream travel 8 bytes, not strings), and the
    group's member count so crawl-duplicate volume is observable,
    never silent. Keep-one-per-group = filter on
    ``row_number() over (partition by url_group order by doc_id) = 1``
    or simply ``min(doc_id)`` — left to the caller, who knows which
    crawl snapshot wins."""
    base = documents.select(
        F.col(id_col), F.col(url_col),
        canonical_url_expr(url_col).alias("canonical_url"),
    ).withColumn("url_group", F.xxhash64("canonical_url"))
    counts = base.groupBy("url_group").agg(
        F.count(F.lit(1)).alias("n_same_url"))
    return base.join(counts, "url_group").select(
        id_col, url_col, "canonical_url", "url_group", "n_same_url")
