"""Web-native curation operators: URL canonicalization + re-crawl dedup.

Common-Crawl-style corpora re-fetch the same page across crawls under
syntactically different URLs (tracking params, fragments, host-case
variants). The standard curation pass canonicalizes the URL and keeps
the LATEST capture per canonical page (the CDX dedup convention). The
reference pipeline's analog surface is its URL-keyed request handling
(`onnxocr/app-service.py` keys work by request payload identity); the
corpus-scale generalization here is the canonical-URL group.

No external data (build brief): the crawl variants are synthesized
deterministically from ``documents`` — every 3 consecutive doc_ids play
re-crawls of one page, each decorated with a doc_id-dependent variant
(tracking query param, fragment, mixed-case host, or a genuine
``page=2`` param that canonicalization must KEEP). Both engines build
the identical variant set from the same arithmetic.

Canonicalizer steps (each a pure column expression, portable to DuckDB
verbatim — see the oracle SQL):

1. strip the fragment (``#...``);
2. strip tracking params (``utm_*``) — assumes params arrive
   partitioned tracking-last, the invariant real canonicalizers create
   by sorting params first (documented assumption, matched by the
   synthesis);
3. lowercase scheme and host ONLY (paths are case-sensitive):
   ``split('/')`` → lower parts 0 and 2 → rejoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onnxocr_ray_spark.registry import register
from onnxocr_ray_spark.sources.tables import load_table

# ts_ord = (doc_id * 7) % 1000003: a deterministic pseudo-capture-order
# that is injective within any 3-doc re-crawl group (7*delta mod p != 0
# for delta in {1,2}), so keep-latest has no ties in either engine.
_TS_MOD = 1000003


def _crawl_variants(docs: DataFrame) -> DataFrame:
    """(doc_id, url, ts_ord): synthesized crawl captures, 3 per page."""
    base = F.concat(
        F.lit("https://example.org/w/art-"),
        F.expr("doc_id DIV 3").cast("string"),
    )
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 1, F.concat(base, F.lit("?utm_source=feed")))
        .when(v == 2, F.concat(base, F.lit("#section-2")))
        .when(v == 3, F.concat(base, F.lit("?page=2&utm_campaign=mail")))
        .otherwise(base)
    )
    # every 7th capture reports a mixed-case host (HTTPS://EXAMPLE.ORG)
    url = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit("HTTPS://EXAMPLE.ORG"),
            F.substring(url, F.length(F.lit("https://example.org")) + 1, 1 << 20),
        ),
    ).otherwise(url)
    return docs.select(
        "doc_id",
        url.alias("url"),
        ((F.col("doc_id") * 7) % _TS_MOD).alias("ts_ord"),
    )


def canonical_url(url):
    """Canonical form of a crawl URL as a pure column expression."""
    no_frag = F.split(url, "#").getItem(0)
    no_track = F.regexp_replace(no_frag, r"[?&]utm_[a-z]+=[a-zA-Z0-9_-]*", "")
    parts = F.split(no_track, "/")
    # scheme ("https:"), "", host, path...
    return F.concat_ws(
        "/",
        F.lower(parts.getItem(0)),
        F.lit(""),
        F.lower(parts.getItem(2)),
        F.concat_ws("/", F.slice(parts, 4, 1 << 20)),
    )


@register(
    "url_canonical_dedup",
    priority=12,  # new in r5 -> into the driver's checked window
    sql=f"""
    WITH captures AS (
      SELECT doc_id,
             CASE
               WHEN doc_id % 7 = 0 THEN
                 'HTTPS://EXAMPLE.ORG' || substr(u, length('https://example.org') + 1)
               ELSE u
             END AS url,
             (doc_id * 7) % {_TS_MOD} AS ts_ord
      FROM (
        SELECT doc_id,
               'https://example.org/w/art-' || CAST(doc_id // 3 AS VARCHAR)
               || CASE doc_id % 4
                    WHEN 1 THEN '?utm_source=feed'
                    WHEN 2 THEN '#section-2'
                    WHEN 3 THEN '?page=2&utm_campaign=mail'
                    ELSE ''
                  END AS u
        FROM documents
      )
    ), split_parts AS (
      SELECT doc_id, url, ts_ord,
             string_split(
               regexp_replace(string_split(url, '#')[1],
                              '[?&]utm_[a-z]+=[a-zA-Z0-9_-]*', ''),
               '/') AS p
      FROM captures
    ), canon AS (
      SELECT doc_id, url, ts_ord,
             lower(p[1]) || '//' || lower(p[3]) || '/'
               || array_to_string(p[4:], '/') AS curl
      FROM split_parts
    )
    SELECT curl AS canonical_url,
           count(*) AS n_crawls,
           max_by(doc_id, ts_ord) AS kept_doc_id,
           max(ts_ord) AS last_ts,
           CAST(sum(CASE WHEN url <> curl THEN 1 ELSE 0 END) AS BIGINT)
             AS n_normalized
    FROM canon
    GROUP BY curl
    """,
    doc=(
        "web curation op: URL canonicalization (fragment strip, utm_* "
        "strip, lowercase scheme+host) + CDX-style keep-latest-capture "
        "dedup per canonical page over synthesized re-crawl variants; "
        "max_by keep-latest partial-aggregates (no window sort)"
    ),
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-crawl per canonical URL, with normalization stats.

    Plan shape (the 100 TB design, machine-asserted in test_plans):

    - canonicalization is pure whole-stage-codegen column work on the
      scan (split/regexp_replace/lower) — no UDF, no extra pass;
    - keep-latest is ``max_by(doc_id, ts_ord)``, an algebraic aggregate
      that partial-aggregates map-side — NOT a row_number() window,
      which would sort every group's captures inside the exchange. One
      hash exchange total, keyed by canonical_url;
    - ties are impossible by construction here; at real scale the
      capture timestamp would tie-break on (ts, digest) the same way.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    caps = _crawl_variants(docs)
    curl = canonical_url(F.col("url"))
    return (
        caps.select("doc_id", "url", "ts_ord", curl.alias("curl"))
        .groupBy(F.col("curl").alias("canonical_url"))
        .agg(
            F.count(F.lit(1)).alias("n_crawls"),
            F.expr("max_by(doc_id, ts_ord)").alias("kept_doc_id"),
            F.max("ts_ord").alias("last_ts"),
            F.sum((F.col("url") != F.col("curl")).cast("long")).alias(
                "n_normalized"
            ),
        )
    )


# --- per-host crawl budget (domain spam control) ---

_N_HOSTS = 37     # deterministic synthetic host spread (no external data)
_HOST_CAP = 5     # keep top-N docs per host


@register(
    "host_cap",
    priority=22,  # new this round: into the checked window
    sql=f"""
    SELECT host, doc_id, n_chars, rk FROM (
        SELECT 'h' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.example.org'
                 AS host,
               doc_id, n_chars,
               row_number() OVER (
                 PARTITION BY doc_id % {_N_HOSTS}
                 ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    ) WHERE rk <= {_HOST_CAP}
    ORDER BY host, rk
    """,
    doc=(
        "training-data op: per-host crawl budget — cap documents per "
        "domain at N, keeping the highest-quality (longest) ones: the "
        "RefinedWeb-style spam-control rule that stops one boilerplate "
        "farm from dominating the corpus. Ranks are a map-side "
        "WindowGroupLimit (plan-asserted): each task pre-prunes to its "
        "local top-N per host before the single hash exchange, so a "
        "million-page domain contributes N rows to the shuffle, not a "
        "million."
    ),
)
def host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    hkey = F.col("doc_id") % _N_HOSTS
    host = F.concat(
        F.lit("h"), hkey.cast("string"), F.lit(".example.org")
    )
    w = W.partitionBy(hkey).orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select(
            host.alias("host"),
            "doc_id",
            "n_chars",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= _HOST_CAP)
        .orderBy("host", "rk")
    )
