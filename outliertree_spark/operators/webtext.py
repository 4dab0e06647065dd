"""HTML -> text extraction for Common-Crawl-style web pages.

The north-rule input carries both the raw page (``html: binary``) and the
extracted text (``text: string``); the per-row invariant the engine must
evidence is **byte-identical extracted text per url** — re-extracting from
``html`` must reproduce ``text`` exactly, row for row.

Everything here is pure ``pyspark.sql.functions`` (regexp_replace /
replace chains), so extraction runs inside whole-stage codegen on the
JVM: no Python worker, no Arrow transfer, and the parquet scan under it
keeps its column pruning (only ``html`` + compare columns are read).
That is the property that matters at 10^12 rows — a Pandas-UDF
extractor would move every page body across the Arrow boundary.

Escaping/extraction are exact inverses for any input text (the standard
amp-last / amp-first ordering), which is what makes the byte-identity
check a hard invariant rather than a fuzzy similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# named entities the extractor decodes; '&amp;' must stay LAST on decode
# (and '&' FIRST on encode) so escape/unescape compose to the identity.
_DECODE = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def escape_html_text(text: Column | str) -> Column:
    """Entity-escape raw text for embedding in an HTML body ('&' first)."""
    c = _col(text)
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    return c


def unescape_entities(text: Column | str) -> Column:
    """Decode the common named entities ('&amp;' last)."""
    c = _col(text)
    for needle, repl in _DECODE:
        c = F.replace(c, F.lit(needle), F.lit(repl))
    return c


def html_to_text(html: Column | str, normalize_ws: bool = False) -> Column:
    """Extract visible text from an HTML page (binary or string column).

    Pipeline (all JVM-side regexp/replace, global by default in Spark):
      1. UTF-8 decode (``cast("string")`` on binary)
      2. drop the <head>...</head> block (title/meta are not body text)
      3. drop <script>...</script> and <style>...</style> blocks
      4. drop <!-- comments -->
      5. strip every remaining tag
      6. decode named entities (amp last)
      7. optional whitespace collapse (OFF by default — the byte-identity
         invariant requires the extractor not to editorialize)
    """
    s = _col(html).cast("string")
    s = F.regexp_replace(s, r"(?is)<head\b[^>]*>.*?</head>", "")
    s = F.regexp_replace(s, r"(?is)<script\b[^>]*>.*?</script>", "")
    s = F.regexp_replace(s, r"(?is)<style\b[^>]*>.*?</style>", "")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", "")
    s = unescape_entities(s)
    if normalize_ws:
        s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return s


# query params dropped during URL canonicalization (tracking noise)
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid)="


def url_host(url: Column | str) -> Column:
    """Lowercased host (with port stripped) — regexp-based so the DuckDB
    oracle can reproduce it exactly (no parse_url twin there)."""
    c = _col(url)
    return F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#:]*)", 1))


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form for dedup/uniqueness keys, all JVM-side:

      1. drop the #fragment
      2. lowercase scheme://host and strip default ports (:80 http,
         :443 https)
      3. empty path -> "/"
      4. drop tracking params (utm_*/fbclid/gclid) and empty params,
         sort the rest byte-wise, drop the '?' if none survive

    Scheme-less strings pass through with only the fragment removed
    (documented: not a URL we can canonicalize).  The equivalent DuckDB
    chain lives in ``__spark_entry__.oracle_sql()["canonical_urls"]``.
    """
    c = F.regexp_replace(_col(url), r"#.*$", "")
    head = F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", 1)
    scheme = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1))
    hostport = F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1))
    # no backreference replacements: the DuckDB oracle mirrors this chain
    hostport = F.when(scheme == "http",
                      F.regexp_replace(hostport, r":80$", "")).otherwise(hostport)
    hostport = F.when(scheme == "https",
                      F.regexp_replace(hostport, r":443$", "")).otherwise(hostport)
    norm_head = F.concat(scheme, F.lit("://"), hostport)
    rest = F.substr(c, F.length(head) + F.lit(1))
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(norm_head, path,
                     F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)))
    return F.when(head == "", c).otherwise(canon)


def canonical_duplicate_urls(df: DataFrame, url_col: str = "url",
                             id_col: str = "doc_id") -> DataFrame:
    """Groups of docs sharing a canonical URL: (canonical_url, n_docs,
    keep_id) with keep_id = min id (deterministic winner).  A salted
    two-phase agg is unnecessary: canonical URLs are near-unique keys, so
    the hash agg is naturally balanced; host-level hot keys never form
    because the full path participates in the key."""
    canon = canonicalize_url(F.col(url_col)).alias("canonical_url")
    return (df.select(canon, F.col(id_col))
              .groupBy("canonical_url")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.min(id_col).alias("keep_id"))
              .filter(F.col("n_docs") > 1))


def extraction_parity(df: DataFrame, html_col: str = "html",
                      text_col: str = "text",
                      id_cols: list[str] | None = None) -> DataFrame:
    """Rows violating the byte-identity invariant: re-extracted text from
    ``html_col`` differs from the stored ``text_col``.

    Returns the id columns plus diagnostics (lengths and the first byte
    offset where the two strings diverge) — empty means the invariant
    holds on every row.  Null text and null/undecodable html count as
    violations unless both sides are null.
    """
    ids = id_cols or [c for c in ("url", "doc_id") if c in df.columns]
    ex = html_to_text(F.col(html_col))
    t = F.col(text_col)
    same = (ex.eqNullSafe(t))
    # first mismatching 1-based offset; 0 when one side is a prefix
    pair = F.arrays_zip(F.split(ex, ""), F.split(t, ""))
    first_diff = F.array_position(
        F.transform(pair, lambda p: p["0"].eqNullSafe(p["1"])), F.lit(False))
    return (df.withColumn("_extracted", ex)
              .filter(~same)
              .select(*ids,
                      F.length("_extracted").alias("n_chars_extracted"),
                      F.length(t).alias("n_chars_expected"),
                      first_diff.alias("first_diff_pos")))


def extraction_summary(df: DataFrame, html_col: str = "html",
                       text_col: str = "text") -> DataFrame:
    """One row: (n_rows, n_mismatch, byte_identical) — the invariant as a
    single partial-aggregable scan (no shuffle beyond the final reduce)."""
    ex = html_to_text(F.col(html_col))
    bad = (~ex.eqNullSafe(F.col(text_col))).cast("long")
    return df.agg(F.count(F.lit(1)).alias("n_rows"),
                  F.sum(bad).alias("n_mismatch"),
                  (F.sum(bad) == 0).alias("byte_identical"))


def url_blocklist_filter(df: DataFrame, hosts: list[str] | None = None,
                         patterns: list[str] | None = None,
                         url_col: str = "url",
                         keep: bool = True) -> DataFrame:
    """UT1/adult-list-style URL filtering, the standard crawl-curation
    gate ahead of content filters (used by CCNet/RefinedWeb/FineWeb).

    Two match modes, composable:

    - ``hosts``: host membership including subdomains (``example.com``
      blocks ``example.com`` and ``*.example.com``).  Detection runs on
      a URL-ONLY projection: each URL's dot-boundary host suffixes
      (≤ label count, row-local) explode and semi-join the BROADCAST
      blocklist dimension (real blocklists are a few million rows — UT1
      ~4M — and broadcast fine), producing a text-free blocked-URL set
      that joins back on ``url_col``.  The join-back is the paragraph-
      dedup shape: the only corpus-keyed exchange carries the blocked
      subset, which AQE turns into a broadcast when (as in practice)
      few URLs match; document bytes never ride the detection path.
    - ``patterns``: Java regexes against the full URL — a row-local OR
      chain in codegen (use for path keywords).

    ``keep=True`` returns the surviving rows; ``keep=False`` the
    blocked rows (audit)."""
    cond = F.lit(False)
    if hosts:
        spark = df.sparkSession
        from ..localrel import local_df
        dim = local_df(spark, [(h.lower(),) for h in sorted(set(hosts))],
                       "blocked_host string")
        # normalize before suffix matching: extract the FULL authority
        # (url_host's port-stripping regex stops at the ':' inside
        # "u:pw@host" userinfo), then strip userinfo, port, and
        # trailing dots — "x@bad.example.com", "u:pw@...", port forms
        # and the FQDN "bad.example.com." are all trivial blocklist
        # evasions otherwise.  The DuckDB twin applies the same steps.
        auth = F.lower(F.regexp_extract(
            F.col(url_col),
            r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1))
        host = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(auth, r"^.*@", ""),
                r":[0-9]*$", ""),
            r"\.+$", "")
        labels = F.split(host, r"\.")
        n = F.size(labels)
        suffixes = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(labels, i, n), "."))
        blocked = (df.select(F.col(url_col))
                     .select(F.col(url_col), F.explode(suffixes)
                             .alias("_sfx"))
                     .join(F.broadcast(dim),
                           F.col("_sfx") == F.col("blocked_host"),
                           "left_semi")
                     .select(url_col).distinct()
                     .withColumn("_blocked", F.lit(True)))
        df = df.join(blocked, url_col, "left")
        cond = cond | F.col("_blocked").isNotNull()
    if patterns:
        for p in patterns:
            cond = cond | F.col(url_col).rlike(p)
    # NULL url: rlike(NULL) is NULL and NULL survives neither filter —
    # the row would silently vanish from BOTH keep and audit outputs.
    # Treat NULL url as not-blocked so kept + blocked partition the
    # input (flag-don't-drop, same convention as the jsonl quarantine).
    cond = F.coalesce(cond, F.lit(False))
    out = df.filter(~cond if keep else cond)
    return out.drop("_blocked") if hosts else out
