"""Corpus-hygiene operators for LLM pretraining data: cross-document
segment-level dedup (C4-style) and within-document repetition filters
(the Gopher repetition section — complements plans/text.py's
text_gopher_rules, which covers the non-repetition rules).

Both are designed scan-first: the repetition filter is entirely
shuffle-free array expressions; the segment dedup's only shuffle is
the dedup hash partition itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround, sql_dround
from ..sources import load_table
from .registry import query

_CHUNK_WORDS = 10


@query(
    "dedup_lines_c4",
    oracle=f"""
    WITH docs AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
    chunks AS (
      SELECT doc_id, i AS pos,
             array_to_string(w[(i*{_CHUNK_WORDS}+1):(i*{_CHUNK_WORDS}+{_CHUNK_WORDS})], ' ') AS chunk
      FROM docs, UNNEST(range(CAST(ceil(len(w) / {_CHUNK_WORDS}.0) AS BIGINT))) AS t(i)
    ),
    keep AS (
      SELECT doc_id, pos, chunk
      FROM chunks
      QUALIFY row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) = 1
    )
    SELECT doc_id,
           string_agg(chunk, ' ' ORDER BY pos) AS cleaned_text,
           count(*) AS n_chunks_kept
    FROM keep GROUP BY doc_id
    """,
)
def dedup_lines_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document segment dedup: documents split into
    fixed 10-word segments (the corpus has no newlines — segments
    stand in for C4's lines), every segment kept only at its first
    corpus occurrence (min doc_id, then position), surviving segments
    reassembled in order. Documents whose every segment is boilerplate
    vanish — exactly C4's behavior.

    Scale: segmentation is a shuffle-free higher-order expression; the
    single shuffle is the hash partition on segment text for the keep-
    first window. At 100 TB you shuffle xxhash64(segment) + (doc, pos)
    instead of the raw text and join winners back by (doc, pos) — same
    plan shape, thinner shuffle rows."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_chunks = F.ceil(F.size(w) / F.lit(float(_CHUNK_WORDS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(w, i * _CHUNK_WORDS + 1, _CHUNK_WORDS), " "
        ),
    )
    exploded = docs.select(
        "doc_id", F.posexplode(chunks).alias("pos", "chunk")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "chunk")
    first = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    kept = (
        exploded.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return kept.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, chunk))),"
            " s -> s.chunk), ' ')"
        ).alias("cleaned_text"),
        F.count(F.lit(1)).alias("n_chunks_kept"),
    )


@query(
    "text_repetition_filter",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents
    ),
    freq AS (
      SELECT doc_id, word, count(*) AS c FROM words GROUP BY 1, 2
    ),
    agg AS (
      SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,
             max(c) AS max_freq
      FROM freq GROUP BY 1
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           {sql_dround("1 - n_distinct / CAST(n_words AS DOUBLE)", 6)}
             AS dup_word_fraction,
           {sql_dround("max_freq / CAST(n_words AS DOUBLE)", 6)}
             AS top_word_share,
           CASE WHEN 1 - n_distinct / CAST(n_words AS DOUBLE) <= 0.55
                 AND max_freq / CAST(n_words AS DOUBLE) <= 0.10
                THEN 1 ELSE 0 END AS keep_doc
    FROM agg
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition rules: per-document duplicate-word
    fraction and most-frequent-word share, with the keep/drop flag.

    The oracle states it relationally (explode → group twice); the
    engine computes BOTH metrics shuffle-free per row — distinct count
    via array_distinct, and the top-word frequency as a single
    aggregate() pass over the SORTED word array tracking the longest
    equal-run (O(n log n) per doc, no explode, no shuffle) — so the
    filter runs at scan speed over 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    run0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):  # noqa: ANN001 - Column lambda
        new_run = F.when(acc.prev.isNotNull() & (acc.prev == x), acc.run + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc.best, new_run).alias("best"),
        )

    max_freq = F.aggregate(F.array_sort(w), run0, step).getField("best")
    n_words = F.size(w).cast("bigint")
    n_distinct = F.size(F.array_distinct(w)).cast("bigint")
    dup_frac = 1 - n_distinct / n_words.cast("double")
    top_share = max_freq / n_words.cast("double")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        dround(dup_frac, 6).alias("dup_word_fraction"),
        dround(top_share, 6).alias("top_word_share"),
        F.when((dup_frac <= 0.55) & (top_share <= 0.10), 1)
        .otherwise(0)
        .alias("keep_doc"),
    )


# ==========================================================================
# URL canonicalization — the stage-0 dedup key of every web-scale corpus
# pipeline (C4 / RefinedWeb / FineWeb dedupe by canonical URL before any
# content-level pass). The fixture has no URL column, so messy variants
# are synthesized deterministically from doc_id on BOTH engines (the
# text_redact_pii pattern): scheme-case, WWW. prefix, host case, default
# :443 port, utm tracking query, fragment, trailing slash — with doc
# pairs floor(doc_id/2) sharing a landing page so canonicalization
# provably collapses them.
# ==========================================================================

_URL_SYNTH_SQL = """
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
             || '://'
             || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0
                      THEN upper('cdn' || CAST((doc_id // 2) % 7 AS VARCHAR)
                           || '.' || (CASE CAST((doc_id // 2) % 3 AS INT)
                                      WHEN 0 THEN 'example.com'
                                      WHEN 1 THEN 'example.org'
                                      ELSE 'example.net' END))
                      ELSE 'cdn' || CAST((doc_id // 2) % 7 AS VARCHAR)
                           || '.' || (CASE CAST((doc_id // 2) % 3 AS INT)
                                      WHEN 0 THEN 'example.com'
                                      WHEN 1 THEN 'example.org'
                                      ELSE 'example.net' END) END)
             || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
             || '/docs/' || CAST(doc_id // 2 AS VARCHAR)
             || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
             || (CASE WHEN doc_id % 2 = 0
                      THEN '?utm_source=feed&utm_medium=rss' ELSE '' END)
             || (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)
             AS url
      FROM documents
"""

_URL_CANON_ORACLE = f"""
    WITH raw AS ({_URL_SYNTH_SQL}),
    s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw),
    s2 AS (SELECT doc_id,
                  regexp_replace(u, '\\?utm_[^#&]*(&utm_[^#&]*)*$', '') AS u
           FROM s1),
    parts AS (
      SELECT doc_id,
             lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) AS scheme,
             regexp_replace(regexp_replace(
               lower(regexp_extract(u, '^[A-Za-z]+://([^/?#]*)', 1)),
               '^www\\.', ''), ':443$', '') AS host,
             regexp_replace(
               regexp_extract(u, '^[A-Za-z]+://[^/?#]*(.*)$', 1),
               '/+$', '') AS path
      FROM s2
    ),
    canon AS (
      SELECT doc_id, scheme || '://' || host || path AS canonical_url,
             regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain
      FROM parts
    ),
    per_url AS (
      SELECT domain, canonical_url, count(*) AS n
      FROM canon GROUP BY 1, 2
    )
    SELECT domain,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_canonical_urls,
           CAST(sum(n - 1) AS BIGINT) AS n_url_dup_docs,
           CAST(max(n) AS BIGINT) AS max_docs_per_url,
           min(canonical_url) AS sample_url
    FROM per_url
    GROUP BY domain
"""


@query("corpus_url_canonicalize", oracle=_URL_CANON_ORACLE)
def corpus_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + URL-keyed dup grouping — stage 0 of
    web-corpus curation (C4/RefinedWeb/FineWeb all dedupe on the
    canonical URL before any content pass). Variants normalized:
    scheme/host case, `www.` prefix, default `:443` port, `utm_*`
    tracking query, fragment, trailing slash. Output per registered
    domain: doc count, distinct canonical URLs, docs collapsed by
    URL-level dedup, the hottest URL's multiplicity, and a
    deterministic sample.

    The fixture synthesizes the messy URLs from doc_id identically on
    both engines (each floor(doc_id/2) pair decorates one landing page
    two different ways, so every pair MUST collapse — n_url_dup_docs
    directly attests the canonicalizer).

    Scale: the synthesis + canonicalization is shuffle-free
    whole-stage-codegen string work at scan speed; the only shuffles
    are the two partial-agg hash aggregations (per-URL, then
    per-domain), both with map-side combine. At 100 TB the per-URL
    aggregation is the standard first dedup shuffle every web pipeline
    pays; domains are few, and a hot URL is a single hot key handled
    by AQE skew split (the groupBy carries no row payload beyond the
    count)."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    pid = F.floor(did / 2).cast("long")
    tld = (
        F.when((pid % 3) == 0, F.lit("example.com"))
        .when((pid % 3) == 1, F.lit("example.org"))
        .otherwise(F.lit("example.net"))
    )
    hostbase = F.concat(F.lit("cdn"), (pid % 7).cast("string"), F.lit("."), tld)
    url = F.concat(
        F.when(did % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(did % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.upper(hostbase)).otherwise(hostbase),
        F.when(did % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"), pid.cast("string"),
        F.when(did % 2 == 1, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 2 == 0, F.lit("?utm_source=feed&utm_medium=rss")).otherwise(
            F.lit("")
        ),
        F.when(did % 7 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    from ..functions.url import canonical_host, canonicalize_url, registered_domain

    canon = docs.select(url.alias("url")).select(
        canonicalize_url("url").alias("canonical_url"),
        registered_domain(canonical_host("url")).alias("domain"),
    )
    per_url = canon.groupBy("domain", "canonical_url").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_url.groupBy("domain").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_canonical_urls"),
        F.sum(F.col("n") - 1).cast("bigint").alias("n_url_dup_docs"),
        F.max("n").cast("bigint").alias("max_docs_per_url"),
        F.min("canonical_url").alias("sample_url"),
    )


@query(
    "corpus_filter_funnel_metrics",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             lang = 'en' AS p_lang,
             n_chars >= 100 AS p_len,
             len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20
               AS p_toks
      FROM documents
    )
    SELECT stage, n_in, n_out,
           floor((n_in - n_out) * 1.0 / greatest(n_in, 1) * 10000 + 0.5)
             / 10000 AS drop_rate
    FROM (
      SELECT 1 AS ord, 'lang_en' AS stage,
             count(*) AS n_in,
             CAST(sum(CAST(p_lang AS BIGINT)) AS BIGINT) AS n_out
      FROM d
      UNION ALL
      SELECT 2, 'min_chars_100',
             CAST(sum(CAST(p_lang AS BIGINT)) AS BIGINT),
             CAST(sum(CAST(p_lang AND p_len AS BIGINT)) AS BIGINT)
      FROM d
      UNION ALL
      SELECT 3, 'min_tokens_20',
             CAST(sum(CAST(p_lang AND p_len AS BIGINT)) AS BIGINT),
             CAST(sum(CAST(p_lang AND p_len AND p_toks AS BIGINT)) AS BIGINT)
      FROM d
    ) ORDER BY ord
    """,
)
def corpus_filter_funnel_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel observability: per-stage survivor counts and drop
    rates through a chained quality pipeline (language gate → length
    gate → token-count gate) — the report every corpus-curation run
    ships alongside its output, because 'the pipeline kept 62%' is
    meaningless without knowing WHICH stage ate the rest. Spelled as
    ONE map-side pass computing all stage predicates as booleans and
    folding every funnel level out of conditional sums — the fact
    table is scanned once no matter how many stages (vs the naive
    re-filter-per-stage which scans S times at 100 TB). Stage
    predicates mirror corpus_clean_pipeline's gates; exact integer
    counts, one pinned ratio per stage."""
    d = load_table(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").alias("p_lang"),
        (F.col("n_chars") >= 100).alias("p_len"),
        (
            F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")) >= 20
        ).alias("p_toks"),
    )
    agg = d.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("p_lang").cast("bigint")).cast("bigint").alias("n1"),
        F.sum((F.col("p_lang") & F.col("p_len")).cast("bigint"))
        .cast("bigint")
        .alias("n2"),
        F.sum((F.col("p_lang") & F.col("p_len") & F.col("p_toks")).cast("bigint"))
        .cast("bigint")
        .alias("n3"),
    )
    stages = [
        ("lang_en", "n0", "n1"),
        ("min_chars_100", "n1", "n2"),
        ("min_tokens_20", "n2", "n3"),
    ]
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("stage"),
                        F.col(i).alias("n_in"),
                        F.col(o).alias("n_out"),
                    )
                    for name, i, o in stages
                ]
            )
        ).alias("s")
    )
    return rows.select(
        "s.stage",
        "s.n_in",
        "s.n_out",
        dround(
            (F.col("s.n_in") - F.col("s.n_out"))
            * 1.0
            / F.greatest(F.col("s.n_in"), F.lit(1)),
            4,
        ).alias("drop_rate"),
    )


# ==========================================================================
# HTML extraction — the stage BEFORE corpus_url_canonicalize in a real
# crawl pipeline (WET-file generation): strip markup, drop script/style/
# comment islands, and remove boilerplate lines with the two public
# heuristics production extractors actually use — a link-density cut
# (jusText/Arc90's block rule) and the C4 line blacklist (lines carrying
# © / "javascript" / "cookie" markers). The fixture has no HTML column,
# so each doc's text is wrapped in a deterministic page (title, style,
# script, nav link bar, comment, h1, the content <p>, a "enable
# javascript" nag, a © footer) with &-escaping — identically on BOTH
# engines — which makes extraction ROUND-TRIP attestable: a correct
# extractor must recover exactly the original text for every doc whose
# text clears the min-length floor (n_recovered == n_recoverable).
# ==========================================================================

#: boilerplate thresholds — jusText-style length floor (chars) and
#: link-density cut shared by the Spark plan and the oracle SQL
_HTML_MIN_CHARS = 15
_HTML_LINK_DENS = 0.5

_HTML_SYNTH_SQL = """
      SELECT doc_id, lang,
             trim(replace(text, chr(10), ' ')) AS norm,
             '<html>' || chr(10)
             || '<head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>' || chr(10)
             || '<style>body { color: #333; font-size: 14px; }</style>' || chr(10)
             || '<script>var docId = ' || CAST(doc_id AS VARCHAR) || '; track();</script>' || chr(10)
             || '</head>' || chr(10)
             || '<body>' || chr(10)
             || '<nav><a href="/">Home</a> | <a href="/about">About</a> | <a href="/contact">Contact</a></nav>' || chr(10)
             || '<!-- tracking pixel 0x' || CAST(doc_id % 7 AS VARCHAR) || ' -->' || chr(10)
             || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' || chr(10)
             || '<p>' || replace(replace(replace(trim(replace(text, chr(10), ' ')),
                  '&', '&amp;'), '<', '&lt;'), '>', '&gt;') || '</p>' || chr(10)
             || '<div>Please enable javascript to view the comments.</div>' || chr(10)
             || '<footer>&copy; 2026 cdn' || CAST(doc_id % 7 AS VARCHAR) || ' &mdash; All rights reserved.</footer>' || chr(10)
             || '</body>' || chr(10)
             || '</html>' AS html
      FROM documents
"""

_HTML_EXTRACT_ORACLE = f"""
    WITH raw AS ({_HTML_SYNTH_SQL}),
    nos AS (
      SELECT doc_id, lang, norm, html,
             regexp_replace(regexp_replace(regexp_replace(html,
               '<script[^>]*>[^<]*</script>', ' ', 'g'),
               '<style[^>]*>[^<]*</style>', ' ', 'g'),
               '<!--[^>]*-->', ' ', 'g') AS h
      FROM raw
    ),
    lines AS (
      SELECT doc_id, lang, norm, html, u.pos, u.line
      FROM (SELECT doc_id, lang, norm, html,
                   unnest(list_transform(range(1, len(ls) + 1),
                          i -> {{'pos': i, 'line': ls[i]}})) AS u
            FROM (SELECT *, string_split(h, chr(10)) AS ls FROM nos))
    ),
    scored AS (
      SELECT doc_id, lang, norm, html, pos,
             replace(replace(replace(replace(replace(
               trim(regexp_replace(line, '<[^>]*>', '', 'g')),
               '&lt;', '<'), '&gt;', '>'), '&nbsp;', ' '),
               '&copy;', '©'), '&amp;', '&') AS decoded,
             CAST(coalesce(list_aggregate(list_transform(
               regexp_extract_all(line, '<a [^>]*>([^<]*)</a>', 1),
               s -> len(s)), 'sum'), 0) AS BIGINT) AS link_chars
      FROM lines
    ),
    flagged AS (
      SELECT *,
             len(decoded) >= {_HTML_MIN_CHARS}
             AND link_chars * 1.0 <= {_HTML_LINK_DENS} * len(decoded)
             AND NOT contains(lower(decoded), 'javascript')
             AND NOT contains(lower(decoded), 'cookie')
             AND NOT contains(decoded, '©') AS keep
      FROM scored
    ),
    per_doc AS (
      SELECT doc_id, any_value(lang) AS lang, any_value(norm) AS norm,
             any_value(len(html)) AS html_len,
             coalesce(string_agg(CASE WHEN keep THEN decoded END,
                                 chr(10) ORDER BY pos), '') AS extracted,
             count(*) FILTER (keep) AS kept,
             count(*) FILTER (NOT keep) AS dropped
      FROM flagged GROUP BY doc_id
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (len(norm) >= {_HTML_MIN_CHARS}) AS BIGINT)
             AS n_recoverable,
           CAST(count(*) FILTER (extracted = norm) AS BIGINT) AS n_recovered,
           CAST(sum(kept) AS BIGINT) AS n_blocks_kept,
           CAST(sum(dropped) AS BIGINT) AS n_blocks_dropped,
           CAST(sum(len(extracted)) AS BIGINT) AS extracted_chars,
           CAST(sum(html_len) AS BIGINT) AS html_chars
    FROM per_doc GROUP BY lang
"""


@query("text_html_extract", oracle=_HTML_EXTRACT_ORACLE)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-0 web-corpus extraction (r13 verdict item 6): see the
    section comment for the synthesis/attestation design. Pipeline:
    script/style/comment island removal → line split → tag strip →
    entity decode → jusText-style length floor + link-density cut +
    C4 line blacklist → window-ordered reassembly per doc.

    Round-trip attestation: the content <p> carries the doc's own
    &-escaped text, so for every doc whose normalized text clears the
    {_HTML_MIN_CHARS}-char floor (and carries no blacklist marker of
    its own) the extractor must emit EXACTLY that text back —
    n_recovered vs n_recoverable is the per-lang extraction fidelity,
    recomputed independently by the oracle.

    Scale shape: synthesis, island removal, tag strip, decode, and
    both boilerplate rules are shuffle-free whole-stage-codegen string
    expressions at scan speed (regexp_replace / regexp_extract_all /
    chained replace — no UDF, no Python); the only shuffles are the
    per-doc reassembly groupBy (keyed by doc_id, map-side combinable
    via the sorted-struct collect) and the final tiny per-lang
    aggregate. Line explode is a 1:n Generate with no exchange. At
    100 TB this is exactly the WET-extraction pass: one scan, one
    doc-keyed shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    norm = F.trim(F.regexp_replace("text", "\n", " "))
    esc = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(norm, "&", "&amp;"), "<", "&lt;"),
        ">", "&gt;",
    )
    nl = F.lit("\n")
    html = F.concat(
        F.lit("<html>"), nl,
        F.lit("<head><title>Doc "), did, F.lit("</title>"), nl,
        F.lit("<style>body { color: #333; font-size: 14px; }</style>"), nl,
        F.lit("<script>var docId = "), did, F.lit("; track();</script>"), nl,
        F.lit("</head>"), nl,
        F.lit("<body>"), nl,
        F.lit('<nav><a href="/">Home</a> | <a href="/about">About</a>'
              ' | <a href="/contact">Contact</a></nav>'), nl,
        F.lit("<!-- tracking pixel 0x"), (F.col("doc_id") % 7).cast("string"),
        F.lit(" -->"), nl,
        F.lit("<h1>Doc "), did, F.lit("</h1>"), nl,
        F.lit("<p>"), esc, F.lit("</p>"), nl,
        F.lit("<div>Please enable javascript to view the comments.</div>"), nl,
        F.lit("<footer>&copy; 2026 cdn"), (F.col("doc_id") % 7).cast("string"),
        F.lit(" &mdash; All rights reserved.</footer>"), nl,
        F.lit("</body>"), nl,
        F.lit("</html>"),
    )
    base = docs.select(
        "doc_id", "lang", norm.alias("norm"), html.alias("html")
    )
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("html", r"<script[^>]*>[^<]*</script>", " "),
            r"<style[^>]*>[^<]*</style>", " ",
        ),
        r"<!--[^>]*-->", " ",
    )
    lines = base.select(
        "doc_id", "lang", "norm",
        F.length("html").cast("bigint").alias("html_len"),
        F.posexplode(F.split(h, "\n")).alias("pos", "line"),
    )
    stripped = F.trim(F.regexp_replace("line", r"<[^>]*>", ""))
    decoded = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(stripped, "&lt;", "<"), "&gt;", ">"
                ),
                "&nbsp;", " ",
            ),
            "&copy;", "©",
        ),
        "&amp;", "&",
    )
    link_chars = F.coalesce(
        F.aggregate(
            F.expr(r"regexp_extract_all(line, '<a [^>]*>([^<]*)</a>', 1)"),
            F.lit(0).cast("bigint"),
            lambda acc, s: acc + F.length(s),
        ),
        F.lit(0),
    )
    scored = lines.select(
        "doc_id", "lang", "norm", "html_len", "pos",
        decoded.alias("decoded"),
        link_chars.cast("bigint").alias("link_chars"),
    )
    keep = (
        (F.length("decoded") >= _HTML_MIN_CHARS)
        & (F.col("link_chars") * 1.0 <= _HTML_LINK_DENS * F.length("decoded"))
        & ~F.lower(F.col("decoded")).contains("javascript")
        & ~F.lower(F.col("decoded")).contains("cookie")
        & ~F.col("decoded").contains("©")
    )
    per_doc = (
        scored.withColumn("keep", keep)
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.any_value("norm").alias("norm"),
            F.any_value("html_len").alias("html_len"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.when(
                                    F.col("keep"),
                                    F.struct("pos", "decoded"),
                                )
                            )
                        ),
                        lambda s: s["decoded"],
                    ),
                    "\n",
                ),
                F.lit(""),
            ).alias("extracted"),
            F.sum(F.col("keep").cast("int")).alias("kept"),
            F.sum((~F.col("keep")).cast("int")).alias("dropped"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.length("norm") >= _HTML_MIN_CHARS).cast("int"))
        .cast("bigint").alias("n_recoverable"),
        F.sum((F.col("extracted") == F.col("norm")).cast("int"))
        .cast("bigint").alias("n_recovered"),
        F.sum("kept").cast("bigint").alias("n_blocks_kept"),
        F.sum("dropped").cast("bigint").alias("n_blocks_dropped"),
        F.sum(F.length("extracted")).cast("bigint").alias("extracted_chars"),
        F.sum("html_len").cast("bigint").alias("html_chars"),
    )
