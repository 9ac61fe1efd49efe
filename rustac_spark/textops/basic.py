"""Text analysis operators for training-data pipelines (north-rule
first-class additions; no reference counterpart): token counting,
quality scoring, language ID, fingerprinting.

All pure Column expressions — they run in whole-stage codegen and
never leave the JVM, so they cost the same as built-in SQL functions
at 100 TB. Every operator has an exact DuckDB-SQL oracle twin in
__spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword profiles (language ID by stopword votes)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una"],
}

PUNCT_CLASS = r"[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text → empty array)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = n - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
    n = F.size(F.array_distinct(toks))
    return F.when(n <= 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation
    + presence of stopwords (C4-style signals, simplified)."""
    n = F.length(text)
    len_ok = F.when((n >= 100) & (n <= 20000), 1.0).otherwise(0.5)
    punct_ok = F.when(punct_ratio(text) < 0.1, 1.0).otherwise(0.5)
    stop_ok = F.when(stopword_ratio(text) > 0.01, 1.0).otherwise(0.5)
    return F.round((len_ok + punct_ok + stop_ok) / F.lit(3.0), 6)


def lang_votes(text: Column) -> dict[str, Column]:
    toks = F.array_distinct(tokens(F.lower(text)))
    return {lg: F.size(F.array_intersect(
                toks, F.array(*[F.lit(w) for w in ws])))
            for lg, ws in STOPWORDS.items()}


def lang_id(text: Column) -> Column:
    """argmax of stopword votes; ties broken by language-code order;
    all-zero → 'und'. Pure Column chain (JVM-side)."""
    votes = lang_votes(text)
    langs = sorted(votes)
    best = F.greatest(*[votes[lg] for lg in langs])
    expr = F.lit("und")
    for lg in reversed(langs):
        expr = F.when((votes[lg] == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return expr


def fingerprint_sha256(text: Column) -> Column:
    """Exact-content fingerprint (hex sha256) — matches DuckDB
    sha256(text)."""
    return F.sha2(text, 256)


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct text with the
    kept (minimum) id and the duplicate count. Map-side partial
    aggregation makes this a single shuffle of distinct hashes."""
    return (df.groupBy(fingerprint_sha256(F.col(text_col)).alias("fingerprint"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_copies")))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (df
            .withColumn("n_chars", F.length(t))
            .withColumn("n_tokens", token_count(t))
            .withColumn("punct_ratio", F.round(punct_ratio(t), 6))
            .withColumn("stopword_ratio", F.round(stopword_ratio(t), 6))
            .withColumn("quality", quality_score(t))
            .withColumn("lang_pred", lang_id(t)))


# GPT-2-style pre-tokenizer, restricted to the RE2-compatible subset
# (no lookahead — DuckDB's regexp engine is RE2, and the oracle twin
# must match): a token is a letter run, a digit run, or a punctuation
# run, each with an optional leading space; whitespace runs separate.
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens (letter/digit/punct runs) —
    the 'token budget' estimator for context-window packing."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def chunk_tokens(df: DataFrame, chunk_size: int, overlap: int = 0,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split each document into whitespace-token chunks of
    ``chunk_size`` with ``overlap`` tokens carried between consecutive
    chunks — context-window packing for training pipelines.

    Narrow explode (no shuffle): chunk starts are a sequence with
    stride chunk_size−overlap; each chunk is a slice re-joined with
    single spaces. The last chunk may be short; step > 0 enforced."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.lit(0),
                   F.floor((n - 1) / F.lit(step)).cast("int") * step),
        F.lit(step))
    chunk = F.explode(starts).alias("chunk_start")
    out = (df.select(id_col, toks.alias("_toks"), chunk)
           .select(id_col,
                   F.col("chunk_start"),
                   F.array_join(F.slice("_toks", F.col("chunk_start") + 1,
                                        chunk_size), " ")
                   .alias("chunk_text")))
    return (out.withColumn(
        "n_chunk_tokens",
        F.when(F.length("chunk_text") == 0, 0)
         .otherwise(F.size(F.split("chunk_text", r"\s+")))))


# ------------------------------------------------------------ PII scrub

# Patterns chosen for cross-engine (Java regex / RE2) parity: no
# lookaround, no backreferences, leftmost-greedy in both. IPv4 is
# syntactic (no 0-255 range check — range-checking in regex needs
# alternations both engines handle, but the curation convention is to
# over-redact); phone is international-format-only to avoid swallowing
# arbitrary digit runs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{7,15}\b"


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training corpora: replace emails / IPv4s /
    international phone numbers with typed placeholders and count each
    class. Pure Column regexps — a narrow zero-shuffle map that
    streams at 100 TB; the replacement order (email → ip → phone) is
    fixed so counts are taken on the ORIGINAL text and redaction is
    deterministic."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
            PII_IPV4, "<IP>"),
        PII_PHONE, "<PHONE>")
    return (df
            .withColumn("n_emails",
                        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0)))
            .withColumn("n_ips",
                        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), 0)))
            .withColumn("n_phones",
                        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), 0)))
            .withColumn("scrubbed_text", scrubbed))


# ---------------------------------------------------- URL canonicalize

_TRACKING_PARAMS = ("utm_[a-z]+", "gclid", "fbclid", "msclkid",
                    "ref_src", "mc_cid", "mc_eid")


def canonical_url(url: Column) -> Column:
    """Crawl-dedup URL canonicalization — pure Column regexps:
    lowercase scheme+host, drop the fragment, strip tracking query
    params (utm_*, gclid, fbclid, …), drop an empty '?', collapse a
    trailing slash on non-root paths, and default-port removal. Two
    pages differing only in these never differ in content, so
    grouping by canonical_url is the standard first dedup pass of a
    crawl pipeline (narrow, zero shuffle until the groupBy)."""
    u = F.regexp_replace(url, r"#.*$", "")             # fragment
    # lowercase scheme://host (leave path/query case alone)
    u = F.concat(F.lower(F.regexp_extract(u, r"^([^/]*//[^/]*)", 1)),
                 F.regexp_replace(u, r"^[^/]*//[^/]*", ""))
    # default ports — anchored to the authority (scheme://host:PORT)
    # so ':80'/':443' inside a path segment or query value survives
    # (http://h/p:80/q must NOT become http://h/p/q)
    u = F.regexp_replace(
        u, r"^([a-z][a-z0-9+.-]*://[^/?#:]+):(80|443)([/?#]|$)",
        r"$1$3")
    pat = "|".join(_TRACKING_PARAMS)
    u = F.regexp_replace(u, rf"([?&])({pat})=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"/\?", "?")               # slash before query
    u = F.regexp_replace(u, r"[?&]+$", "")             # dangling ? / &
    u = F.regexp_replace(u, r"\?&", "?")               # ?&rest → ?rest
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"(.)/$", r"$1")           # trailing slash
    return u


def dedup_by_canonical_url(df: DataFrame,
                           url_col: str = "url") -> DataFrame:
    """Keep one row per canonical URL (the lexicographically-first
    original URL wins — deterministic): one map-side-combined
    groupBy, the standard crawl first-pass dedup."""
    c = canonical_url(F.col(url_col)).alias("canonical_url")
    keep = (df.select(c, F.col(url_col))
            .groupBy("canonical_url")
            .agg(F.min(url_col).alias(url_col)))
    return df.join(keep, url_col, "left_semi")
