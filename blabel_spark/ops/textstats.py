"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.  All Catalyst expressions (whole-stage codegen);
each has a DuckDB-expressible twin so the driver can cross-check values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-ratio heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "and"],
    "es": ["el", "la", "los"],
    "fr": ["le", "la", "les"],
}


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of ``needle`` via the replace-length trick — identical
    non-overlapping left-to-right semantics in Spark and DuckDB."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return ((F.length(padded)
             - F.length(F.replace(padded, F.lit(f" {needle} "), F.lit(""))))
            / (len(needle) + 2)).cast("int")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count, char counts, punctuation count/ratio."""
    text = F.col(text_col)
    n_tokens = F.size(F.filter(F.split(text, " "),
                               lambda t: F.length(t) > 0))
    n_punct = F.length(F.regexp_replace(text, r"[^.!,?;:]", ""))
    return docs.select(
        "doc_id",
        F.length(text).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        F.round(n_punct / F.greatest(F.length(text), F.lit(1)), 6)
        .alias("punct_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristic: favour mid-length docs with low
    punctuation density and a healthy stopword ratio."""
    stats = token_stats(docs, text_col)
    en_stops = sum((_count_occurrences(F.col(text_col), w)
                    for w in LANG_STOPWORDS["en"]), F.lit(0))
    stops = docs.select("doc_id", en_stops.alias("n_stopwords"))
    return (
        stats.join(stops, "doc_id")
        .select(
            "doc_id",
            F.round(
                F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
                + F.round(F.col("n_stopwords")
                          / F.greatest(F.col("n_tokens"), F.lit(1)), 6) * 0.3
                + (1.0 - F.least(F.col("punct_ratio") * 10, F.lit(1.0))) * 0.2,
                6).alias("quality"),
        )
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID over LANG_STOPWORDS; deterministic
    tie-break by language order en > es > fr."""
    text = F.col(text_col)
    scores = {lang: sum((_count_occurrences(text, w) for w in words),
                        F.lit(0))
              for lang, words in LANG_STOPWORDS.items()}
    pred = (F.when((scores["en"] >= scores["es"])
                   & (scores["en"] >= scores["fr"]), "en")
            .when(scores["es"] >= scores["fr"], "es")
            .otherwise("fr"))
    return docs.select("doc_id", pred.alias("lang_pred"),
                       *[scores[l].alias(f"score_{l}") for l in sorted(scores)])


# PII patterns shared by the Spark operator and its DuckDB twin: RE2-class
# regexes (no backrefs/lookaround) so both engines match identically
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone":
        r"(\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ]?[0-9]{4}",
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training corpora: emails / phone numbers / IPv4
    addresses replaced by typed placeholders, with per-document match
    counts for pipeline monitoring.  Pure codegen (regexp_count +
    regexp_replace, RE2-class patterns) — the 100 TB shape is a map-only
    pass with no shuffle at all.

    Order matters: emails are scrubbed before IPs so a host part cannot
    be re-matched; counts are taken on the ORIGINAL text.
    """
    text = F.col(text_col)
    out = text
    for name in ("email", "phone", "ip"):
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    cols = [F.regexp_count(text, F.lit(PII_PATTERNS[n])).alias(f"n_{n}")
            for n in ("email", "phone", "ip")]
    return docs.select("doc_id", out.alias("text_scrubbed"), *cols)


def fingerprint(docs: DataFrame, k: int = 8,
                text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5(min k-shingle hash || length) — a cheap,
    deterministic near-identity signature (rolling-hash family)."""
    text = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1)))
    min_sh = F.array_min(F.transform(idx, lambda i: F.md5(text.substr(i, F.lit(k)))))
    return docs.select(
        "doc_id",
        F.md5(F.concat(min_sh, F.lit("|"),
                       F.length(text).cast("string"))).alias("fingerprint"))
