"""Text-analysis column functions for training-data pipelines.

Token counting, quality scoring, language-ID (marker-word heuristic) and
document fingerprinting — everything is built from JVM-side
``pyspark.sql.functions`` (whole-stage codegen, zero Python in the hot
path). Each function has an exactly-mirrored SQL form (generated from the
same Python constants) so the DuckDB oracle computes identical values.

At 100 TB these are narrow projections over the ``documents`` scan —
column pruning means the scan reads only ``text`` (+key), and no shuffle
is involved at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker stopwords per language; priority order breaks score ties.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "with", "a"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "zeigt", "alle"],
    "es": ["el", "los", "las", "es", "un", "una", "muestra", "todos", "crecimiento"],
    "fr": ["le", "la", "les", "et", "est", "dans", "une", "des", "tous"],
    "zh": ["的", "是", "在", "了", "和"],
}
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]

_WS = r"\s+"


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + "]"


# ------------------------------------------------------------ token count

def tokens_col(text: str = "text") -> Column:
    return F.split(F.trim(F.col(text)), _WS)


def token_count_col(text: str = "text") -> Column:
    """Whitespace token count (BPE-ish subword estimate = chars/4 is
    provided separately in token_estimate_col)."""
    return F.size(tokens_col(text))


TOKEN_COUNT_SQL = "len(regexp_split_to_array(trim(text), '\\s+'))"


def token_estimate_col(text: str = "text") -> Column:
    """BPE-style subword-count estimate: ceil(chars / 4)."""
    return F.ceil(F.length(F.col(text)) / 4).cast("long")


TOKEN_ESTIMATE_SQL = "CAST(ceil(length(text) / 4.0) AS BIGINT)"


# ---------------------------------------------------------- quality score

def quality_score_col(text: str = "text") -> Column:
    """Deterministic quality heuristic in basis points [0, 1000]:
    400·min(n_tokens/100, 1) + 300·min(stopword_ratio·5, 1)
    + 300·min(avg_token_len/8, 1).

    Computed with INTEGER arithmetic only (floor division) so the value is
    bit-identical across engines — float accumulation order flips rounded
    results at boundary values, integer division cannot.
    """
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = f"split(trim({text}), '\\\\s+')"
    return F.expr(
        f"CAST(4 * least(size({toks}), 100) "
        f"+ (300 * least(5 * size(filter({toks}, t -> lower(t) IN ({stoplist}))), "
        f"size({toks}))) DIV size({toks}) "
        f"+ (300 * least(length({text}), 8 * size({toks}))) DIV (8 * size({toks})) "
        f"AS BIGINT)"
    )


QUALITY_SCORE_SQL = (
    "4 * least(len(regexp_split_to_array(trim(text), '\\s+')), 100) + "
    "(300 * least(5 * len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
    f"t -> list_contains({_sql_list(STOPWORDS)}, lower(t)))), "
    "len(regexp_split_to_array(trim(text), '\\s+')))) // "
    "len(regexp_split_to_array(trim(text), '\\s+')) + "
    "(300 * least(length(text), 8 * len(regexp_split_to_array(trim(text), '\\s+')))) // "
    "(8 * len(regexp_split_to_array(trim(text), '\\s+')))"
)


# -------------------------------------------------------------- language id

def lang_scores_col(text: str = "text") -> dict[str, Column]:
    toks = F.array_distinct(F.transform(tokens_col(text), F.lower))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id_col(text: str = "text") -> Column:
    """argmax of marker hits; ties resolved by LANG_PRIORITY; no hits → 'und'."""
    scores = lang_scores_col(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql() -> str:
    toks = "list_distinct([lower(t) for t in regexp_split_to_array(trim(text), '\\s+')])"
    score = {
        lang: f"len(list_intersect({toks}, {_sql_list(words)}))"
        for lang, words in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(score[lg] for lg in LANG_PRIORITY) + ")"
    case = "CASE "
    for lang in LANG_PRIORITY:
        case += f"WHEN {score[lang]} = {best} AND {best} > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return case


# -------------------------------------------------------------- fingerprint

def fingerprint_col(text: str = "text") -> Column:
    """Content fingerprint: md5 of lowercased, whitespace-collapsed text.
    md5 (not xxhash64) because it is bit-identical across engines."""
    return F.md5(F.regexp_replace(F.lower(F.col(text)), _WS, " "))


FINGERPRINT_SQL = "md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


# ------------------------------------------------------ winnowing (rolling)

WINNOW_K = 8   # k-gram length (characters)
WINNOW_W = 16  # winnowing window (hashes)


def winnow_fp_frame(docs, text: str = "text", k: int = WINNOW_K, w: int = WINNOW_W):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every k-char gram (rolling positions), keep the MINIMUM hash of each
    w-hash window, emit the distinct sorted selection →
    (doc_id, wfp string, n_fp).

    The guarantee (pinned by test): any substring match of length
    >= w + k - 1 between two documents shares at least one selected
    fingerprint — the content-defined sampling used for copy/plagiarism
    detection, complementing t04's whole-document hash.

    Engine-portable: per-gram hash is the first 8 hex chars of md5
    (lexical min == numeric min on fixed-width lowercase hex — the same
    trick as sampling.rate_to_hex_threshold), so the DuckDB oracle
    reproduces it bit-for-bit. The gram-hash array is HOISTED into its
    own projection — computed once per position, not once per window
    (Catalyst lambda bodies don't share subexpressions; SURVEY §8).
    JVM-only; no shuffle.
    """
    h_expr = (
        f"CASE WHEN length({text}) - {k} + 1 >= 1 THEN "
        f"transform(sequence(1, length({text}) - {k} + 1), "
        f"i -> substring(md5(substring({text}, i, {k})), 1, 8)) "
        f"ELSE array() END"
    )
    fp_expr = (
        f"CASE WHEN size(_h) - {w} + 1 >= 1 THEN "
        f"array_sort(array_distinct(transform(sequence(1, size(_h) - {w} + 1), "
        f"j -> array_min(slice(_h, j, {w}))))) "
        f"ELSE array() END"
    )
    return (
        docs.select("doc_id", F.expr(h_expr).alias("_h"))
        .select("doc_id", F.expr(fp_expr).alias("_fp"))
        .select(
            "doc_id",
            F.concat_ws(",", "_fp").alias("wfp"),
            F.size("_fp").alias("n_fp"),
        )
    )


def winnow_fp_sql(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    """DuckDB oracle mirroring winnow_fp_frame exactly."""
    return (
        "SELECT doc_id, "
        # COALESCE: string_agg of an empty list is NULL in DuckDB while
        # Spark's concat_ws of an empty array is '' — align on ''
        f"COALESCE(list_aggregate(CASE WHEN len(h) - {w} + 1 >= 1 THEN "
        f"list_sort(list_distinct(list_transform(generate_series(1, len(h) - {w} + 1), "
        f"j -> list_min(h[j : j + {w} - 1])))) ELSE [] END, 'string_agg', ','), '') AS wfp, "
        f"len(CASE WHEN len(h) - {w} + 1 >= 1 THEN "
        f"list_distinct(list_transform(generate_series(1, len(h) - {w} + 1), "
        f"j -> list_min(h[j : j + {w} - 1]))) ELSE [] END) AS n_fp "
        "FROM (SELECT doc_id, "
        f"CASE WHEN length(text) - {k} + 1 >= 1 THEN "
        f"list_transform(generate_series(1, length(text) - {k} + 1), "
        f"i -> substr(md5(substr(text, i, {k})), 1, 8)) ELSE [] END AS h "
        "FROM documents)"
    )


REPETITION_TOP_NS = (2, 3, 4)
REPETITION_DUP_NS = (5, 6, 7, 8, 9, 10)


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Gopher/MassiveText repetition quality signals per doc — the FULL
    published n-gram rule set (public rules, Rae et al. 2021 §A1.1):

    - ``top_{2,3,4}gram_frac``: tokens covered by the single most
      frequent token n-gram, as a fraction of the doc's tokens
      (``max_count · n / n_tokens``; overlap not deduped, matching the
      published top-n-gram rule — values can exceed 1 on periodic text).
    - ``dup_{5..10}gram_char_frac``: characters inside DUPLICATED token
      n-grams as a fraction of total token characters, with overlapping
      occurrences counted ONCE (token-position-level dedup; separator
      whitespace excluded from both numerator and denominator).

    High values mark boilerplate/spam for training-data filtering.

    Shape: all top-ns explode into ONE partial-aggregated (doc, n, gram)
    shuffle; the dup-ns share one windowed count + a position-distinct +
    a length join. Shuffle volume is O(tokens · |ns|), map-side
    combined; no per-row Python. (At 100 TB these per-doc signals could
    also fold into the fused per-doc Arrow pass with zero shuffle; the
    JVM-columnar form here keeps Python out of the hot path.)
    """
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text)), r"\s+")
    base = docs.select(F.col(id_col), toks.alias("_toks")).select(
        id_col,
        "_toks",
        F.size("_toks").alias("n_tokens"),
        F.expr(
            "aggregate(transform(_toks, t -> length(t)), 0L, (a, x) -> a + x)"
        ).alias("n_chars"),
    )

    def grams(n: int):
        # NON-distinct n-grams (counts matter here); tokenization hoisted
        return F.expr(
            f"transform(sequence(0, greatest(size(_toks) - {n}, 0)), "
            f"i -> concat_ws(' ', slice(_toks, i + 1, {n})))"
        )

    # ---- top n-gram token coverage: one union, one shuffle for all n
    tg = None
    for n in REPETITION_TOP_NS:
        part = base.select(
            id_col, "n_tokens", F.lit(n).alias("n"), F.explode(grams(n)).alias("g")
        )
        tg = part if tg is None else tg.unionByName(part)
    top_max = (
        tg.groupBy(id_col, "n_tokens", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "n_tokens", "n")
        .agg(F.max("c").alias("max_c"))
    )
    top_wide = top_max.groupBy(id_col, "n_tokens").pivot(
        "n", [str(n) for n in REPETITION_TOP_NS]
    ).agg(F.first("max_c"))

    # ---- duplicated n-gram char coverage: shared window/distinct/join
    dg = None
    for n in REPETITION_DUP_NS:
        part = base.select(
            id_col, F.lit(n).alias("n"), F.posexplode(grams(n)).alias("i", "g")
        )
        dg = part if dg is None else dg.unionByName(part)
    covered = (
        dg.withColumn("c", F.count(F.lit(1)).over(Window.partitionBy(id_col, "n", "g")))
        .filter(F.col("c") > 1)
        .select(id_col, "n", F.explode(F.expr("sequence(i, i + n - 1)")).alias("pos"))
        .distinct()
    )
    toklen = base.select(id_col, F.posexplode("_toks").alias("pos", "t")).select(
        id_col, "pos", F.length("t").alias("tl")
    )
    dup_wide = (
        covered.join(toklen, [id_col, "pos"])
        .groupBy(id_col, "n")
        .agg(F.sum("tl").alias("cov"))
        .groupBy(id_col)
        .pivot("n", [str(n) for n in REPETITION_DUP_NS])
        .agg(F.first("cov"))
    )

    out_cols = [F.col(id_col), F.col("n_tokens"), F.col("n_chars")]
    out_cols += [
        F.round(F.col(str(n)) * float(n) / F.col("n_tokens"), 4).alias(
            f"top_{n}gram_frac"
        )
        for n in REPETITION_TOP_NS
    ]
    out_cols += [
        F.round(
            F.coalesce(F.col(f"d{n}"), F.lit(0)) * 1.0 / F.col("n_chars"), 4
        ).alias(f"dup_{n}gram_char_frac")
        for n in REPETITION_DUP_NS
    ]
    dup_renamed = dup_wide.select(
        id_col, *[F.col(str(n)).alias(f"d{n}") for n in REPETITION_DUP_NS]
    )
    return (
        base.select(id_col, "n_tokens", "n_chars")
        .join(top_wide.drop("n_tokens"), id_col)
        .join(dup_renamed, id_col, "left")
        .select(*out_cols)
    )


def doc_dup_line_stats(docs: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Gopher §A1.1 rules 1-4 — WITHIN-document duplicate structure:
    duplicate line fraction, duplicate paragraph fraction (instances
    beyond the first occurrence over total instances), and their
    character fractions (characters of the duplicate instances over all
    unit characters; separators excluded both sides). Paragraphs split
    on blank lines (``\\n\\n``), lines on ``\\n``.

    Pure per-row higher-order column expressions — ZERO shuffle, whole
    corpus scales embarrassingly; the cross-document complement is
    operators.dedup.line_dedup."""

    def unit_stats(sep: str, name: str) -> list[Column]:
        arr = F.split(F.col(text), sep)
        dist = F.array_distinct(arr)
        n, nd = F.size(arr), F.size(dist)
        ch = F.expr(
            f"aggregate(split({text}, '{sep}'), 0L, (a, x) -> a + length(x))"
        )
        chd = F.expr(
            f"aggregate(array_distinct(split({text}, '{sep}')), 0L, (a, x) -> a + length(x))"
        )
        return [
            F.round((n - nd) * 1.0 / n, 4).alias(f"dup_{name}_frac"),
            F.round(
                F.when(ch > 0, (ch - chd) * 1.0 / ch).otherwise(F.lit(0.0)), 4
            ).alias(f"dup_{name}_char_frac"),
        ]

    return docs.select(
        F.col(id_col),
        *unit_stats("\n", "line"),
        *unit_stats("\n\n", "para"),
    )


DOC_DUP_LINE_SQL = (
    "SELECT doc_id, "
    "ROUND((len(ls) - len(list_distinct(ls))) * 1.0 / len(ls), 4) AS dup_line_frac, "
    "ROUND(CASE WHEN lc > 0 THEN (lc - lcd) * 1.0 / lc ELSE 0 END, 4) AS dup_line_char_frac, "
    "ROUND((len(ps) - len(list_distinct(ps))) * 1.0 / len(ps), 4) AS dup_para_frac, "
    "ROUND(CASE WHEN pc > 0 THEN (pc - pcd) * 1.0 / pc ELSE 0 END, 4) AS dup_para_char_frac "
    "FROM (SELECT doc_id, ls, ps, "
    "CAST(list_aggregate(list_transform(ls, x -> length(x)), 'sum') AS BIGINT) AS lc, "
    "CAST(list_aggregate(list_transform(list_distinct(ls), x -> length(x)), 'sum') AS BIGINT) AS lcd, "
    "CAST(list_aggregate(list_transform(ps, x -> length(x)), 'sum') AS BIGINT) AS pc, "
    "CAST(list_aggregate(list_transform(list_distinct(ps), x -> length(x)), 'sum') AS BIGINT) AS pcd "
    "FROM (SELECT doc_id, string_split({t}, chr(10)) AS ls, "
    "str_split_regex({t}, chr(10) || chr(10)) AS ps FROM {src}))"
)


# Gopher §A1.1 quality-filter rules (the non-repetition set). The 8
# published stop words of the "contains ≥2 stop words" rule:
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_stats(docs: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Gopher §A1.1 quality rules as per-doc stats + the published
    pass/fail decision (Rae et al. 2021): word count in [50, 100k],
    mean word length in [3, 10], symbol-to-word ratio ('#' chars +
    '...' occurrences) ≤ 0.1, ≤ 90% of lines bullet-led ('-', '*', '•'),
    ≤ 30% of lines ellipsis-ended, ≥ 80% of words containing an
    alphabetic char, and ≥ 2 distinct Gopher stop words present.

    Pure JVM column expressions over the words/lines arrays — zero
    shuffle; the repetition rules live in repetition_stats (cross-gram)
    and doc_dup_line_stats (within-doc structure).

    The words/lines/lowered-words arrays are HOISTED into their own
    projection: referencing split(...) inside a higher-order lambda
    (the stop-word containment check iterates the stopword array)
    would re-split and re-lower the whole text once per stopword."""
    t = F.col(text)
    docs = docs.select(
        F.col(id_col),
        t.alias("_t"),
        F.split(F.trim(t), r"\s+").alias("_words"),
        F.split(t, "\n").alias("_lines"),
    ).withColumn("_lw", F.transform(F.col("_words"), lambda w: F.lower(w)))
    t = F.col("_t")
    words = F.col("_words")
    lines = F.col("_lines")
    n_words = F.size(words)
    n_lines = F.size(lines)
    wchars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    mean_wl = wchars * 1.0 / n_words
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis) * 1.0 / n_words
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).startswith("-")
                | F.trim(ln).startswith("*")
                | F.trim(ln).startswith("•"),
            )
        )
        * 1.0
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda ln: F.trim(ln).endswith("..."))) * 1.0 / n_lines
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))) * 1.0 / n_words
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda sw: F.array_contains(F.col("_lw"), sw),
        )
    )
    passes = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_word_ratio"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stop_word_hits"),
        passes.alias("passes_gopher_quality"),
    )


def gopher_quality_sql(src: str, text: str = "text") -> str:
    """DuckDB mirror of gopher_quality_stats over ``src`` (a relation
    with doc_id + ``text``); pass/fail computed on UNROUNDED values in
    both engines."""
    sw = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return (
        "SELECT doc_id, n_words, ROUND(mean_wl, 4) AS mean_word_len, "
        "ROUND(symbol_ratio, 4) AS symbol_word_ratio, "
        "ROUND(bullet_frac, 4) AS bullet_line_frac, "
        "ROUND(ellipsis_frac, 4) AS ellipsis_line_frac, "
        "ROUND(alpha_frac, 4) AS alpha_word_frac, "
        "CAST(stop_hits AS INT) AS stop_word_hits, "
        "(n_words >= 50 AND n_words <= 100000 AND mean_wl >= 3.0 AND mean_wl <= 10.0 "
        "AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3 "
        "AND alpha_frac >= 0.8 AND stop_hits >= 2) AS passes_gopher_quality "
        "FROM (SELECT doc_id, len(ws) AS n_words, "
        "list_aggregate(list_transform(ws, x -> length(x)), 'sum') * 1.0 / len(ws) AS mean_wl, "
        f"((length({text}) - length(replace({text}, '#', ''))) + "
        f"(length({text}) - length(replace({text}, '...', ''))) / 3) * 1.0 / len(ws) AS symbol_ratio, "
        "len(list_filter(ls, l -> starts_with(trim(l), '-') OR starts_with(trim(l), '*') "
        "OR starts_with(trim(l), '•'))) * 1.0 / len(ls) AS bullet_frac, "
        "len(list_filter(ls, l -> ends_with(trim(l), '...'))) * 1.0 / len(ls) AS ellipsis_frac, "
        "len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) * 1.0 / len(ws) AS alpha_frac, "
        f"len(list_filter([{sw}], sw -> list_contains(list_transform(ws, w -> lower(w)), sw))) AS stop_hits "
        f"FROM (SELECT doc_id, {text}, "
        f"regexp_split_to_array(trim({text}), '\\s+') AS ws, "
        f"string_split({text}, chr(10)) AS ls FROM {src}))"
    )


# PII scrubbing (C4/CCNet-style preprocessing). Patterns restricted to
# syntax shared by Java regex (Spark) and RE2 (DuckDB): character
# classes, bounded repeats, \b — no lookarounds.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def redact_pii(docs: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Redact emails and IPv4 literals → (id, n_emails, n_ips,
    redacted_md5). Counts are pre-redaction match counts; the md5
    fingerprints the redacted text (emails replaced before IPs, both
    with fixed tags — deterministic, so the same doc always redacts to
    the same bytes). JVM regexp only — no Python in the row path."""
    t = F.col(text)
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )
