"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (JVM-side, whole-stage codegen, no Python in the
hot path) and deliberately SQL-expressible so every one of them is
oracle-checkable in DuckDB. At 100 TB these run at scan speed with full column
pruning — the scan reads only the text column.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punct/stopword ratios), language ID (stopword-marker heuristic),
document fingerprinting (normalized-content hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word/number/symbol tokenizer — RE2-compatible (works in DuckDB too)
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# language marker stopwords (word-boundary regexes, RE2-safe)
LANG_MARKERS = {
    "en": "\\b(the|and|of|to|is|in|that|it|for|was)\\b",
    "de": "\\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\\b",
    "fr": "\\b(le|la|les|et|est|une|des|dans|pour|que)\\b",
    "es": "\\b(el|los|las|es|una|para|con|por|del|como)\\b",
}

STOPWORD_RE = LANG_MARKERS["en"]


def token_count(text: Column | str) -> Column:
    """BPE-ish token count via regex extraction."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0)))


def whitespace_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, "\\s+")))


def _marker_count(c: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score in [0, 1].

    Heuristics in the C4/Gopher tradition: length, alphabetic ratio,
    punctuation density, stopword ratio, mean word length — each a pure
    column expression. Score weights are fixed and documented so the DuckDB
    oracle reproduces them exactly (rounded to 6 dp)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(c, "[^.,;:!?]", ""))
    n_ws_tokens = whitespace_token_count(c)
    n_stop = _marker_count(c, STOPWORD_RE)

    nz = F.greatest(n_chars.cast("double"), F.lit(1.0))
    nt = F.greatest(n_ws_tokens.cast("double"), F.lit(1.0))
    alpha_ratio = n_alpha / nz
    punct_ratio = n_punct / nz
    stop_ratio = n_stop / nt
    mean_word_len = n_alpha.cast("double") / nt

    # composite: rewards alphabetic prose with some stopwords, sane word
    # length, light punctuation; penalizes very short docs
    length_term = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    word_len_term = F.lit(1.0) - F.least(
        F.abs(mean_word_len - F.lit(5.0)) / F.lit(5.0), F.lit(1.0)
    )
    score = (
        F.lit(0.3) * alpha_ratio
        + F.lit(0.25) * F.least(stop_ratio * F.lit(2.0), F.lit(1.0))
        + F.lit(0.2) * length_term
        + F.lit(0.15) * word_len_term
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0)))
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        F.round(alpha_ratio, 6).alias("q_alpha_ratio"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stop_ratio"),
        F.round(mean_word_len, 6).alias("q_mean_word_len"),
        F.round(score, 6).alias("q_score"),
    )


# the exact SQL twin of quality_features for DuckDB oracles
def quality_features_sql(text_col: str = "text") -> str:
    c = text_col
    return f"""
      length({c}) AS q_chars,
      round(length(regexp_replace({c}, '[^A-Za-z]', '', 'g')) / greatest(length({c}), 1.0), 6) AS q_alpha_ratio,
      round(length(regexp_replace({c}, '[^.,;:!?]', '', 'g')) / greatest(length({c}), 1.0), 6) AS q_punct_ratio,
      round(len(regexp_extract_all(lower({c}), '{STOPWORD_RE}'))
            / greatest(CASE WHEN length(trim({c})) = 0 THEN 0 ELSE len(regexp_split_to_array(trim({c}), '\\s+')) END, 1.0), 6) AS q_stop_ratio,
      round(length(regexp_replace({c}, '[^A-Za-z]', '', 'g'))
            / greatest(CASE WHEN length(trim({c})) = 0 THEN 0 ELSE len(regexp_split_to_array(trim({c}), '\\s+')) END, 1.0), 6) AS q_mean_word_len,
      round(0.3 * (length(regexp_replace({c}, '[^A-Za-z]', '', 'g')) / greatest(length({c}), 1.0))
          + 0.25 * least((len(regexp_extract_all(lower({c}), '{STOPWORD_RE}'))
                          / greatest(CASE WHEN length(trim({c})) = 0 THEN 0 ELSE len(regexp_split_to_array(trim({c}), '\\s+')) END, 1.0)) * 2.0, 1.0)
          + 0.2 * least(length({c}) / 500.0, 1.0)
          + 0.15 * (1.0 - least(abs(length(regexp_replace({c}, '[^A-Za-z]', '', 'g'))
                          / greatest(CASE WHEN length(trim({c})) = 0 THEN 0 ELSE len(regexp_split_to_array(trim({c}), '\\s+')) END, 1.0) - 5.0) / 5.0, 1.0))
          + 0.1 * (1.0 - least((length(regexp_replace({c}, '[^.,;:!?]', '', 'g')) / greatest(length({c}), 1.0)) * 5.0, 1.0)), 6) AS q_score
    """


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_guess") -> DataFrame:
    """n-gram/stopword-marker language ID over {en, de, fr, es}.

    Deterministic argmax with alphabetical tiebreak; 'und' (undetermined) when
    no marker fires. SQL twin: lang_id_sql."""
    c = F.col(text_col)
    counts = {lang: _marker_count(c, pat) for lang, pat in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)  # alphabetical tiebreak
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in langs:
        n = counts[lang]
        take = n > best_n  # strictly greater ⇒ first-alphabetical wins ties
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, n).otherwise(best_n)
    return df.withColumn(out_col, best)


def lang_id_sql(text_col: str = "text") -> str:
    cnt = {
        lang: f"len(regexp_extract_all(lower({text_col}), '{pat}'))"
        for lang, pat in LANG_MARKERS.items()
    }
    # same fold as lang_id: iterate alphabetically, strictly-greater replaces
    expr = "'und'"
    best_n = "0"
    for lang in sorted(LANG_MARKERS):
        expr = f"CASE WHEN {cnt[lang]} > {best_n} THEN '{lang}' ELSE {expr} END"
        best_n = f"greatest({cnt[lang]}, {best_n})"
    return expr


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: sha256 of casefolded, whitespace-collapsed text —
    catches trivially-reformatted duplicates. (Shingle-level near-dup lives in
    operators/minhash.py.)"""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))
    return F.sha2(normalized, 256)


FINGERPRINT_SQL = "sha256(trim(regexp_replace(lower({c}), '\\s+', ' ', 'g')))"


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Line-level repetition signals (the Gopher/C4-style repetition filters):

    - ``n_lines``: newline-split segment count
    - ``dup_line_ppm``: (n_lines − distinct_lines)·1e6 DIV n_lines — exact
      integer, 0 for fully-unique docs, → 1e6 as the doc degenerates to one
      repeated line
    - ``top_line_ppm``: share of the most frequent line, exact integer ppm —
      catches a doc that is 90% one boilerplate line even when other lines
      vary

    Pure Catalyst HOFs over one split (aliased once — the split and its
    distinct are non-cheap, so CollapseProject keeps them single-evaluated) —
    scan-speed, no shuffle, no UDF. All outputs are exact integers (DIV).
    SQL twin: :func:`repetition_features_sql`."""
    out = df.withColumn("__lines", F.split(F.col(text_col), "\n"))
    out = out.withColumn("__dlines", F.array_distinct(F.col("__lines")))
    lines, dlines = F.col("__lines"), F.col("__dlines")
    n = F.size(lines).cast("long")
    # most-frequent-line count: fold over the distinct lines, counting each
    # one's occurrences in the full list (n_distinct × n comparisons — fine
    # for document-sized line counts, deterministic in any engine)
    top = F.aggregate(
        dlines,
        F.lit(0).cast("long"),
        lambda acc, line: F.greatest(
            acc, F.size(F.filter(lines, lambda x: x == line)).cast("long")
        ),
    )
    return (
        out.withColumn("n_lines", n)
        .withColumn("__dup", (n - F.size(dlines).cast("long")) * F.lit(1_000_000))
        .withColumn("dup_line_ppm", F.expr("__dup DIV n_lines"))
        .withColumn("__top", top * F.lit(1_000_000))
        .withColumn("top_line_ppm", F.expr("__top DIV n_lines"))
        .drop("__lines", "__dlines", "__dup", "__top")
    )


def repetition_features_sql(text_col: str = "text") -> str:
    """DuckDB twin of :func:`repetition_features` as select-list SQL
    (string_split + list_distinct + the same fold arithmetic)."""
    lines = f"string_split({text_col}, chr(10))"
    n = f"len({lines})"
    top = (
        f"list_max(list_transform(list_distinct({lines}), "
        f"l -> len(list_filter({lines}, x -> x = l))))"
    )
    return (
        f"{n} AS n_lines, "
        f"(({n} - len(list_distinct({lines}))) * 1000000) // {n} AS dup_line_ppm, "
        f"({top} * 1000000) // {n} AS top_line_ppm"
    )
