"""Benchmark decontamination — flag training docs that share n-grams with an
evaluation set.

The standard pretraining-hygiene step (the GPT-3/PaLM-style "13-gram
overlap" rule): any training document containing an n-gram that also occurs
in a benchmark/eval document is contaminated and must be dropped (or at
least audited) before training, or eval scores are inflated.

Physical shape (the 100 TB plan): shingle the (small) benchmark set into a
distinct gram-hash relation, shingle the corpus, and LEFT SEMI join corpus
grams against benchmark grams — Catalyst broadcasts the benchmark side when
it fits (an eval suite is MBs against a 100 TB corpus), making the check a
map-side filter at scan speed; grams are 60-bit digest hashes (hash60), so
the broadcast is 8 bytes per distinct benchmark gram. Per-doc aggregation
then counts distinct matching grams. No UDF anywhere; byte-identical DuckDB
twin (:func:`contamination_sql`) so the operator is hash-oracle-checked.

Word-level grams (``mode="word"``, the published rule) tokenize on
whitespace after lowercasing; char-level (``mode="char"``) reuses the
near-dup shingler for script-agnostic matching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .minhash import hash60, hash60_sql, shingles, _shingles_sql


# Explicit ASCII whitespace class, NOT \s: Java regex (Spark) counts \x0B
# (vertical tab) and Unicode spaces differently from RE2 (DuckDB), so a \s
# split would tokenize 'a\x0Bb' as two words in Spark and one in DuckDB —
# silently breaking the byte-identical oracle on such corpora (review r3
# finding, verified in both engines). Enumerating the class pins identical
# semantics: space, tab, LF, CR, FF, VT; Unicode whitespace (NBSP etc.) is
# deliberately NOT a separator in either engine.
_WS_CLASS = "[ \\t\\n\\r\\f\\x0B]+"


def _word_grams(text: Column, n: int, hasher: str) -> Column:
    """Distinct hashed word n-grams (lowercased, ASCII-whitespace-split)."""
    words = F.split(F.lower(F.trim(text)), _WS_CLASS)
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), k)
    grams = F.transform(
        idx, lambda i: hash60(F.array_join(F.slice(words, i, n), " "), hasher)
    )
    return F.array_distinct(grams)


def _word_grams_sql(text_expr: str, n: int, hasher: str) -> str:
    # same explicit class as _WS_CLASS (RE2 spelling) — see comment above
    words = "string_split_regex(lower(trim(" + text_expr + ")), '[ \\t\\n\\r\\f\\x0B]+')"
    gram = f"array_to_string(list_slice({words}, i, i + {n - 1}), ' ')"
    return (
        "list_distinct(list_transform("
        f"generate_series(1, greatest(len({words}) - {n - 1}, 1)), "
        f"i -> {hash60_sql(gram, hasher)}))"
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
    mode: str = "word",
    hasher: str = "md5",
    min_matches: int = 1,
) -> DataFrame:
    """(id, contaminated_grams) for corpus docs sharing ≥ ``min_matches``
    distinct n-grams with the benchmark set.

    Only flagged docs are returned — anti-join the result against the
    corpus to drop them, or inspect counts first. ``n=13`` word-grams is
    the published decontamination rule; short benchmark prompts whose whole
    text is shorter than n grams still contribute their single
    whole-text gram (the shingler's short-input rule), so tiny eval items
    are never silently unprotected."""
    if mode == "word":
        corpus_grams = _word_grams(F.col(text_col), n, hasher)
        bench_grams = _word_grams(F.col(bench_text_col or text_col), n, hasher)
    elif mode == "char":
        corpus_grams = shingles(text_col, n, hasher=hasher)
        bench_grams = shingles(bench_text_col or text_col, n, hasher=hasher)
    else:
        raise ValueError(f"unknown mode {mode!r} (word/char)")
    bench = (
        benchmark.select(F.explode(bench_grams).alias("h")).distinct()
    )
    hits = (
        corpus.select(F.col(id_col).alias("__id"), F.explode(corpus_grams).alias("h"))
        .join(bench, "h", "leftsemi")  # benchmark side broadcasts when small
        .groupBy("__id")
        .agg(F.count("*").alias("contaminated_grams"))
        .filter(F.col("contaminated_grams") >= min_matches)
    )
    return hits.select(F.col("__id").alias(id_col), "contaminated_grams")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    **kwargs,
) -> DataFrame:
    """Corpus minus contaminated docs (broadcast anti-join on the flagged
    ids — the drop step of the hygiene rule)."""
    id_col = kwargs.get("id_col", "doc_id")
    flagged = contamination(corpus, benchmark, **kwargs).select(id_col)
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")


def contamination_sql(
    corpus_table: str,
    benchmark_sql: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    mode: str = "word",
    hasher: str = "md5",
    min_matches: int = 1,
) -> str:
    """DuckDB oracle twin of :func:`contamination`."""
    if mode == "word":
        cg = _word_grams_sql(text_col, n, hasher)
        bg = _word_grams_sql(bench_text_col, n, hasher)
    elif mode == "char":
        cg = _shingles_sql(text_col, n, hasher)
        bg = _shingles_sql(bench_text_col, n, hasher)
    else:
        raise ValueError(f"unknown mode {mode!r} (word/char)")
    return f"""
WITH bench AS (
  SELECT DISTINCT unnest({bg}) AS h FROM ({benchmark_sql}) __b
),
corpus_grams AS (
  SELECT {id_col} AS id, unnest({cg}) AS h FROM {corpus_table}
)
SELECT id AS {id_col}, CAST(count(*) AS BIGINT) AS contaminated_grams
FROM corpus_grams WHERE h IN (SELECT h FROM bench)
GROUP BY id HAVING count(*) >= {min_matches}
"""
