"""Span-level duplicate detection: duplicated character windows across docs.

Doc-level dedup (exact/minhash/simhash in this package) misses the common
training-data failure where two otherwise-different documents share a large
verbatim region — boilerplate licenses, quoted passages, copied functions.
The exact tool for that is suffix-array substring dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better"); a suffix array
over 100 TB doesn't distribute naturally, so this module implements the
classic fingerprint-sampling alternative (MOSS/winnowing family): hash every
``span_chars``-wide window, keep the content-defined sample of windows whose
hash ≡ 0 (mod ``sample_mod``), and report sampled windows that appear in ≥
``min_docs`` distinct documents.

Content-defined sampling (not striding) is what makes this alignment-
invariant: whether a copied region starts at byte 3 or byte 3000 of its host
document, the SAME windows inside it are selected, so copies always collide.
A duplicated region of length L yields ~(L - span_chars)/sample_mod anchors
in expectation; regions ≳ span_chars + 2·sample_mod are detected with high
probability, shorter ones fade out smoothly.

Scale: the window-hash stage is embarrassingly parallel per doc (the corpus
is hash-spread across executors first — single-file parquet inputs otherwise
digest on one core); sampling divides the shuffled anchor volume by
``sample_mod``; the duplicate count is one uniform hash aggregation, and the
join-back is uniform on the same key. Nothing is quadratic: output size is
bounded by total sampled anchors, not candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minhash import _gram_hash, _spread, hash60_sql


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    span_chars: int = 48,
    sample_mod: int = 4,
    hasher: str = "md5",
    min_docs: int = 2,
    repartition: int | None = None,
) -> DataFrame:
    """Sampled duplicated spans: one row per (doc, position) whose
    ``span_chars``-window hash is shared by ≥ ``min_docs`` distinct docs.

    Returns columns ``(id_col, pos, span_hash, n_docs)`` — ``pos`` is the
    1-based character offset of the window, ``n_docs`` how many distinct
    documents contain it. Downstream removal cuts [pos, pos+span_chars) and
    merges adjacent hits. Docs shorter than ``span_chars`` contribute their
    whole text as a single window (consistent with the shingle operators).

    Exact DuckDB twin: :func:`duplicated_spans_sql` (``hasher`` must be
    md5/sha256 for oracle parity; xxhash64 is the fast non-oracle path).
    """
    if span_chars < 2 or sample_mod < 1 or min_docs < 2:
        raise ValueError("span_chars >= 2, sample_mod >= 1, min_docs >= 2 required")
    df = _spread(docs.select(id_col, text_col), id_col, repartition)
    n_pos = F.greatest(F.length(text_col) - F.lit(span_chars - 1), F.lit(1))
    window = lambda i: F.col(text_col).substr(i, F.lit(span_chars))  # noqa: E731
    sampled = F.filter(
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.struct(
                i.cast("int").alias("p"), _gram_hash(window(i), hasher).alias("h")
            ),
        ),
        lambda s: s["h"] % sample_mod == 0,  # hash60 >= 0: % and pmod agree
    )
    anchors = (
        df.select(F.col(id_col), F.explode(sampled).alias("a"))
        .select(id_col, F.col("a.p").alias("pos"), F.col("a.h").alias("span_hash"))
    )
    counts = (
        anchors.groupBy("span_hash")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return anchors.join(counts, "span_hash").select(id_col, "pos", "span_hash", "n_docs")


def duplicated_spans_sql(
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    span_chars: int = 48,
    sample_mod: int = 4,
    hasher: str = "md5",
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`duplicated_spans` — bit-identical output."""
    h = hash60_sql(f"substr({text_col}, i, {span_chars})", hasher)
    return f"""
WITH anchors AS (
  SELECT {id_col}, CAST(a['p'] AS INT) AS pos, a['h'] AS span_hash
  FROM (
    SELECT {id_col},
           unnest(list_filter(
             list_transform(
               generate_series(1, greatest(length({text_col}) - {span_chars - 1}, 1)),
               i -> {{'p': i, 'h': {h}}}),
             s -> s['h'] % {sample_mod} = 0)) AS a
    FROM {docs_table}
  )
), counts AS (
  SELECT span_hash, CAST(count(DISTINCT {id_col}) AS BIGINT) AS n_docs
  FROM anchors GROUP BY span_hash HAVING count(DISTINCT {id_col}) >= {min_docs}
)
SELECT {id_col}, pos, span_hash, n_docs
FROM anchors JOIN counts USING (span_hash)
"""
