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

Memory bound: the per-row window array is O(doc length) structs before the
sample filter (same shape as the shingle operators). Web/code documents
(KBs–low MBs) are fine; for pathological multi-MB rows split upstream — the
sampling makes split boundaries harmless (anchors are content-defined, so
only windows straddling a split point are lost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
        # feeds BOTH the count aggregation and the final join: without
        # materialization the per-window digest pass (the operator's dominant
        # CPU — one md5 per character position) runs twice, once under each
        # consumer (guide §1.2: don't compute things you throw away). The
        # anchor stream is skinny (id, pos, hash), far smaller than the text.
        .localCheckpoint()
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


def cut_spans(
    docs: DataFrame,
    hits: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    span_chars: int = 48,
) -> DataFrame:
    """Remove duplicated spans, keeping one canonical copy per span.

    ``hits`` is :func:`duplicated_spans` output. Policy (deterministic in any
    engine): the doc with the MIN id per span hash keeps its copy; every
    other occurrence becomes a cut interval ``[pos, pos + span_chars)``.
    Overlapping/adjacent intervals are merged per doc (gaps-and-islands over
    a window — pure Catalyst, shuffled once by doc id; hits are sparse, so
    this never rescans the corpus-sized text, only joins it in at the end).

    Returns ``(id_col, text_col, n_spans_cut, bytes_removed)`` for EVERY
    input doc — uncut docs pass through with 0/0. The relational formulation
    (running-max island detection + lag-based piece slicing + ordered
    re-concat) is chosen over an array fold because the DuckDB twin
    (:func:`cut_spans_sql`) is then a line-for-line transcription.
    """
    # hits is consumed twice (keeper election + cut derivation) and sits on
    # top of the digest-heavy window-hash pipeline — materialize it once
    # (auto-GC'd localCheckpoint, same pattern as minhash's shingle reuse)
    hits = hits.select(id_col, "pos", "span_hash").localCheckpoint()
    canonical = hits.groupBy("span_hash").agg(F.min(id_col).alias("__keeper"))
    cuts = (
        hits.join(canonical, "span_hash")
        .filter(F.col(id_col) != F.col("__keeper"))
        .select(
            id_col,
            F.col("pos").alias("s"),
            (F.col("pos") + F.lit(span_chars)).alias("e"),
        )
        .distinct()  # the same interval can arrive via several span hashes
    )
    w = Window.partitionBy(id_col).orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = cuts.withColumn(
        "__new_island", (prev_max_e.isNull() | (F.col("s") > prev_max_e)).cast("int")
    ).withColumn("__island", F.sum("__new_island").over(w))
    merged = islands.groupBy(id_col, "__island").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    # slice the kept pieces: [prev island's end, this island's start)
    w2 = Window.partitionBy(id_col).orderBy("s")
    pieces = merged.join(docs.select(id_col, text_col), id_col).select(
        id_col,
        F.col(text_col),
        F.col("s"),
        F.col("e"),
        F.coalesce(F.lag("e").over(w2), F.lit(1)).alias("cursor"),
        F.max("e").over(
            Window.partitionBy(id_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("last_e"),
    )
    rebuilt = pieces.groupBy(id_col).agg(
        F.concat(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("s", F.col(text_col).substr(F.col("cursor"), F.col("s") - F.col("cursor")).alias("piece"))
                        )
                    ),
                    lambda st: st["piece"],
                ),
                "",
            ),
            F.substring(F.first(text_col), F.first("last_e").cast("int"), 2**30),
        ).alias("__clean"),
        F.count(F.lit(1)).alias("n_spans_cut"),
    )
    out = (
        docs.select(id_col, text_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__clean"), F.col(text_col)).alias("__t"),
            F.coalesce(F.col("n_spans_cut"), F.lit(0)).cast("long").alias("n_spans_cut"),
            (
                F.octet_length(text_col)
                - F.octet_length(F.coalesce(F.col("__clean"), F.col(text_col)))
            ).cast("long").alias("bytes_removed"),
        )
    )
    return out.withColumnRenamed("__t", text_col)


def cut_spans_sql(
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    span_chars: int = 48,
    sample_mod: int = 4,
    hasher: str = "md5",
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`duplicated_spans` piped into :func:`cut_spans`."""
    hits = duplicated_spans_sql(
        docs_table, id_col, text_col,
        span_chars=span_chars, sample_mod=sample_mod, hasher=hasher, min_docs=min_docs,
    )
    return f"""
WITH hits AS ({hits}),
canonical AS (SELECT span_hash, min({id_col}) AS keeper FROM hits GROUP BY span_hash),
cuts AS (
  SELECT DISTINCT hits.{id_col}, pos AS s, pos + {span_chars} AS e
  FROM hits JOIN canonical USING (span_hash)
  WHERE hits.{id_col} <> canonical.keeper
),
islands AS (
  SELECT *, CAST(coalesce(s > max(e) OVER (
      PARTITION BY {id_col} ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), TRUE) AS INT) AS new_island
  FROM cuts
),
numbered AS (
  SELECT *, sum(new_island) OVER (
      PARTITION BY {id_col} ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM islands
),
merged AS (
  SELECT {id_col}, island, min(s) AS s, max(e) AS e
  FROM numbered GROUP BY {id_col}, island
),
pieces AS (
  SELECT m.{id_col}, d.{text_col}, m.s, m.e,
         coalesce(lag(m.e) OVER (PARTITION BY m.{id_col} ORDER BY m.s), 1) AS cursor,
         max(m.e) OVER (PARTITION BY m.{id_col}) AS last_e
  FROM merged m JOIN {docs_table} d USING ({id_col})
),
rebuilt AS (
  SELECT {id_col},
         string_agg(substr({text_col}, CAST(cursor AS INT), CAST(s - cursor AS INT)), '' ORDER BY s)
           || substr(any_value({text_col}), CAST(any_value(last_e) AS INT)) AS clean,
         CAST(count(*) AS BIGINT) AS n_spans_cut
  FROM pieces GROUP BY {id_col}
)
SELECT d.{id_col},
       coalesce(r.clean, d.{text_col}) AS {text_col},
       CAST(coalesce(r.n_spans_cut, 0) AS BIGINT) AS n_spans_cut,
       CAST(strlen(d.{text_col}) - strlen(coalesce(r.clean, d.{text_col})) AS BIGINT) AS bytes_removed
FROM {docs_table} d LEFT JOIN rebuilt r USING ({id_col})
"""
