"""End-to-end corpus curation: the composed keep/drop verdict.

The individual operators (quality features, near-dup clusters, benchmark
decontamination) each emit a signal; a real training-data pipeline applies
them as one ordered policy. :func:`curate_corpus` is that policy as a single
DataFrame plan: per document, the FIRST failing stage names the drop reason —

    1. ``low_quality``      q_score below threshold (C4/Gopher-style filter)
    2. ``near_duplicate``   not its duplicate-cluster's representative
    3. ``contaminated``     shares n-grams with the benchmark/eval set
    4. ``kept``             survives all three

The stage order mirrors practice (cheap content filters first, then dedup,
then hygiene) and makes drop accounting additive: stage counts sum to the
corpus size, and re-running with one stage relaxed only ever moves docs
between adjacent buckets.

Scale: the three signals are independent single-pass relations keyed by doc
id (quality is scan-speed Catalyst; clusters and contamination are the
already-bounded pair/semi-join pipelines), joined back uniform-hash on the
id. Nothing here adds a new shuffle shape beyond its inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clusters import assign_clusters
from .decontam import contamination
from .textstats import quality_features


def curate_corpus(
    docs: DataFrame,
    dup_pairs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_q_score: float = 0.0,
    ngram: int = 13,
    mode: str = "word",
    hasher: str = "md5",
) -> DataFrame:
    """Per-document curation verdict: ``(id_col, q_score, drop_reason)``
    with ``drop_reason`` ∈ {low_quality, near_duplicate, contaminated,
    kept}. Filter ``drop_reason = 'kept'`` (joined back to the corpus) for
    the curated output; group by reason for the drop accounting.

    ``dup_pairs`` is any near-dup pair relation (minhash/simhash/embedding);
    ``benchmark`` is the eval set to decontaminate against.
    """
    q = quality_features(docs.select(id_col, text_col)).select(id_col, "q_score")
    rep = assign_clusters(docs, id_col, dup_pairs).select(id_col, "is_representative")
    cont = contamination(
        docs, benchmark, id_col=id_col, text_col=text_col,
        n=ngram, mode=mode, hasher=hasher,
    ).withColumn("__cont", F.lit(True)).select(id_col, "__cont")
    verdict = (
        q.join(rep, id_col, "left")
        .join(cont, id_col, "left")
        .select(
            id_col,
            "q_score",
            F.when(F.col("q_score") < F.lit(min_q_score), F.lit("low_quality"))
            .when(~F.coalesce("is_representative", F.lit(True)), F.lit("near_duplicate"))
            .when(F.coalesce("__cont", F.lit(False)), F.lit("contaminated"))
            .otherwise(F.lit("kept"))
            .alias("drop_reason"),
        )
    )
    return verdict
