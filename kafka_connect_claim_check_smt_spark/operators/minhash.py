"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

All the signature math is **pure Catalyst higher-order functions** — shingling
via ``sequence``+``transform``+``substring``, hashing via ``xxhash64``, MinHash
permutations via ``array_min(transform(...))``, banding via ``slice``+
``xxhash64`` — so the whole pipeline stays JVM-side in whole-stage codegen.
The only shuffles are the LSH band groupBys/joins, keyed by band hash
(uniform by construction — no skew).

Scale shape (10^10 docs): shingle/signature computation is scan-parallel;
candidate generation is |bands| × groupBy on band hash; verification touches
only candidate pairs. This is the standard web-dedup plan (the
MapReduce-era minhash pipeline re-expressed declaratively).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic permutation constants (large odd multipliers, fixed seed)
_MERSENNE = (1 << 61) - 1


def _perm_constants(n: int, seed: int) -> list[tuple[int, int]]:
    out = []
    x = seed * 2654435761 % _MERSENNE
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % _MERSENNE
        a = (x | 1) % (1 << 31)
        x = (x * 6364136223846793005 + 1442695040888963407) % _MERSENNE
        b = x % (1 << 31)
        out.append((a, b))
    return out


def shingles(text: Column | str, k: int = 8, hashed: bool = True) -> Column:
    """Distinct character k-grams, JVM-side: array<long> of xxhash64 values
    (default) or the raw substrings (``hashed=False`` — SQL-oracle parity,
    since DuckDB has no xxhash64). Empty/short docs yield one whole-text
    shingle so exact copies still compare equal."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    if hashed:
        grams = F.transform(idx, lambda i: F.xxhash64(c.substr(i, F.lit(k))))
    else:
        grams = F.transform(idx, lambda i: c.substr(i, F.lit(k)))
    return F.array_distinct(grams)


def minhash_signature(shingle_hashes: Column, num_hashes: int = 32, seed: int = 42) -> Column:
    """MinHash signature (array<long>, length num_hashes): for permutation j,
    min over shingles of (a_j * h + b_j) mod 2^61-1. Pure Catalyst."""
    sigs = []
    # reduce 64-bit xxhash to 31 bits first: products then fit in 62 bits, so
    # the arithmetic is exact under Spark 4's default ANSI overflow checking
    for a, b in _perm_constants(num_hashes, seed):
        sigs.append(
            F.array_min(
                F.transform(
                    shingle_hashes,
                    lambda h: F.pmod(
                        F.pmod(h, F.lit(2**31)) * F.lit(a) + F.lit(b), F.lit(_MERSENNE)
                    ),
                )
            )
        )
    return F.array(*sigs)


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: array of (band_id, band_hash) structs."""
    entries = []
    for b in range(bands):
        band = F.slice(signature, b * rows_per_band + 1, rows_per_band)
        entries.append(F.struct(F.lit(b).alias("band"), F.xxhash64(band).alias("bh")))
    return F.array(*entries)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate candidate pairs with exact-Jaccard verification.

    Physical shape (the 10^10-doc plan):
    1. explode shingle hashes → ONE hash aggregation per doc computing all
       ``num_hashes`` permutation minima AND the shingle set in the same
       groupBy (codegen'd min() aggregates with map-side partial aggregation —
       interpreted array-lambda folds were ~30× slower at 5k docs)
    2. explode band keys, self-join per band bucket → candidate pairs
       (shuffle keyed by band hash, uniform)
    3. verify candidates with exact shingle-set Jaccard ≥ threshold — only
       candidate pairs pay the set-intersection cost

    Returns (id_a, id_b, jaccard) with id_a < id_b, unique."""
    rows_per_band = num_hashes // bands
    h31 = F.pmod(F.col("h"), F.lit(2**31))
    mins = [
        F.min(F.pmod(h31 * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(f"s{j}")
        for j, (a, b) in enumerate(_perm_constants(num_hashes, seed))
    ]
    per_doc = (
        df.select(F.col(id_col).alias("__id"), F.explode(shingles(text_col, k)).alias("h"))
        .groupBy("__id")
        .agg(F.collect_list("h").alias("__sh"), *mins)
    )
    per_doc = per_doc.persist()  # consumed twice: banding + verification sets
    band_entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.struct(*[F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)])).alias("bh"),
        )
        for b in range(bands)
    ]
    # candidates carry only ids — the heavy shingle arrays never enter the
    # band explosion/self-join (8× array duplication OOMed at 5k docs)
    banded = per_doc.select("__id", F.explode(F.array(*band_entries)).alias("__b")).select(
        "__id", "__b.band", "__b.bh"
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bh"], how="inner")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    sets = per_doc.select("__id", "__sh")
    cand = (
        cand.join(sets.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a")), "id_a")
        .join(sets.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    threshold: float = 0.8,
    hashed: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard over ALL pairs sharing at least one shingle —
    explode + self-join on shingle hash + distinct-count arithmetic
    (|A∩B| from co-occurrence counts, |A∪B| = |A|+|B|−|A∩B|).

    SQL-expressible end-to-end (DuckDB oracle twin lives in __spark_entry__).
    For unbounded corpora prefer minhash_lsh_pairs; this one's join fanout is
    quadratic in per-shingle document frequency."""
    sh = df.select(
        F.col(id_col).alias("__id"), F.explode(shingles(text_col, k, hashed=hashed)).alias("h")
    ).distinct()
    sizes = sh.groupBy("__id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    co = (
        a.join(b, "h")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("n").alias("nb"))
    return (
        co.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text: Column | str, k: int = 4) -> Column:
    """64-bit SimHash from character k-gram hashes, pure Catalyst:
    bit_i(doc) = 1 if sum over grams of sign(bit_i(hash)) > 0.

    aggregate() folds a 64-slot count array; no Python."""
    grams = shingles(text, k)
    idx = F.sequence(F.lit(0), F.lit(63))
    # per-bit vote: +1 if the gram hash has the bit set, else -1 (bit_get takes
    # a Column position; shiftright does not)
    counts = F.transform(
        idx,
        lambda i: F.aggregate(
            grams,
            F.lit(0),
            lambda acc, h: acc + F.when(F.bit_get(h, i) == 1, 1).otherwise(-1),
        ),
    )
    # bit 63 as a long literal is -(2^63); OR-folding avoids ANSI overflow
    powers = F.array(*[F.lit(1 << i) for i in range(63)], F.lit(-(1 << 63)))
    bits = F.zip_with(
        counts, powers, lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, v: acc.bitwiseOR(v))


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 4
) -> DataFrame:
    """(id, simhash) via the exploded plan: one codegen'd hash aggregation
    computing all 64 bit votes (sum of ±1 per bit), then an OR-fold of
    shifted bit literals. Same output as ``simhash64`` but scan-speed."""
    votes = [
        F.sum(F.when(F.bit_get(F.col("h"), F.lit(i)) == 1, 1).otherwise(-1)).alias(f"c{i}")
        for i in range(64)
    ]
    per_doc = (
        df.select(F.col(id_col).alias("__id"), F.explode(shingles(text_col, k)).alias("h"))
        .groupBy("__id")
        .agg(*votes)
    )
    sim = F.lit(0).cast("long")
    for i in range(63):
        sim = sim.bitwiseOR(F.when(F.col(f"c{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long"))
    sim = sim.bitwiseOR(
        F.when(F.col("c63") > 0, F.lit(-(1 << 63))).otherwise(F.lit(0)).cast("long")
    )
    return per_doc.select("__id", sim.alias("s"))


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit quarters (any pair within
    hamming ≤ 3 of 64 bits shares at least one identical quarter — pigeonhole),
    then verify exact hamming distance via bit_count(xor)."""
    sh = simhash_signatures(df, id_col, text_col, k)
    quarters = sh.select(
        "__id",
        "s",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(q).alias("q"),
                    F.shiftright(F.col("s"), q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qh"),
                )
                for q in range(4)
            ])
        ).alias("__q"),
    ).select("__id", "s", "__q.q", "__q.qh")
    a, b = quarters.alias("a"), quarters.alias("b")
    cand = (
        a.join(b, ["q", "qh"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.s").alias("sa"),
            F.col("b.s").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
