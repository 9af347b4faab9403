"""Document deduplication suite for large-scale training-data pipelines.

All variants operate on a ``documents(doc_id, text, ...)`` table and
stay JVM-side (built-in functions, whole-stage codegen) except the
embedding path which uses vectorized array functions.

Variants:
  - exact:        md5(text) groupBy (hash is portable -> SQL oracle)
  - ngram_jaccard: word n-gram shingles, candidate pairs by shared
                   shingle, exact Jaccard filter (SQL-expressible)
  - minhash_lsh:  per-permutation minhash = lexicographic MIN of
                   md5(seed||shingle) — portable across Spark and
                   DuckDB, so the oracle can reproduce signatures
                   exactly; banding via concatenated signature slices
  - simhash:      64-bit fingerprint from md5 bits, hamming-distance
                   buckets
  - embedding:    cosine near-dup over array<float> embeddings

Scale notes: every pipeline shuffles once on the blocking key
(hash / shingle / band / bucket); frequent-shingle blocking keys are
capped to avoid quadratic mega-buckets (documented drop counters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_docs, doc_ids)."""
    return (
        documents
        .select(F.col("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def word_shingles(documents: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) long table of word n-grams — pure built-ins."""
    toks = documents.select(
        "doc_id", F.split(F.col(text_col), r"\s+").alias("w")
    )
    return (
        toks
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size("w") - n, F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice("w", i + 1, n)),
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.8, n: int = 3,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via shared-shingle blocking:
    one shuffle on shingle, one aggregation on (a, b).

    ``max_shingle_freq`` drops ubiquitous shingles from *blocking*
    (boilerplate guard) — recall is unaffected as long as any
    non-ubiquitous shingle is shared."""
    sh = word_shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    blocked = sh.join(freq.filter(F.col("df") <= max_shingle_freq), "shingle")

    left = blocked.select(F.col("doc_id").alias("a"), "shingle")
    right = blocked.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter
        .join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signature_table(
    documents: DataFrame, n_hashes: int = 8, n: int = 3
) -> DataFrame:
    """(doc_id, h0..h{k-1}) — each h_i = MIN(md5(i || shingle)), a
    string-valued minhash that DuckDB reproduces bit-for-bit."""
    sh = word_shingles(documents, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i)), F.lit("|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame, n_hashes: int = 8, bands: int = 4, n: int = 3,
    verify_threshold: float | None = None,
) -> DataFrame:
    """Near-dup candidate pairs: band the minhash signature, groupBy
    (band, key), intra-bucket pairs. Optional exact-Jaccard verify."""
    sigs = minhash_signature_table(documents, n_hashes, n)
    rows_per_band = n_hashes // bands
    banded = None
    for b in range(bands):
        cols = [F.col(f"h{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        part = sigs.select(
            "doc_id", F.lit(b).alias("band"), F.concat_ws("#", *cols).alias("key")
        )
        banded = part if banded is None else banded.unionByName(part)
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "key"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    if verify_threshold is not None:
        exact = ngram_jaccard_pairs(documents, threshold=verify_threshold, n=n)
        pairs = pairs.join(exact.select("a", "b"), ["a", "b"], "left_semi")
    return pairs


def simhash_table(documents: DataFrame, bits: int = 64, text_col: str = "text") -> DataFrame:
    """64-bit simhash per doc from token md5s: bit b of the fingerprint
    is the sign of sum over tokens of (bit b of md5(token))*2-1.
    Pure built-ins: explode tokens → per-bit majority via conv()."""
    toks = (
        documents
        .select("doc_id", F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
        .withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long"))
    )
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(min(bits, 60))
    ]
    agg = toks.groupBy("doc_id").agg(*bit_aggs)
    fingerprint = None
    for b in range(min(bits, 60)):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return agg.select("doc_id", fingerprint.cast("long").alias("simhash"))


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, blocked on 16-bit
    chunks (a pair within hamming<=3 shares at least one of 4 chunks)."""
    sh = simhash_table(documents)
    chunks = None
    for c in range(4):
        part = sh.select(
            "doc_id", "simhash", F.lit(c).alias("chunk"),
            F.shiftright(F.col("simhash"), c * 15).bitwiseAND(F.lit((1 << 15) - 1)).alias("key"),
        )
        chunks = part if chunks is None else chunks.unionByName(part)
    pairs = (
        chunks.alias("l").join(chunks.alias("r"), ["chunk", "key"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"),
            F.col("l.simhash").alias("ha"), F.col("r.simhash").alias("hb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    return pairs


def embedding_near_duplicates(
    embeddings: DataFrame, threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine >= threshold pairs via built-in array math
    (F.zip_with dot product / aggregate norms) — brute-force blocked
    variant suitable as the verify stage after LSH blocking."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    base = embeddings.select(
        F.col(id_col), F.col(vec_col),
        norm.alias("nrm"),
    )
    left = base.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na")
    )
    right = base.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        left.crossJoin(right)
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
    )
