"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

First-class LLM-pipeline components (BASELINE.json north star; absent
from the reference, which has only row-level drop_duplicates —
/root/reference/src/dataframe/pandas_compat/functions.rs:1141).

Scale design:
- Exact dedup is a hash-groupBy — one shuffle on the 32-hex md5 key,
  uniformly distributed, no skew.
- MinHash signatures are computed per-row with array HOFs (no shuffle,
  no UDF). Hashes are md5 hex strings: lexicographic MIN over them is a
  valid min-hash and is engine-portable (same answer in the DuckDB
  oracle).
- LSH banding turns all-pairs O(n²) into a self-join on band keys —
  the only shuffle is on band hash, and candidate pairs per band are
  bounded by actual near-duplicate density, which is what makes this
  run on 10^10 documents where brute force cannot.
- Verification (exact Jaccard) runs only on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandrs_spark.operators.text import doc_fingerprint, shingles, tokens

from pandrs_spark.operators.util import fan_out

__all__ = [
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "source_overlap_matrix",
    "select_cluster_representatives",
    "exact_dedup_clusters",
    "minhash_signature_cols",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprint",
    "incremental_dedup",
]


def exact_dedup_clusters(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group rows by content fingerprint; one row per duplicate cluster
    with the kept (minimum) id and cluster size."""
    return (
        df.select(doc_fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min(id_col).alias("keep_id"),
        )
    )


def incremental_dedup(
    new_batch: DataFrame,
    existing: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Delta dedup: keep only new rows whose content fingerprint is not
    already in the existing corpus, and not duplicated within the batch
    (min id wins). The shape every multi-snapshot training-data
    pipeline needs: fingerprint both sides, LEFT ANTI join on the
    fingerprint (hash-partitioned on an md5 key → uniform, no skew),
    then an in-batch keep-first. No row of either corpus is ever
    widened — only (fp, id) pairs move. At 100 TB the existing side is
    a fingerprint-only table you maintain incrementally; this takes any
    DataFrame and projects the fingerprint itself for convenience.
    """
    new_fp = new_batch.withColumn("__fp__", doc_fingerprint(text_col))
    old_fp = existing.select(doc_fingerprint(text_col).alias("__fp__"))
    survivors = new_fp.join(old_fp, "__fp__", "left_anti")
    w_min = (
        survivors.groupBy("__fp__")
        .agg(F.min(id_col).alias("__keep__"))
    )
    return (
        survivors.join(w_min, "__fp__")
        .filter(F.col(id_col) == F.col("__keep__"))
        .drop("__fp__", "__keep__")
    )


def minhash_signature_cols(text: Column, num_hashes: int = 4, k: int = 3) -> list[Column]:
    """MinHash signature columns mh0..mh{n-1} over word k-gram shingles.

    Hash family: md5 of ``"<seed>|" + shingle`` — independent-enough
    permutations, portable across engines, no numeric conversion needed
    because lexicographic min over fixed-width hex is order-isomorphic
    to numeric min.
    """
    sh = shingles(tokens(text), k)

    def _hasher(prefix: str):
        # Single-arg lambda is required: a two-parameter function would
        # make F.transform pass (element, index) and corrupt the seed.
        return lambda x: F.md5(F.concat(F.lit(prefix), x))

    out = []
    for s in range(num_hashes):
        hashed = F.transform(sh, _hasher(f"{s}|"))
        out.append(F.array_min(hashed).alias(f"mh{s}"))
    return out


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 4, k: int = 3
) -> DataFrame:
    # per-row minhash over shingles is compute-dense map work — widen
    # under-partitioned scans first. Char-work-sized split (the q368
    # convention): each row costs ~num_hashes md5 evaluations PER
    # SHINGLE, so the default byte-sized split starves the stage
    # (round 11, q714 at sf0.1: the 16-hash signature pass ran 50 s of
    # task time on 4 tasks while 28 cores idled).
    return fan_out(df, bytes_per_task=16 * 1024).select(
        F.col(id_col), *minhash_signature_cols(F.col(text_col), num_hashes, k)
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 4,
    band_size: int = 2,
    k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing at least one LSH band
    (band = md5 of ``band_size`` consecutive minhashes). Returns distinct
    (id_a, id_b) with id_a < id_b."""
    from pandrs_spark.operators.util import tracked_persist

    sigs = minhash_signatures(df, text_col, id_col, num_hashes, k)
    # One posexplode pass emits every (band_no, band_key) row — the
    # prior per-band select + union recomputed the whole shingle +
    # minhash pipeline once per band, and the self-join then doubled
    # it again (round 11, measured at sf0.1: the minhash map stage
    # burned ~57 s of executor CPU per extra evaluation). Persisting
    # the band table means the signatures are computed exactly once;
    # at 100 TB this is the standard materialized fingerprint table,
    # (id, band_no, band_key) rows only — never the documents.
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{b * band_size + j}")
                        for j in range(band_size)
                    ],
                )
            )
            for b in range(num_hashes // band_size)
        ]
    )
    bands = tracked_persist(
        sigs.select(
            F.col(id_col),
            F.posexplode(band_keys).alias("band_no", "band_key"),
        )
    )
    left = bands.alias("l")
    right = bands.alias("r")
    return tracked_persist(
        left.join(
            right,
            (F.col("l.band_no") == F.col("r.band_no"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pairs: DataFrame,
    k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact word-k-gram Jaccard similarity for the given candidate
    pairs (columns id_a < id_b). Explode → join is one shuffle on the
    shingle key; only candidate docs are exploded."""
    from pandrs_spark.operators.util import tracked_persist

    doc_ids = pairs.select(F.col("id_a").alias("did")).unionByName(
        pairs.select(F.col("id_b").alias("did"))
    ).distinct()
    # The exploded shingle table feeds three consumers (sizes, both
    # join sides of the intersection count); persist it so the
    # tokenize + shingle + explode map work runs once instead of three
    # times (round 11). (id, shingle) rows only — the lightweight
    # proxy, never the documents.
    # char-work-sized widening before the tokenize + shingle + explode
    # map pass (round 11, same starved-stage fix as minhash_signatures).
    # Round 12: fan_out moved to the PROBE side BEFORE the semi-join —
    # widening after the join made fan_out's partition probe execute
    # the whole candidate-pair subtree under AQE (a 92 s-CPU pass in
    # q714's build); widened-scan ⋈ broadcast(doc_ids) keeps the
    # explode work on the widened partitions, and at scale a sort-merge
    # plan re-shuffles anyway, so nothing is lost.
    wide = fan_out(df, bytes_per_task=16 * 1024)
    sh = tracked_persist(
        wide.join(doc_ids, wide[id_col] == doc_ids.did, "left_semi")
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), k))).alias("sh"),
        )
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh"))
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_int"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_int") / (F.col("n_a") + F.col("n_b") - F.col("n_int")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


_HIGH_NIBBLES = "89abcdef"


def simhash_fingerprint(
    df: DataFrame, text_col: str, id_col: str, bits: int = 16
) -> DataFrame:
    """SimHash-style fingerprint: for each of ``bits`` positions, take
    the j-th hex nibble of md5(token); tokens vote +1 if the nibble's
    high bit is set else -1; the fingerprint bit is the majority.

    Nibble-based (instead of real 64-bit arithmetic) keeps it exactly
    reproducible in ANSI SQL while preserving the similarity property:
    near-identical token multisets → small Hamming distance.
    """
    tok = fan_out(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tk")
    ).withColumn("h", F.md5("tk"))
    agg_cols = []
    for j in range(1, bits + 1):
        vote = F.when(
            F.instr(F.lit(_HIGH_NIBBLES), F.substring(F.col("h"), j, 1)) > 0, 1
        ).otherwise(-1)
        agg_cols.append(
            F.when(F.sum(vote) > 0, F.lit("1")).otherwise(F.lit("0")).alias(f"b{j}")
        )
    per_doc = tok.groupBy(id_col).agg(*agg_cols)
    return per_doc.select(
        F.col(id_col),
        F.concat_ws("", *[F.col(f"b{j}") for j in range(1, bits + 1)]).alias(
            "simhash"
        ),
    )


def select_cluster_representatives(
    df: DataFrame,
    text_col: str,
    id_col: str,
    quality_col: str,
) -> DataFrame:
    """Pick ONE representative per exact-duplicate cluster — the step
    after dedup detection in a real corpus pipeline: of N byte-identical
    (by content fingerprint) copies, keep the highest-``quality_col``
    member (ties broken by lowest id, fully deterministic) and record
    how many copies it speaks for (needed to preserve corpus weighting
    downstream).

    One window partitioned BY CLUSTER (never global) over the
    fingerprint groups: the plan is one shuffle on the fingerprint,
    each task ranks only its own clusters. Returns
    (fp, n_docs, rep_id, rep_quality).
    """
    from pyspark.sql import Window

    keyed = df.select(
        doc_fingerprint(text_col).alias("fp"),
        F.col(id_col),
        F.col(quality_col),
    )
    w = Window.partitionBy("fp").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return (
        keyed.withColumn("__rn__", F.row_number().over(w))
        .withColumn(
            "n_docs", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .filter(F.col("__rn__") == 1)
        .select(
            "fp",
            "n_docs",
            F.col(id_col).alias("rep_id"),
            F.col(quality_col).alias("rep_quality"),
        )
    )


def source_overlap_matrix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source exact-content overlap matrix — for every pair of
    corpus sources, how many distinct content fingerprints they share
    and the fingerprint-level Jaccard. The standard provenance audit
    before mixing crawls/dumps into one training corpus: two "different"
    sources with high Jaccard are the same upstream crawl and would
    silently double-weight their documents.

    Shape for 100 TB: distinct (fingerprint, source) pairs via one
    hash-groupBy shuffle on the uniformly-distributed md5 key; the
    pair table is a self equi-join ON THE FINGERPRINT (bounded by true
    duplicate density, never all-pairs); per-source distinct counts are
    a tiny source-bounded aggregate broadcast back over the
    source-pair grid so zero-overlap pairs still appear. Output rows =
    C(n_sources, 2) — a handful.

    Returns (source_a, source_b, n_a, n_b, n_shared, jaccard) with
    source_a < source_b.
    """
    d = (
        docs.select(
            doc_fingerprint(F.col(text_col)).alias("fp"),
            F.col(source_col).alias("src"),
        )
        .distinct()
    )
    per_source = d.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        F.broadcast(per_source.select(F.col("src").alias("source_a"), F.col("n").alias("n_a")))
        .crossJoin(
            F.broadcast(
                per_source.select(F.col("src").alias("source_b"), F.col("n").alias("n_b"))
            )
        )
        .filter(F.col("source_a") < F.col("source_b"))
    )
    shared = (
        d.alias("x")
        .join(d.alias("y"), "fp")
        .filter(F.col("x.src") < F.col("y.src"))
        .groupBy(
            F.col("x.src").alias("source_a"), F.col("y.src").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        grid.join(shared, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce(F.col("n_shared"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_shared"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local-fingerprinting algorithm): hash every
    word k-gram, slide a window of ``window`` consecutive hashes, and
    select the minimum hash of each window (rightmost occurrence on
    ties). The guarantee: any shared run of at least k+window-1 words
    between two documents shares at least one selected fingerprint —
    LOCAL duplication detection, which whole-document MinHash cannot
    see (a 95%-new doc with one plagiarized paragraph).

    Shape for 100 TB: one map-side posexplode (one md5 per gram — NOT
    the array-HOF formulation, whose per-window lambda re-inlines the
    whole gram array and goes O(n²·w) per document), then the
    per-window rightmost-argmin as ``min(struct(hash, -pos))`` over a
    ``window``-row frame PARTITIONED BY DOCUMENT — bounded frames,
    never a global window. Fingerprint density is ~2/(window+1) of
    grams, the paper's bound. Hashes are md5 hex so lexicographic MIN
    is engine-portable and the DuckDB oracle replays bit-for-bit.

    Returns exploded (id_col, pos, fp): the distinct selected
    positions with their fingerprint hash. Docs with fewer than k
    words yield no rows; docs with fewer than window grams yield one
    fingerprint (min over all their grams).
    """
    from pyspark.sql import Window as W

    if k < 1 or window < 1:
        raise ValueError("winnow_fingerprints: k and window must be >= 1")
    ws = F.filter(tokens(F.col(text_col)), lambda w: w != "")
    grams = (
        fan_out(docs)
        .select(
            F.col(id_col),
            F.posexplode(F.transform(shingles(ws, k), F.md5)).alias(
                "__p0__", "__h__"
            ),
        )
        .select(id_col, (F.col("__p0__") + 1).alias("__gp__"), "__h__")
    )
    frame = W.partitionBy(id_col).orderBy("__gp__").rowsBetween(0, window - 1)
    whole = W.partitionBy(id_col)
    picked = (
        grams.withColumn("__n__", F.count(F.lit(1)).over(whole))
        .withColumn(
            "__sel__",
            F.min(
                F.struct(F.col("__h__"), (-F.col("__gp__")).alias("np"))
            ).over(frame),
        )
        # window starts: 1..max(1, n-window+1); later starts are the
        # clipped suffix frames the algorithm does not evaluate
        .filter(
            F.col("__gp__")
            <= F.greatest(F.lit(1), F.col("__n__") - (window - 1))
        )
    )
    return picked.select(
        F.col(id_col),
        (-F.col("__sel__.np")).cast("long").alias("pos"),
        F.col("__sel__.__h__").alias("fp"),
    ).distinct()


def winnow_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 5,
    min_shared: int = 3,
    max_df: int = 10,
) -> DataFrame:
    """Local-overlap candidate pairs from winnowing fingerprints: pairs
    of documents sharing >= ``min_shared`` distinct selected
    fingerprints, with a containment score n_shared / min(n_a, n_b) —
    the partial-duplication detector (one stolen paragraph) that
    whole-doc MinHash misses.

    Scale shape: the pair search is an equi-join ON THE FINGERPRINT
    (never all-pairs), and fingerprints appearing in more than
    ``max_df`` documents are dropped first — the stop-fingerprint rule
    every production winnowing deployment applies, which is also what
    bounds each join group to max_df² pairs. One distinct + one
    bounded self-join + one pair aggregate.

    Returns (doc_a, doc_b, n_shared, containment), doc_a < doc_b.
    """
    from pandrs_spark.operators.util import tracked_persist

    # the winnow pipeline (widened scan + posexplode + per-doc window)
    # is the expensive pass; persist its distinct output so the three
    # consumers below (document-frequency counts, the kept filter, the
    # pair self-join's two sides) read computed fingerprints instead of
    # re-evaluating the whole subtree per reference (round 11)
    fps = tracked_persist(
        winnow_fingerprints(docs, text_col, id_col, k, window)
        .select(F.col(id_col).alias("id"), "fp")
        .distinct()
    )
    df_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df__"))
    kept = tracked_persist(
        fps.join(
            F.broadcast(df_counts.filter(F.col("__df__") <= max_df)), "fp"
        ).select("id", "fp")
    )
    per_doc = kept.groupBy("id").agg(F.count(F.lit(1)).alias("__n__"))
    pairs = (
        kept.alias("a")
        .join(kept.alias("b"), "fp")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    na = per_doc.select(F.col("id").alias("doc_a"), F.col("__n__").alias("__na__"))
    nb = per_doc.select(F.col("id").alias("doc_b"), F.col("__n__").alias("__nb__"))
    return (
        pairs.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / F.least("__na__", "__nb__"),
                6,
            ).alias("containment"),
        )
    )
