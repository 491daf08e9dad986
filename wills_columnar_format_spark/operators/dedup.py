"""MinHash+LSH near-duplicate detection with hot-band capping.

The flagship dedup operator (SURVEY.md §2: MinHash+LSH). Shape:
shingle → 32 universal-hash minima (one md5 per gram) → 16 bands × 2
rows → band self-join for candidates → exact-jaccard verification
against the materialized shingle set.

Scale hazard (the one quadratic cliff at 100 TB): a degenerate band —
millions of boilerplate/empty docs sharing one signature — makes the
band self-join O(k²) in that band. ``band_cap`` bounds it:

* bands with population ≤ cap join normally;
* docs whose band exceeds the cap are grouped by exact text fingerprint;
  each group emits STAR pairs (every member ↔ the group's min doc_id,
  jaccard 1.0) — linear in group size, and exact for the identical-doc
  groups that cause hot bands in practice;
* one representative per fingerprint group re-enters the band join (the
  hot signature's population collapses to #distinct texts), so
  NEAR-identical docs in a hot band still get candidate coverage through
  their representatives. Bands still over the cap after this collapse
  (adversarially many DISTINCT texts sharing a signature) are dropped —
  the documented recall trade at the quadratic cliff.

With the default cap (10k) no sandbox-scale band is ever hot, so the
exact all-pairs jaccard oracle holds with 100% recall at sf0.01/sf0.1;
the hot path is exercised by tests/test_dedup_scale.py (10k identical
docs finish in linear time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BAND_CAP = 10_000
JACCARD_THRESHOLD = 0.5
_MERSENNE_P = (1 << 31) - 1

# Gram hashes use Spark's native xxhash64 (JVM codegen, ~10x cheaper
# than md5+hex+conv). The hash family is LSH-internal: the operator's
# OUTPUT is the exact-jaccard-verified pair set, so recall — not the
# pair values — is all the family affects (100% vs the exact oracle at
# sf0.01/sf0.1, revalidated after this swap). Two independent 31-bit
# draws come from differently-seeded xxhash64 calls.
_SPARK_HEX2INT_HI = f"pmod(xxhash64(g2), {_MERSENNE_P})"
_SPARK_HEX2INT_LO = f"pmod(xxhash64(g2, 1), {_MERSENNE_P})"

# 32 MIN-aggregate expressions in ONE groupBy instead of a 32x row
# explosion; h_k = (h1 + k*h2) mod p universal hashing from one hash.
_MH_MINS = ",\n           ".join(
    f"MIN((h1 + CAST({k} AS BIGINT) * h2) % {_MERSENNE_P}) AS m{k}" for k in range(32)
)
_MH_STACK = ", ".join(
    f"'{b}', concat(CAST(m{2*b} AS STRING), ':', CAST(m{2*b+1} AS STRING))" for b in range(16)
)
# signature-agreement estimate: #equal minima / 32 is an unbiased
# estimator of jaccard — the cheap pre-verify filter
_MH_EQ_SUM = " + ".join(f"(CASE WHEN a.m{k} = b.m{k} THEN 1 ELSE 0 END)" for k in range(32))
# keep candidates with >= 4/32 agreeing minima before the exact-verify
# join: P[Binom(32, 0.5) < 4] ~ 1e-7, so a true j >= 0.5 pair is never
# realistically dropped, while the mass of j ~ 0.2-0.4 false-positive
# band candidates (the 16x2 banding is recall-tuned, precision-poor)
# skips the expensive gram-intersection join
_MH_EQ_MIN = 4

# Two-token shingles of the doubled doc set; DISTINCT per doc.
# All relation names are .format() placeholders ({docs}/{grams}/{mins}):
# view names are suffixed per invocation so two concurrent
# minhash_lsh_pairs calls on one SparkSession cannot clobber each
# other's views or uncache each other's data mid-query.
GRAMS_SQL = """
WITH toks AS (SELECT doc_id, split(trim(text), '\\\\s+') AS t FROM {docs})
SELECT DISTINCT doc_id, concat(element_at(t, CAST(i AS INT)), ' ', element_at(t, CAST(i AS INT) + 1)) AS g2
FROM toks LATERAL VIEW explode(sequence(1, size(t) - 1)) e AS i
WHERE size(t) >= 2
"""


# the 32 signature minima; materialized once (cached view) — it is
# referenced three times below (banding + both sides of the agreement
# prefilter) and Spark would otherwise inline-recompute the groupBy per
# reference
MINS_SQL = f"""
WITH gh AS (SELECT doc_id, {_SPARK_HEX2INT_HI} AS h1, {_SPARK_HEX2INT_LO} AS h2 FROM {{grams}})
SELECT doc_id,
       {_MH_MINS}
FROM gh GROUP BY doc_id
"""


def _body_sql(band_cap: int, docs: str = "mh_docs", grams: str = "mh_grams",
              mins_v: str = "mh_mins") -> str:
    return f"""
WITH mins AS (SELECT * FROM {mins_v}),
bands AS (SELECT doc_id, concat(band, ':', sig) AS sig
          FROM mins LATERAL VIEW stack(16, {_MH_STACK}) s AS band, sig),
bsz AS (SELECT sig, COUNT(*) AS bn FROM bands GROUP BY sig),
cold AS (SELECT b.doc_id, b.sig FROM bands b JOIN bsz z ON b.sig = z.sig WHERE z.bn <= {band_cap}),
hotdocs AS (SELECT DISTINCT b.doc_id FROM bands b JOIN bsz z ON b.sig = z.sig WHERE z.bn > {band_cap}),
-- fingerprint must match gram semantics EXACTLY (case-sensitive trim):
-- a lower()'d fingerprint would report case-differing docs as jaccard-1.0
-- duplicates without verification, and the same pair could then appear in
-- both star and verified with conflicting jaccard values
hfp AS (SELECT d.doc_id, md5(trim(d.text)) AS fp
        FROM {docs} d JOIN hotdocs h ON d.doc_id = h.doc_id),
reps AS (SELECT fp, MIN(doc_id) AS rep FROM hfp GROUP BY fp),
star AS (SELECT r.rep AS d1, f.doc_id AS d2, CAST(1.0 AS DOUBLE) AS jaccard
         FROM hfp f JOIN reps r ON f.fp = r.fp WHERE f.doc_id > r.rep),
repbands AS (SELECT b.doc_id, b.sig
             FROM bands b JOIN reps r ON b.doc_id = r.rep
                          JOIN bsz z ON b.sig = z.sig
             WHERE z.bn > {band_cap}),
allband AS (SELECT * FROM cold UNION ALL SELECT * FROM repbands),
absz AS (SELECT sig, COUNT(*) AS bn FROM allband GROUP BY sig),
joinable AS (SELECT a.doc_id, a.sig FROM allband a JOIN absz z ON a.sig = z.sig
             WHERE z.bn <= {band_cap}),
cand0 AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
          FROM joinable a JOIN joinable b ON a.sig = b.sig AND a.doc_id < b.doc_id),
cand AS (SELECT c.d1, c.d2 FROM cand0 c
         JOIN mins a ON a.doc_id = c.d1 JOIN mins b ON b.doc_id = c.d2
         WHERE {_MH_EQ_SUM} >= {_MH_EQ_MIN}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM {grams} GROUP BY doc_id),
inter AS (SELECT g1.doc_id AS d1, g2t.doc_id AS d2, COUNT(*) AS c
          FROM cand JOIN {grams} g1 ON g1.doc_id = cand.d1
                    JOIN {grams} g2t ON g2t.doc_id = cand.d2 AND g2t.g2 = g1.g2
          GROUP BY g1.doc_id, g2t.doc_id),
verified AS (
  SELECT d1, d2, CAST(ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS DOUBLE) AS jaccard
  FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE c * 1.0 / (s1.n + s2.n - c) >= {JACCARD_THRESHOLD}
)
SELECT d1, d2, jaccard FROM verified
UNION
SELECT d1, d2, jaccard FROM star
"""


def minhash_lsh_pairs(
    spark: SparkSession, docs: DataFrame, band_cap: int = DEFAULT_BAND_CAP
) -> DataFrame:
    """Near-dup pairs (d1 < d2, jaccard ≥ 0.5) for a (doc_id, text) frame.

    The grams relation is materialized ONCE (cached view + eager
    localCheckpoint) — Spark inlines CTEs, so the expensive
    explode+DISTINCT would otherwise run once per reference. View names
    are uuid-suffixed per invocation: concurrent calls on one
    SparkSession each see their own views and caches.
    """
    import uuid

    s = uuid.uuid4().hex[:8]
    docs_v, grams_v, mins_v = f"mh_docs_{s}", f"mh_grams_{s}", f"mh_mins_{s}"
    cached = []
    try:
        # everything from the first view on sits inside the try: a
        # failure mid-setup (analysis error, cancelled job) must not
        # leak uuid-named views/caches that nothing can reach again
        docs.select("doc_id", "text").createOrReplaceTempView(docs_v)
        grams = spark.sql(GRAMS_SQL.format(docs=docs_v))
        grams.cache().createOrReplaceTempView(grams_v)
        cached.append(grams_v)
        mins = spark.sql(MINS_SQL.format(grams=grams_v))
        mins.cache().createOrReplaceTempView(mins_v)
        cached.append(mins_v)
        out = spark.sql(_body_sql(band_cap, docs=docs_v, grams=grams_v,
                                  mins_v=mins_v))
        return out.localCheckpoint(eager=True)  # materialize before uncache
    finally:
        for v in reversed(cached):
            try:
                spark.catalog.uncacheTable(v)
            except Exception:
                pass
        for v in (docs_v, grams_v, mins_v):
            try:
                spark.catalog.dropTempView(v)
            except Exception:
                pass


# ---------------------------------------------------------------------------
# incremental dedup: a persisted signature index, probed per ingest batch
# ---------------------------------------------------------------------------
#
# The batch operator above recomputes signatures for the WHOLE corpus on
# every run — O(corpus) per ingest batch, which a continuously-fed
# 100 TB pipeline cannot pay. The incremental shape: persist one
# signature row per corpus doc (doc_id, exact-text fingerprint, the 32
# minhash minima — ~300 B/doc, no text), then each new batch
#
#   1. computes ITS signatures only (O(batch));
#   2. band-joins new against index + itself for candidates (the new
#      side is small — Spark broadcasts it; index-side bands past
#      band_cap are dropped from candidate generation, with
#      identical-text coverage kept by an exact-fingerprint join —
#      the same hot-band trade as the batch operator);
#   3. fetches ONLY the candidate corpus docs' texts for exact-jaccard
#      verification — from a docs DataFrame, or (the engine
#      composition) from a columnar CHECKPOINT via the Bloom-pruned
#      multi-point lookup (decode_checkpoint(keys=...)): verification
#      cost ~ candidates, not corpus;
#   4. appends the batch's signature rows to the index.
#
# Per-batch cost is O(batch + candidates); the corpus is touched only
# through point lookups. doc_ids must be unique across corpus + batch
# (re-ingesting an id is an upsert the caller handles upstream).

_M_COLS = ", ".join(f"m{k}" for k in range(32))

_INDEX_SQL = f"""
WITH gh AS (SELECT doc_id, {_SPARK_HEX2INT_HI} AS h1, {_SPARK_HEX2INT_LO} AS h2 FROM {{grams}}),
m AS (SELECT doc_id, {_MH_MINS} FROM gh GROUP BY doc_id)
SELECT d.doc_id, md5(trim(d.text)) AS fp, {_M_COLS}
FROM {{docs}} d LEFT JOIN m ON d.doc_id = m.doc_id
"""
# gramless docs (< 2 words) keep NULL minima: they never band-join and
# never star — jaccard over empty shingle sets is undefined, matching
# the batch operator and the exact oracle.


def _signature_rows(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, fp, m0..m31) signature rows for a (doc_id, text) frame."""
    import uuid

    s = uuid.uuid4().hex[:8]
    docs_v, grams_v = f"mhi_docs_{s}", f"mhi_grams_{s}"
    try:
        docs.select("doc_id", "text").createOrReplaceTempView(docs_v)
        spark.sql(GRAMS_SQL.format(docs=docs_v)).createOrReplaceTempView(grams_v)
        out = spark.sql(_INDEX_SQL.format(docs=docs_v, grams=grams_v))
        return out.localCheckpoint(eager=True)
    finally:
        for v in (grams_v, docs_v):
            try:
                spark.catalog.dropTempView(v)
            except Exception:
                pass


def build_dedup_index(spark: SparkSession, docs: DataFrame, index_dir: str,
                      mode: str = "append") -> None:
    """Persist signature rows for a corpus (batch) into the index dir."""
    _signature_rows(spark, docs).write.mode(mode).parquet(index_dir)


def _fetch_candidate_texts(spark, corpus, cand_old_ids: DataFrame,
                           fetch_cap: int = 100_000) -> DataFrame:
    """(doc_id, text) of the candidate CORPUS docs. ``corpus`` is a
    (doc_id, text) DataFrame (semi-join — one pass) or a checkpoint
    dir path (self-describing; Bloom/zone-pruned multi-point lookup —
    the decode touches ~|candidates| chunks, not the corpus). Past
    ``fetch_cap`` candidates the checkpoint path degrades to a full
    decode rather than shipping a huge key list."""
    if not isinstance(corpus, str):
        return corpus.select("doc_id", "text").join(
            cand_old_ids, "doc_id", "left_semi")
    from ..engine import decode_checkpoint

    ids = [r["doc_id"] for r in cand_old_ids.limit(fetch_cap + 1).collect()]
    if len(ids) <= fetch_cap:
        dec = decode_checkpoint(spark, corpus, None, keys=ids,
                                key_col="doc_id")
    else:
        dec = decode_checkpoint(spark, corpus, None)
    return dec.select("doc_id", "text")


def _cand_prefix_sql(band_cap: int, new_mins: str, index_v: str) -> str:
    """WITH-prefix through ``cand`` — the blob-free signature-metadata
    half of the probe, shared by the candidate-id pre-pass (which
    bounds the text fetch) and the full verify query."""
    return f"""
WITH allm AS (SELECT doc_id, {_M_COLS} FROM {new_mins}
              UNION ALL SELECT doc_id, {_M_COLS} FROM {index_v}),
nb AS (SELECT doc_id, concat(band, ':', sig) AS sig
       FROM (SELECT * FROM {new_mins} WHERE m0 IS NOT NULL) x
       LATERAL VIEW stack(16, {_MH_STACK}) s AS band, sig),
ib AS (SELECT doc_id, concat(band, ':', sig) AS sig
       FROM (SELECT * FROM {index_v} WHERE m0 IS NOT NULL) x
       LATERAL VIEW stack(16, {_MH_STACK}) s AS band, sig),
-- hot bands are capped on EACH side's own population: a band over the
-- cap on one side is dropped there (fingerprint stars keep the
-- identical-doc coverage; the other 15 bands keep near-dup coverage)
ibsz AS (SELECT sig, COUNT(*) AS bn FROM ib GROUP BY sig),
nbsz AS (SELECT sig, COUNT(*) AS bn FROM nb GROUP BY sig),
coldi AS (SELECT b.doc_id, b.sig FROM ib b JOIN ibsz z ON b.sig = z.sig
          WHERE z.bn <= {band_cap}),
coldn AS (SELECT b.doc_id, b.sig FROM nb b JOIN nbsz z ON b.sig = z.sig
          WHERE z.bn <= {band_cap}),
cxi AS (SELECT LEAST(i.doc_id, n.doc_id) AS d1,
               GREATEST(i.doc_id, n.doc_id) AS d2
        FROM coldn n JOIN coldi i ON n.sig = i.sig),
cxn AS (SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM coldn a JOIN coldn b ON a.sig = b.sig AND a.doc_id < b.doc_id),
cand0 AS (SELECT DISTINCT d1, d2 FROM
          (SELECT * FROM cxi UNION ALL SELECT * FROM cxn) u),
cand AS (SELECT c.d1, c.d2 FROM cand0 c
         JOIN allm a ON a.doc_id = c.d1 JOIN allm b ON b.doc_id = c.d2
         WHERE {_MH_EQ_SUM} >= {_MH_EQ_MIN})"""


def _verify_tail_sql(new_mins: str, index_v: str, grams_v: str,
                     cand_v: str) -> str:
    """Standalone verify query over a MATERIALIZED candidate-pair view
    (``cand_v`` — probe_dedup_index pins it once)."""
    return f"""WITH
sizes AS (SELECT doc_id, COUNT(*) AS n FROM {grams_v} GROUP BY doc_id),
inter AS (SELECT g1.doc_id AS d1, g2t.doc_id AS d2, COUNT(*) AS c
          FROM {cand_v} cand JOIN {grams_v} g1 ON g1.doc_id = cand.d1
                    JOIN {grams_v} g2t ON g2t.doc_id = cand.d2 AND g2t.g2 = g1.g2
          GROUP BY g1.doc_id, g2t.doc_id),
verified AS (
  SELECT d1, d2, CAST(ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS DOUBLE) AS jaccard
  FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE c * 1.0 / (s1.n + s2.n - c) >= {JACCARD_THRESHOLD}
),
-- exact-fingerprint stars: identical trimmed text is jaccard 1.0
-- REGARDLESS of band heat (requires grams on both sides — jaccard over
-- empty shingle sets is undefined, matching the exact oracle)
star AS (
  SELECT DISTINCT LEAST(n.doc_id, o.doc_id) AS d1,
                  GREATEST(n.doc_id, o.doc_id) AS d2,
                  CAST(1.0 AS DOUBLE) AS jaccard
  FROM (SELECT doc_id, fp FROM {new_mins} WHERE m0 IS NOT NULL) n
  JOIN (SELECT doc_id, fp FROM {index_v} WHERE m0 IS NOT NULL
        UNION ALL
        SELECT doc_id, fp FROM {new_mins} WHERE m0 IS NOT NULL) o
    ON n.fp = o.fp AND n.doc_id <> o.doc_id
)
SELECT d1, d2, jaccard FROM verified
UNION
SELECT d1, d2, jaccard FROM star
"""


def probe_dedup_index(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    corpus,
    band_cap: int = DEFAULT_BAND_CAP,
    update_index: bool = True,
) -> DataFrame:
    """Near-dup pairs (d1 < d2, jaccard ≥ 0.5) TOUCHING a new ingest
    batch: new-vs-indexed-corpus and new-vs-new, exact-jaccard-verified
    — without recomputing a single corpus signature. ``corpus`` is the
    indexed docs as a (doc_id, text) DataFrame or a columnar checkpoint
    dir (candidate texts fetched by Bloom-pruned point lookup). With
    ``update_index`` the batch's signatures append to the index, so
    successive calls see a growing corpus."""
    import uuid

    s = uuid.uuid4().hex[:8]
    new_v, idx_v, grams_v = f"mhi_new_{s}", f"mhi_idx_{s}", f"mhi_g_{s}"
    cand_v = f"mhi_cand_{s}"
    cached = []
    try:
        new_sig = _signature_rows(spark, new_docs)
        new_sig.createOrReplaceTempView(new_v)
        spark.read.parquet(index_dir).createOrReplaceTempView(idx_v)

        # candidate PAIRS materialize ONCE (they're small — bounded by
        # band_cap² per band): the id pre-pass that bounds the text
        # fetch and the verify query both consume the pinned pairs,
        # instead of each re-running the 16-band LATERAL-stack join
        # over the whole index (was the dominant probe cost — measured
        # ~2× the band work per probe before this).
        cand_pairs = spark.sql(
            _cand_prefix_sql(band_cap, new_v, idx_v)
            + "\nSELECT d1, d2 FROM cand"
        ).localCheckpoint(eager=True)
        cand_pairs.createOrReplaceTempView(cand_v)
        pre = spark.sql(
            f"SELECT DISTINCT doc_id FROM (SELECT d1 AS doc_id "
            f"FROM {cand_v} UNION ALL SELECT d2 FROM {cand_v}) u")
        new_ids = new_docs.select("doc_id")
        cand_ids = pre.join(new_ids, "doc_id", "left_anti")
        # fingerprint-star partners need no text fetch; stars are exact.
        old_texts = _fetch_candidate_texts(spark, corpus, cand_ids)
        both = new_docs.select("doc_id", "text").unionByName(
            old_texts.select("doc_id", "text"))
        both.createOrReplaceTempView(f"mhi_docs_{s}")
        grams = spark.sql(GRAMS_SQL.format(docs=f"mhi_docs_{s}"))
        grams.cache().createOrReplaceTempView(grams_v)
        cached.append(grams_v)
        out = spark.sql(
            _verify_tail_sql(new_v, idx_v, grams_v, cand_v=cand_v))
        out = out.localCheckpoint(eager=True)
        if update_index:
            new_sig.write.mode("append").parquet(index_dir)
        return out
    finally:
        for v in cached:
            try:
                spark.catalog.uncacheTable(v)
            except Exception:
                pass
        for v in (new_v, idx_v, grams_v, cand_v, f"mhi_docs_{s}"):
            try:
                spark.catalog.dropTempView(v)
            except Exception:
                pass
