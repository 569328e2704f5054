package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.8 addition (round 7): privacy-noised statistics release — the
  * governance step between a curated corpus and a PUBLISHED dataset card.
  * p_k_anonymity suppresses small groups; this op instead perturbs every
  * released count with seeded symmetric noise, the differential-privacy
  * release shape (noisy counts survive where suppression would delete).
  *
  * Honest boundary (the FakeCodec discipline): this gates the release
  * PLUMBING — group → seeded per-group noise → clamped release — not a
  * formal ε accounting. The noise is sign × Geometric(1/2) magnitude
  * (from the hash's trailing-one run length), TRUNCATED at 5, and the
  * "randomness" is the portable GF(2^61−1) cubic PolyHash of the group's
  * min doc_id (the q_hll_merge recipe) so both engines replay it
  * bit-for-bit. A production deployment swaps the seed for a
  * cryptographic RNG and the truncated geometric for a discrete
  * Laplace/Gaussian with a real ε budget — one expression, same plan.
  *
  * Scale shape: ONE map-side-combined aggregate to |sources|×|langs|
  * rows; everything after is per-row scalar integer arithmetic. The
  * released table also carries n_true and the noise term so the gate and
  * audits can see the mechanism; the production projection drops both. */
object Pipeline4 {

  def pDpRelease(spark: SparkSession, dir: String): DataFrame = {
    val M = graft.functions.PolyHash.M
    val PHI = graft.functions.PolyHash.PHI
    val PSI = graft.functions.PolyHash.PSI
    Tables.table(spark, dir, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_true"), min("doc_id").as("k"))
      .withColumn("h1", expr(
        s"cast((cast($PHI as decimal(19,0)) * cast(k as decimal(19,0)) + $PSI) % $M as decimal(19,0))"))
      .withColumn("h", expr(s"cast((cast((h1 * h1) % $M as decimal(19,0)) * h1) % $M as bigint)"))
      .withColumn("mag", expr(
        """case when h % 2 = 0 then 0 when h % 4 = 1 then 1
          |     when h % 8 = 3 then 2 when h % 16 = 7 then 3
          |     when h % 32 = 15 then 4 else 5 end""".stripMargin))
      .withColumn("noise", expr(
        "cast(case when (h div 1099511627776) % 2 = 0 then mag else -mag end as bigint)"))
      .select(col("source"), col("lang"), col("n_true"), col("noise"),
        expr("greatest(cast(0 as bigint), n_true + noise)").as("released_n"))
      .orderBy("source", "lang")
  }

  val pDpReleaseSql: String = {
    val M = graft.functions.PolyHash.M
    val PHI = graft.functions.PolyHash.PHI
    val PSI = graft.functions.PolyHash.PSI
    s"""WITH g AS (
       |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_true,
       |         MIN(doc_id) AS k
       |  FROM documents GROUP BY 1, 2),
       |h0 AS (
       |  SELECT source, lang, n_true,
       |    CAST((CAST($PHI AS HUGEINT) * k + $PSI) % $M AS HUGEINT) AS h1
       |  FROM g),
       |hh AS (
       |  SELECT source, lang, n_true,
       |    CAST((h1 * h1 % $M) * h1 % $M AS BIGINT) AS h
       |  FROM h0),
       |n AS (
       |  SELECT source, lang, n_true,
       |    CAST((CASE WHEN (h // 1099511627776) % 2 = 0 THEN 1 ELSE -1 END) *
       |      (CASE WHEN h % 2 = 0 THEN 0 WHEN h % 4 = 1 THEN 1
       |            WHEN h % 8 = 3 THEN 2 WHEN h % 16 = 7 THEN 3
       |            WHEN h % 32 = 15 THEN 4 ELSE 5 END) AS BIGINT) AS noise
       |  FROM hh)
       |SELECT source, lang, n_true, noise,
       |  GREATEST(CAST(0 AS BIGINT), n_true + noise) AS released_n
       |FROM n ORDER BY source, lang""".stripMargin
  }

  /** Tokenizer fertility report — the table a tokenizer-sizing decision
    * reads: per language, UTF-8 bytes per token (×10⁴, exact integer) and
    * tokens per document under the corpus's BPE-ish pre-tokenization (the
    * t_token_count regex: letter runs | digit runs | single other-glyphs).
    * High-fertility languages burn context window; the mix designer
    * re-weights or re-trains the tokenizer on exactly this evidence.
    * Bytes come from octet_length (UTF-8 octets, NOT chars — fertility is
    * a byte-budget question), token counts from one regexp_extract_all in
    * the scan projection; everything reduces in a single map-side-combined
    * aggregate to |langs| rows. Integer-exact throughout — no doubles
    * cross the gate. */
  def pFertility(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.table(spark, dir, "documents")
      .select(col("lang"),
        octet_length(col("text")).cast("long").as("b"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("t"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("b").as("n_bytes"), sum("t").as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_bytes"), col("n_tokens"),
        expr("(10000 * n_bytes) div n_tokens").as("bytes_per_token_x1e4"),
        expr("n_tokens div n_docs").as("tokens_per_doc"))
      .orderBy("lang")

  val pFertilitySql: String =
    """WITH d AS (
      |  SELECT lang, CAST(strlen(text) AS BIGINT) AS b,
      |    CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS t
      |  FROM documents),
      |g AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(SUM(b) AS BIGINT) AS n_bytes,
      |         CAST(SUM(t) AS BIGINT) AS n_tokens
      |  FROM d GROUP BY 1)
      |SELECT lang, n_docs, n_bytes, n_tokens,
      |  (10000 * n_bytes) // n_tokens AS bytes_per_token_x1e4,
      |  n_tokens // n_docs AS tokens_per_doc
      |FROM g ORDER BY lang""".stripMargin

  /** WEIGHTED sampling without replacement (Efraimidis–Spirakis A-ES,
    * r8) — p_reservoir_sample's quality-aware sibling, and the form a
    * training-data mix actually needs: sampling documents proportional to
    * LENGTH (token mass), so the drawn sample's token budget tracks the
    * corpus mix instead of over-representing short documents. Each doc
    * draws the deterministic uniform u ∈ (0,1) from the same affine hash
    * the reservoir op uses, its A-ES key is u^(1/w) with w = n_chars, and
    * the sample is the top-k by key — ONE TakeOrderedAndProject, the same
    * k·partition driver bound as every top-k in the surface. The pow is
    * identical-text IEEE in both engines (ordering and the emitted key
    * hash-gate bit-exactly); Round8Spec pins the A-ES monotonicity
    * property (heavier docs never rank below a lighter doc with the same
    * uniform). At 100 TB: a scan projection + top-k — no shuffle beyond
    * the k-row driver merge. */
  def pWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = s"(CAST(${Pipeline.admitHashSql(1000003)} AS DOUBLE) + 1.0) / 1000004.0"
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr(s"power($u, 1.0 / CAST(n_chars AS DOUBLE))").as("skey"))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(100)
  }

  val pWeightedSampleSql: String = {
    val u = s"(CAST(${Pipeline.admitHashSql(1000003)} AS DOUBLE) + 1.0) / 1000004.0"
    s"""SELECT doc_id, lang, n_chars,
       |  power($u, 1.0 / CAST(n_chars AS DOUBLE)) AS skey
       |FROM documents
       |ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin
  }

  // ----------------------------------------------- DSIR importance sampling

  private val DsirBuckets = 64

  private def dsirNorm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val dsirNormSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Per-doc hashed-word-bucket counts — the DSIR feature table. ONE
    * map-side-combined aggregate over the token scan; the bucket hash is
    * the portable GF(2^61−1) string polyhash, so both engines land every
    * word in the same bucket. */
  private[graft] def dsirDocBuckets(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        explode(split(dsirNorm(col("text")), " ")).as("word"))
      .withColumn("b", graft.functions.Poly.stringHash(col("word")) % DsirBuckets)
      .groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("cnt"))

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169 —
    * VERDICT r10 next #7): importance-resample the raw corpus toward a
    * TARGET distribution using hashed-ngram bucket frequencies — the
    * principled data-SELECTION operator the mix family (p_domain_mix /
    * p_temperature_mix set ratios; this op picks the documents).
    *
    *  - features: words hashed into 64 buckets by the portable polyhash
    *    (DSIR's hashed n-gram trick: fixed-size sufficient statistics
    *    regardless of vocabulary — at 100 TB the bucket tables are 64 rows
    *    per corpus, period);
    *  - target = the `lang='en'` slice (the stand-in for "looks like
    *    Wikipedia"; swapping the predicate swaps the target corpus);
    *  - per-bucket log-likelihood ratio with add-1 smoothing, 6-dp rounded
    *    and summed as EXACT DECIMAL per doc (count × rounded-llr — the
    *    importance log-weight, engine-identical by construction);
    *  - draw: Gumbel top-k (key = logw − ln(−ln(u)), u from the
    *    deterministic affine hash the sampling family shares) — sampling
    *    ∝ exp(logw) without replacement, as one TakeOrdered over a scan
    *    projection (the p_weighted_sample shape).
    *
    * Plan: token scan → ONE (doc, bucket) aggregate; bucket stats are
    * 64-row frames broadcast back; the per-doc rollup is the only other
    * shuffle. Round11Spec proves the drawn sample's bucket distribution
    * moves toward the target (KL(sample‖target) < KL(raw‖target)). */
  def pDsirSample(spark: SparkSession, dir: String): DataFrame =
    dsirSampleOf(Tables.fanout(Tables.table(spark, dir, "documents")), 100)

  /** Spine-complete 64-row LLR table from a reference corpus's (doc,
    * bucket) counts: per bucket, the add-1-smoothed target-vs-raw
    * log-likelihood ratio, 6-dp rounded then held as EXACT DECIMAL so
    * per-doc rollups are engine-identical. Buckets unseen in the
    * reference get the smoothed prior ratio — an arriving doc can always
    * be scored (the streaming screen's requirement). */
  private[graft] def dsirLlrOf(spark: SparkSession, db: DataFrame): DataFrame = {
    val B = DsirBuckets
    val raw = db.groupBy("b").agg(sum(col("cnt")).as("n_r"))
    val tgt = db.where(col("lang") === "en")
      .groupBy("b").agg(sum(col("cnt")).as("n_t"))
    val tots = db.agg(
      sum(col("cnt")).as("nr_tot"),
      sum(when(col("lang") === "en", col("cnt")).otherwise(0L)).as("nt_tot"))
    spark.range(B).select(col("id").as("b"))
      .join(raw, Seq("b"), "left").join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(tots))
      .select(col("b"),
        // ONE ln of the exactly-computed cross ratio (r11 hardening —
        // What's-wrong watch item): ln(a)-ln(b) exposed TWO libm calls
        // plus a subtraction to the 6-dp boundary; a single ln of
        // (a·d)/(b·c) — three exactly-rounded IEEE ops on bit-identical
        // integer-valued doubles — leaves exactly one libm call, same
        // argument in both engines
        round(
          log(((coalesce(col("n_t"), lit(0L)) + 1).cast("double")
              * (col("nr_tot") + B).cast("double"))
            / ((coalesce(col("n_r"), lit(0L)) + 1).cast("double")
              * (col("nt_tot") + B).cast("double"))),
          6).cast("decimal(18,6)").as("llr"))
  }

  private[graft] def dsirSampleOf(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    val db = dsirDocBuckets(docs).cache()
    val llr = dsirLlrOf(spark, db)
    val u = s"(CAST(${Pipeline.admitHashSql(1000003)} AS DOUBLE) + 1.0) / 1000004.0"
    db.join(broadcast(llr), Seq("b"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("cnt") * col("llr")).as("logw_dec"))
      .select(col("doc_id"), col("lang"),
        col("logw_dec").cast("double").as("logw"),
        round(col("logw_dec").cast("double")
          - log(-log(expr(u))), 6).as("skey"))
      .withColumn("logw", round(col("logw"), 6))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(k)
  }

  val pDsirSampleSql: String = {
    val u = s"(CAST(${Pipeline.admitHashSql(1000003)} AS DOUBLE) + 1.0) / 1000004.0"
    s"""WITH tok AS (
       |  SELECT doc_id, lang, unnest(string_split($dsirNormSql, ' ')) AS word
       |  FROM documents),
       |db AS (
       |  SELECT doc_id, lang, ${graft.ops.Dedup.polySql("word")} % $DsirBuckets AS b,
       |         COUNT(*) AS cnt
       |  FROM tok GROUP BY 1, 2, 3),
       |raw AS (SELECT b, SUM(cnt) AS n_r FROM db GROUP BY 1),
       |tgt AS (SELECT b, SUM(cnt) AS n_t FROM db WHERE lang = 'en' GROUP BY 1),
       |tots AS (
       |  SELECT SUM(cnt) AS nr_tot,
       |         SUM(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS nt_tot
       |  FROM db),
       |llr AS (
       |  SELECT raw.b,
       |    CAST(round(
       |      ln((CAST(COALESCE(tgt.n_t, 0) + 1 AS DOUBLE) * CAST(tots.nr_tot + $DsirBuckets AS DOUBLE))
       |        / (CAST(raw.n_r + 1 AS DOUBLE) * CAST(tots.nt_tot + $DsirBuckets AS DOUBLE))),
       |      6) AS DECIMAL(18,6)) AS llr
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots),
       |w AS (
       |  SELECT db.doc_id, db.lang, SUM(db.cnt * llr.llr) AS logw_dec
       |  FROM db JOIN llr ON db.b = llr.b GROUP BY 1, 2)
       |SELECT doc_id, lang, round(CAST(logw_dec AS DOUBLE), 6) AS logw,
       |  round(CAST(logw_dec AS DOUBLE) - ln(-ln($u)), 6) AS skey
       |FROM w ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin
  }

  // ------------------------------- span-level dedup inside the curation funnel

  /** Curation funnel WITH span-level dedup (r11 — the composition the Lee
    * et al. 2022 pipeline actually runs: gate → ExactSubstr removal →
    * exact dedup OF THE CLEANED TEXT): per stage, surviving docs AND
    * words — the loss accounting (p_gate_funnel's contract) extended to
    * the stage that removes PARTS of documents.
    *
    * The instructive composition effect this measures: span removal
    * CREATES exact duplicates (two docs that differed only in their copied
    * spans collapse once the spans are cut), so the downstream exact-dedup
    * stage removes docs the raw-text dedup could never see. Stages:
    *  - s0_raw: the corpus;
    *  - s1_gated: lang ∈ {en, fr} AND n_chars ≥ 200 (metadata gates — a
    *    scan-stage filter);
    *  - s2_span_clean: [[Dedup.substringRemoveOf]] over the survivors
    *    (docs unchanged in count; words drop by the removed-span mass);
    *  - s3_dedup: keep min(doc_id) per CLEANED-text md5 (the min-struct
    *    keeper — map-side combined, no window).
    * All counts exact integers; the whole funnel replays in DuckDB via
    * the shared removal chain ([[Dedup.substringRemoveChainSql]]). */
  def pCurateSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.fanout(Tables.table(spark, dir, "documents"))
    val nWords = size(split(dsirNorm(col("text")), " ")).cast("long")
    def stageRow(name: String, d: DataFrame, words: org.apache.spark.sql.Column) =
      d.agg(count(lit(1)).as("n_docs"), sum(words).as("n_words"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_words"))
    val gated = docs.where(col("lang").isin("en", "fr") && col("n_chars") >= 200)
    val cleaned = Dedup.substringRemoveOf(gated.select(col("doc_id"), col("text")))
      .select("doc_id", "kept_words", "clean_md5")
      .localCheckpoint() // two stage rows + the keeper aggregate below
    val deduped = cleaned.groupBy("clean_md5")
      .agg(min(struct(col("doc_id"), col("kept_words"))).as("k"))
      .select(col("k.kept_words").as("kept_words"))
    stageRow("s0_raw", docs, nWords)
      .unionAll(stageRow("s1_gated", gated, nWords))
      .unionAll(stageRow("s2_span_clean", cleaned, col("kept_words")))
      .unionAll(stageRow("s3_dedup", deduped, col("kept_words")))
      .orderBy("stage")
  }

  // the removal chain splices in AFTER stripMargin (its shingle-concat
  // continuation lines begin with the `||` operator, which a second
  // stripMargin pass would mangle — the d_index_expire precedent)
  val pCurateSpansSql: String =
    s"""WITH gd AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE lang IN ('en', 'fr') AND n_chars >= 200),
       |__SRM_CHAIN__,
       |ddp AS (
       |  SELECT clean_md5, min(doc_id) AS keep_id
       |  FROM srm_out GROUP BY 1),
       |ddw AS (
       |  SELECT s.kept_words FROM ddp d
       |  JOIN srm_out s ON s.doc_id = d.keep_id)
       |SELECT 's0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(length(string_split($dsirNormSql, ' '))) AS BIGINT) AS n_words
       |FROM documents
       |UNION ALL
       |SELECT 's1_gated', CAST(COUNT(*) AS BIGINT),
       |  CAST(SUM(length(string_split($dsirNormSql, ' '))) AS BIGINT)
       |FROM documents WHERE lang IN ('en', 'fr') AND n_chars >= 200
       |UNION ALL
       |SELECT 's2_span_clean', CAST(COUNT(*) AS BIGINT),
       |  CAST(SUM(kept_words) AS BIGINT) FROM srm_out
       |UNION ALL
       |SELECT 's3_dedup', CAST(COUNT(*) AS BIGINT),
       |  CAST(SUM(kept_words) AS BIGINT) FROM ddw
       |ORDER BY stage""".stripMargin
      .replace("__SRM_CHAIN__", graft.ops.Dedup.substringRemoveChainSql("gd"))

  // ------------------------------- selection → mix → pack composition

  /** DSIR→mix→pack (VERDICT r11 next #7 — p_curate_spans proved funnel
    * compositions gate cleanly; this is the SELECTION side): the staged
    * pipeline a pretraining data drop actually runs once cleaning is done.
    *  - s1_select: [[dsirSampleOf]] importance-resamples the corpus toward
    *    the target distribution (Gumbel top-200 — the data-SELECTION
    *    stage);
    *  - s2_mix: the survivors are domain-rebalanced with p_domain_mix's
    *    deterministic admit-hash rule — every source downsampled to the
    *    smallest selected source (ratios computed IN-PLAN over the
    *    selected slice, not the raw corpus: selection shifts the source
    *    histogram, and mixing must see the shifted one);
    *  - s3_pack: the mixed survivors are greedily packed into 512-token
    *    training sequences (p_pack_sequences' bucketed prefix-sum — no
    *    unpartitioned window), reporting sequence count and how many docs
    *    straddle a sequence boundary.
    * Per stage: surviving docs AND tokens (the p_gate_funnel loss-
    * accounting contract), so the drop's provenance ledger is one frame.
    * All counts exact integers; selection, thresholds, admits and the
    * pack prefix all replay in DuckDB. */
  def pSelectMixPack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.fanout(Tables.table(spark, dir, "documents"))
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(dsirNorm(col("text")), " ")).cast("long").as("n_tokens"))
    def stageRow(name: String, d: DataFrame) =
      d.agg(coalesce(count(lit(1)), lit(0L)).as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"),
          lit(0L).as("n_seqs"), lit(0L).as("n_split_docs"))
    // s1: DSIR Gumbel top-200
    val sel = dsirSampleOf(docs, 200).select("doc_id")
    val selToks = toks.join(sel, Seq("doc_id"), "left_semi")
      .localCheckpoint() // three downstream derivations share the slice
    // s2: admit-hash mix over the SELECTED slice's source histogram
    val counts = selToks.groupBy("source").agg(count(lit(1)).as("n_total"))
    val minN = counts.agg(min(col("n_total")).as("min_n"))
    val thresholds = counts.crossJoin(broadcast(minN))
      .select(col("source"), expr("min_n * 10000 div n_total").as("thresh_bp"))
    val mixed = selToks.join(broadcast(thresholds), Seq("source"))
      .where(Pipeline.admitHash(10000) < col("thresh_bp"))
      .select("doc_id", "source", "n_tokens")
    // s3: contiguous greedy pack, the p_pack_sequences bucketed shape
    val bucketed = mixed.withColumn("bucket", (col("doc_id") / 100L).cast("long"))
    val offsets = bucketed.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("bucket_toks"))
      .withColumn("bucket_off",
        coalesce(sum(col("bucket_toks")).over(
          Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "bucket_off")
    val inBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = bucketed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("start_tok",
        col("bucket_off") + sum(col("n_tokens")).over(inBucket) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr("start_tok div 512").as("start_seq"),
        expr("(start_tok + n_tokens - 1) div 512").as("end_seq"))
    val packRow = packed.agg(
        count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        (max(col("end_seq")) + 1).as("n_seqs"),
        sum(when(col("start_seq") =!= col("end_seq"), 1L).otherwise(0L))
          .as("n_split_docs"))
      .select(lit("s3_pack").as("stage"), col("n_docs"), col("n_tokens"),
        col("n_seqs"), col("n_split_docs"))
    stageRow("s0_raw", toks)
      .unionAll(stageRow("s1_select", selToks))
      .unionAll(stageRow("s2_mix", mixed))
      .unionAll(packRow)
      .orderBy("stage")
  }

  val pSelectMixPackSql: String = {
    val u = s"(CAST(${Pipeline.admitHashSql(1000003)} AS DOUBLE) + 1.0) / 1000004.0"
    val admit = Pipeline.admitHashSql(10000).replace("doc_id", "s.doc_id")
    s"""WITH tok AS (
       |  SELECT doc_id, lang, unnest(string_split($dsirNormSql, ' ')) AS word
       |  FROM documents),
       |db AS (
       |  SELECT doc_id, lang, ${graft.ops.Dedup.polySql("word")} % $DsirBuckets AS b,
       |         COUNT(*) AS cnt
       |  FROM tok GROUP BY 1, 2, 3),
       |raw AS (SELECT b, SUM(cnt) AS n_r FROM db GROUP BY 1),
       |tgt AS (SELECT b, SUM(cnt) AS n_t FROM db WHERE lang = 'en' GROUP BY 1),
       |tots AS (
       |  SELECT SUM(cnt) AS nr_tot,
       |         SUM(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS nt_tot
       |  FROM db),
       |llr AS (
       |  SELECT raw.b,
       |    CAST(round(
       |      ln((CAST(COALESCE(tgt.n_t, 0) + 1 AS DOUBLE) * CAST(tots.nr_tot + $DsirBuckets AS DOUBLE))
       |        / (CAST(raw.n_r + 1 AS DOUBLE) * CAST(tots.nt_tot + $DsirBuckets AS DOUBLE))),
       |      6) AS DECIMAL(18,6)) AS llr
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots),
       |wts AS (
       |  SELECT db.doc_id, SUM(db.cnt * llr.llr) AS logw_dec
       |  FROM db JOIN llr ON db.b = llr.b GROUP BY 1),
       |sel AS (
       |  SELECT doc_id FROM wts
       |  ORDER BY round(CAST(logw_dec AS DOUBLE) - ln(-ln($u)), 6) DESC, doc_id
       |  LIMIT 200),
       |nt AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split($dsirNormSql, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |st AS (SELECT nt.* FROM nt JOIN sel USING (doc_id)),
       |c AS (SELECT source, COUNT(*) AS n_total FROM st GROUP BY 1),
       |m AS (SELECT min(n_total) AS min_n FROM c),
       |th AS (SELECT source, min_n * 10000 // n_total AS thresh_bp
       |       FROM c CROSS JOIN m),
       |mx AS (
       |  SELECT s.doc_id, s.source, s.n_tokens
       |  FROM st s JOIN th ON s.source = th.source
       |  WHERE $admit < th.thresh_bp),
       |pk AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM mx)
       |SELECT 's0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(0 AS BIGINT) AS n_seqs, CAST(0 AS BIGINT) AS n_split_docs
       |FROM nt
       |UNION ALL
       |SELECT 's1_select', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tokens) AS BIGINT),
       |  CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM st
       |UNION ALL
       |SELECT 's2_mix', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tokens) AS BIGINT),
       |  CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM mx
       |UNION ALL
       |SELECT 's3_pack', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tokens) AS BIGINT),
       |  CAST(MAX((cum - 1) // 512) + 1 AS BIGINT),
       |  CAST(SUM(CASE WHEN (cum - n_tokens) // 512 <> (cum - 1) // 512
       |           THEN 1 ELSE 0 END) AS BIGINT)
       |FROM pk
       |ORDER BY stage""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_dp_release" -> (pDpRelease _),
    "p_fertility" -> (pFertility _),
    "p_weighted_sample" -> (pWeightedSample _),
    "p_dsir_sample" -> (pDsirSample _),
    "p_curate_spans" -> (pCurateSpans _),
    "p_select_mix_pack" -> (pSelectMixPack _))

  val oracles: Map[String, String] = Map(
    "p_dp_release" -> pDpReleaseSql,
    "p_fertility" -> pFertilitySql,
    "p_weighted_sample" -> pWeightedSampleSql,
    "p_dsir_sample" -> pDsirSampleSql,
    "p_select_mix_pack" -> pSelectMixPackSql,
    "p_curate_spans" -> pCurateSpansSql)
}
