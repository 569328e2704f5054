package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.8 continued (round 5): soft deduplication — duplicate-aware SAMPLING
  * WEIGHTS instead of hard drops. Modern data-mixture work (e.g. the
  * "deduplicate by downweighting" recipe) keeps every copy of a duplicated
  * document but scales its sampling weight by 1/n_copies, so the training
  * distribution matches the deduplicated corpus while ablations can still
  * dial the weight exponent. This op computes those weights and proves the
  * invariant Σ weights = |clusters| (the deduplicated corpus size) in-plan.
  */
object Pipeline3 {

  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Per-source soft-dedup accounting: every document carries weight
    * 1/n_copies of its exact-dup cluster (md5 of normalized text, the
    * d_exact key). Emitted per source: doc count, clusters REPRESENTED
    * (min-doc_id copy lives here), weight mass, and the duplication factor
    * n_docs / weight_mass.
    *
    * Scale shape — the corpus is shuffled ONCE, and never joined back:
    *  1. (fp, source) grain: count + min doc_id — map-side combined, so a
    *     boilerplate page in 10% of a 100 TB corpus collapses to one row
    *     per partition before the shuffle (the d_paragraph_dedup de-skew
    *     rule; no content-keyed window anywhere);
    *  2. fp grain: cluster totals and the representative (min over the
    *     per-source min-structs) — an aggregate over CLUSTER-count rows;
    *  3. join the two grains on fp (cluster-scale ⋈ cluster-scale,
    *     co-partitioned: both children of the same fp shuffle) and roll up
    *     by source. Per-copy weights are n_fs/n_total at the (fp, source)
    *     grain — the corpus-size row explosion a per-document weight join
    *     would cost never happens.
    * Weight terms are round(6dp) then decimal-summed (§4 order-proof). */
  def pDedupWeight(spark: SparkSession, dir: String): DataFrame =
    dedupWeightOf(Tables.table(spark, dir, "documents"))

  /** Core weight computation over any (doc_id, source, text) frame —
    * exposed so specs can plant duplicate corpora. */
  private[graft] def dedupWeightOf(docs: DataFrame): DataFrame = {
    val fs = docs
      .select(md5(norm(col("text"))).as("fp"), col("source"), col("doc_id"))
      .groupBy("fp", "source")
      .agg(count(lit(1)).as("n_fs"), min(col("doc_id")).as("min_doc"))
    // doc_id is unique, so the cluster representative is simply the copy
    // with the globally minimal doc_id — no struct tie-break needed
    val clusters = fs.groupBy("fp")
      .agg(sum(col("n_fs")).cast("long").as("n_total"),
        min(col("min_doc")).as("rep_doc"))
    fs.join(clusters, Seq("fp"))
      .select(col("source"), col("n_fs"),
        (col("min_doc") === col("rep_doc")).as("is_rep"),
        round(col("n_fs").cast("double") / col("n_total"), 6).as("w"))
      .groupBy("source")
      .agg(sum(col("n_fs")).cast("long").as("n_docs"),
        count(when(col("is_rep"), 1)).as("n_reps"),
        Tables.dsum(col("w")).as("weight_mass"))
      .withColumn("dup_factor",
        round(col("n_docs").cast("double") / col("weight_mass"), 6))
      .orderBy("source")
  }

  val pDedupWeightSql: String =
    s"""WITH fs AS (
       |  SELECT md5($normSql) AS fp, source,
       |    COUNT(*) AS n_fs, MIN(doc_id) AS min_doc
       |  FROM documents GROUP BY 1, 2),
       |cl AS (
       |  SELECT fp, CAST(SUM(n_fs) AS BIGINT) AS n_total,
       |    MIN(min_doc) AS rep_doc
       |  FROM fs GROUP BY 1),
       |j AS (
       |  SELECT fs.source, fs.n_fs,
       |    (fs.min_doc = cl.rep_doc) AS is_rep,
       |    round(CAST(fs.n_fs AS DOUBLE) / cl.n_total, 6) AS w
       |  FROM fs JOIN cl USING (fp)),
       |r AS (
       |  SELECT source, CAST(SUM(n_fs) AS BIGINT) AS n_docs,
       |    COUNT(CASE WHEN is_rep THEN 1 END) AS n_reps,
       |    CAST(SUM(CAST(w AS DECIMAL(30,6))) AS DOUBLE) AS weight_mass
       |  FROM j GROUP BY 1)
       |SELECT source, n_docs, n_reps, weight_mass,
       |  round(CAST(n_docs AS DOUBLE) / weight_mass, 6) AS dup_factor
       |FROM r ORDER BY source""".stripMargin

  /** Multi-epoch data scheduling (the "how many epochs of each domain"
    * planning step a fixed-token-budget training run needs): with a budget
    * of 2× the corpus and a uniform per-source target share, each source
    * repeats for ceil(target / its tokens) epochs, capped at 4 (the
    * repeated-data degradation rule of thumb) — small domains repeat, huge
    * domains are sub-sampled by the (deterministic) admit-hash downstream.
    *
    * Scale shape: ONE map-side-combined pass builds per-source token
    * totals; the budget derives from the SAME aggregate (grand total via a
    * broadcast one-row crossJoin — no second corpus scan); the epoch
    * arithmetic is integer column algebra over |sources| rows. The whole
    * plan touches the corpus once regardless of size. */
  def pEpochMix(spark: SparkSession, dir: String): DataFrame = {
    val perSrc = Tables.table(spark, dir, "documents")
      .select(col("source"),
        size(split(norm(col("text")), " ")).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
    val total = perSrc.agg(sum(col("tokens")).as("corpus_tokens"),
      count(lit(1)).as("n_sources"))
    perSrc.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("tokens"),
        expr("(2 * corpus_tokens) div n_sources").as("target_tokens"))
      .withColumn("epochs",
        least(expr("(target_tokens + tokens - 1) div tokens"), lit(4L)))
      .withColumn("realized_tokens", col("epochs") * col("tokens"))
      .withColumn("shortfall",
        greatest(col("target_tokens") - col("realized_tokens"), lit(0L)))
      .orderBy("source")
  }

  val pEpochMixSql: String =
    s"""WITH s AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(CAST(len(string_split($normSql, ' ')) AS BIGINT)) AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1),
       |t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS corpus_tokens,
       |             COUNT(*) AS n_sources FROM s),
       |p AS (
       |  SELECT source, n_docs, tokens,
       |    CAST((2 * corpus_tokens) // n_sources AS BIGINT) AS target_tokens
       |  FROM s CROSS JOIN t),
       |e AS (
       |  SELECT source, n_docs, tokens, target_tokens,
       |    CAST(least((target_tokens + tokens - 1) // tokens, 4) AS BIGINT) AS epochs
       |  FROM p)
       |SELECT source, n_docs, tokens, target_tokens, epochs,
       |  CAST(epochs * tokens AS BIGINT) AS realized_tokens,
       |  CAST(greatest(target_tokens - epochs * tokens, 0) AS BIGINT) AS shortfall
       |FROM e ORDER BY source""".stripMargin

  /** Training-shard manifest (r6) — the trainer-handoff artifact: docs
    * packed contiguously (doc_id order) into ~4096-token shards, manifest
    * row per shard with (n_docs, n_tokens, first_doc, last_doc) — what a
    * data-loader consumes to schedule workers without touching data.
    *
    * Boundary rule: a doc belongs to the shard its FIRST token lands in,
    * so docs are never split (the standard contiguous-manifest trade vs
    * [[Pipeline2.pPackSequences]], which splits across sequences) and a
    * shard may overflow by at most one tail doc.
    *
    * Scale shape: p_pack_sequences' two-level prefix sum — the only
    * ordered window runs over corpus/W BUCKET TOTALS (tiny), per-bucket
    * prefixes are partitioned windows, the manifest rollup map-side
    * combines. No raw-row global window anywhere (PlanAuditSpec's ban). */
  def pShardManifest(spark: SparkSession, dir: String): DataFrame = {
    val shardBudget = 4096L
    val bucketW = 100L
    val toks = Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(norm(col("text")), " ")).cast("long").as("n_tokens"),
        // integer `div`, not `/`+cast: Spark `/` on longs is double
        // division, inexact for doc_id >= 2^53 — a misrounded bucket there
        // would break the two-level prefix sum's order-preserving partition
        expr(s"doc_id div $bucketW").as("bucket"))
    val bucketTotals = toks.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("bucket_toks"))
    val offsets = bucketTotals.withColumn("bucket_off",
      coalesce(sum(col("bucket_toks")).over(
        org.apache.spark.sql.expressions.Window.orderBy("bucket")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("bucket", "bucket_off")
    val inBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    toks.join(broadcast(offsets), Seq("bucket"))
      .withColumn("start_tok",
        col("bucket_off") + sum(col("n_tokens")).over(inBucket) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"start_tok div $shardBudget").as("shard_id"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard_id")
  }

  val pShardManifestSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t)
       |SELECT (cum - n_tokens) // 4096 AS shard_id,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin

  /** Quality-threshold curation curve (r6) — the other dial-tuning sweep
    * (s_tau_sweep's sibling for the quality gate): for each candidate
    * cutoff, surviving doc count and token mass. Choosing the quality
    * threshold IS a data-vs-quality trade; at 100 TB the curve is computed
    * exactly like this — score once, roll up every cutoff from one pass
    * (5-row broadcast grid), never re-score. Hash-gated by composition
    * over the already-replayable t_quality_score. */
  def pQualityCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = TextOps.tQualityScore(spark, dir).select("doc_id", "quality")
    val toks = Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(norm(col("text")), " ")).cast("long").as("n_tokens"))
    val taus = Seq(0.5, 0.6, 0.7, 0.8, 0.9).toDF("threshold")
    q.join(toks, Seq("doc_id"))
      .crossJoin(broadcast(taus))
      .where(col("quality") >= col("threshold"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"))
      .orderBy("threshold")
  }

  val pQualityCurveSql: String =
    s"""WITH q AS (SELECT doc_id, quality FROM (${TextOps.tQualityScoreSql}) t),
       |tk AS (SELECT doc_id,
       |         CAST(length(string_split($normSql, ' ')) AS BIGINT) AS n_tokens
       |       FROM documents),
       |taus AS (SELECT unnest([0.5e0, 0.6e0, 0.7e0, 0.8e0, 0.9e0]) AS threshold)
       |SELECT threshold, COUNT(*) AS n_kept,
       |  CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
       |FROM q JOIN tk USING (doc_id) CROSS JOIN taus
       |WHERE quality >= threshold
       |GROUP BY 1 ORDER BY threshold""".stripMargin

  /** Dataset card: the per-source summary table a corpus release ships —
    * doc/word volumes, mean document length, Gopher-rule pass rate, the
    * majority language and its share (language-contamination telemetry),
    * and language fan. Composes t_gopher_filter's replayable per-doc
    * verdict (one tokenizing scan) with one source-keyed rollup; majority
    * language = count + rank with smallest-lang tie-break (the q_mode_median
    * determinism rule); shares in exact integer ppm. All keys are
    * bounded-cardinality metadata (source, lang) — map-side combined,
    * no content keys. */
  def pDatasetCard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = TextOps5.tGopherFilter(spark, dir)
      .select("doc_id", "n_words", "passes")
    val base = Tables.table(spark, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars")
      .join(g, "doc_id")
    val wl = Window.partitionBy("source").orderBy(col("c").desc, col("lang"))
    val top = base.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(wl)).where(col("r") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("c").as("top_c"))
    base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").cast("long").as("n_words"),
        expr("round(cast(sum(cast(n_chars as decimal(30,6))) as double) / count(1), 4)")
          .as("mean_chars"),
        expr("(1000000 * cast(sum(case when passes then 1 else 0 end) as bigint)) div count(1)")
          .as("pass_ppm"),
        countDistinct("lang").as("n_langs"))
      .join(top, "source")
      .select(col("source"), col("n_docs"), col("n_words"), col("mean_chars"),
        col("pass_ppm"), col("top_lang"),
        expr("(1000000 * top_c) div n_docs").as("top_lang_ppm"),
        col("n_langs"))
      .orderBy("source")
  }

  val pDatasetCardSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, n_words, passes FROM (${TextOps5.tGopherFilterSql}) t),
       |base AS (
       |  SELECT d.source, d.lang, d.n_chars, g.n_words, g.passes
       |  FROM documents d JOIN g ON g.doc_id = d.doc_id),
       |lc AS (SELECT source, lang, COUNT(*) AS c FROM base GROUP BY 1, 2),
       |top AS (
       |  SELECT source, lang AS top_lang, CAST(c AS BIGINT) AS top_c,
       |    row_number() OVER (PARTITION BY source ORDER BY c DESC, lang) AS r
       |  FROM lc),
       |agg AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_words) AS BIGINT) AS n_words,
       |    round(CAST(SUM(CAST(n_chars AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 4) AS mean_chars,
       |    (1000000 * CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*) AS pass_ppm,
       |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
       |  FROM base GROUP BY 1)
       |SELECT a.source, a.n_docs, a.n_words, a.mean_chars, a.pass_ppm,
       |  t.top_lang, (1000000 * t.top_c) // a.n_docs AS top_lang_ppm, a.n_langs
       |FROM agg a JOIN top t ON t.source = a.source AND t.r = 1
       |ORDER BY a.source""".stripMargin

  /** Temperature-based language mixing (the mT5/XLM-R sampling rule,
    * Conneau et al. 2020): sample languages proportional to c^α (α = 0.5)
    * instead of raw counts, boosting low-resource languages without
    * flattening the mix entirely. All arithmetic after one IEEE-exact sqrt
    * per language is INTEGER (floor to ppm scale, integer sums/divisions),
    * so the whole report is bit-portable: sqrt is correctly rounded by
    * IEEE 754 in both engines — the one double op the gate relies on.
    * Emits per language: raw count, natural share, temperature share, the
    * target draw out of a 1000-doc budget, and the implied epochs_ppm
    * (how many times a low-resource language's corpus is re-seen — the
    * number you check against memorization risk). Shape: one map-side
    * count aggregate (|langs| rows) + one-row totals broadcast. */
  def pTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.table(spark, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs")) * 1000000))
    val totals = counts.agg(sum(col("n_docs")).as("tot_n"), sum(col("w")).as("tot_w"))
    counts.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"),
        expr("n_docs * 1000000 div tot_n").as("share_nat_ppm"),
        expr("w * 1000000 div tot_w").as("share_temp_ppm"),
        expr("1000 * w div tot_w").as("target_docs"),
        expr("(1000 * w div tot_w) * 1000000 div n_docs").as("epochs_ppm"))
      .orderBy("lang")
  }

  val pTemperatureMixSql: String =
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(floor(sqrt(COUNT(*)) * 1000000) AS BIGINT) AS w
      |  FROM documents GROUP BY lang),
      |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_n,
      |             CAST(SUM(w) AS BIGINT) AS tot_w FROM c)
      |SELECT lang, n_docs,
      |  CAST(n_docs * 1000000 // tot_n AS BIGINT) AS share_nat_ppm,
      |  CAST(w * 1000000 // tot_w AS BIGINT) AS share_temp_ppm,
      |  CAST(1000 * w // tot_w AS BIGINT) AS target_docs,
      |  CAST((1000 * w // tot_w) * 1000000 // n_docs AS BIGINT) AS epochs_ppm
      |FROM c, t ORDER BY lang""".stripMargin

  /** Exact-k uniform corpus sample (k = 100) — the distributed form of
    * reservoir sampling: give every row a deterministic pseudo-random key
    * (the portable multiplicative admit hash) and take the global top-k by
    * (key, doc_id). Unlike the rate-based admit-percent samplers
    * (p_sample_stratified, p_mix_report) this yields EXACTLY k rows
    * regardless of corpus size, and unlike a global sort it plans as
    * TakeOrderedAndProject — per-partition top-k heaps, k rows per
    * partition to the driver, no shuffle of the corpus. The eval-set /
    * human-review draw every curation pipeline needs. */
  def pReservoirSample(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        Pipeline.admitHash(1000003).as("skey"))
      .orderBy(col("skey"), col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("lang"), col("n_chars"))

  val pReservoirSampleSql: String =
    s"""SELECT doc_id, lang, n_chars FROM documents
       |ORDER BY ${graft.ops.Pipeline.admitHashSql(1000003)}, doc_id
       |LIMIT 100""".stripMargin

  /** k-anonymity audit over the quasi-identifier pair (lang, source) with
    * k = 5 — the re-identification risk report run before any data release:
    * a row whose quasi-identifier combination matches fewer than k rows is
    * individually distinguishable. One map-side group count (bounded fan:
    * |langs|×|sources| groups) + a one-row rollup; risk share in exact
    * integer ppm. At 100 TB the same two aggregates run unchanged — the
    * group-key domain, not the corpus, bounds the shuffle. */
  def pKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val groups = Tables.table(spark, dir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      sum(col("n")).as("n_rows"),
      sum(when(col("n") < k, 1L).otherwise(0L)).as("groups_below_k"),
      sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"),
      min(col("n")).as("min_group"))
      .select(col("n_groups"), col("n_rows"), col("groups_below_k"),
        col("rows_at_risk"), col("min_group"),
        expr("rows_at_risk * 1000000 div n_rows").as("risk_ppm"),
        lit(k).as("k"))
  }

  val pKAnonymitySql: String =
    """WITH g AS (
      |  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2)
      |SELECT COUNT(*) AS n_groups,
      |  CAST(SUM(n) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS groups_below_k,
      |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
      |  MIN(n) AS min_group,
      |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) * 1000000
      |       // SUM(n) AS BIGINT) AS risk_ppm,
      |  5 AS k
      |FROM g""".stripMargin

  /** Declarative data-expectations suite (the dbt-tests / Great-
    * Expectations surface): six standing contracts — two referential-
    * integrity checks (orders→customer, lineitem→orders FKs via left-anti
    * probes), a primary-key uniqueness check, a range check, a not-null
    * check, and a derived-column consistency check (documents.n_chars must
    * equal length(text) — the class of silently-stale denormalized column
    * a pipeline regression corrupts first). One row per expectation:
    * (n_checked, n_failed, pass). Every check is a scan + aggregate or a
    * key-partitioned anti-join — shuffle bounded by key cardinality, the
    * shape a nightly 100 TB contract run needs. */
  def pExpectations(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.table(spark, dir, n)
    val custKeys = t("customer").select(col("c_custkey"))
    val orderKeys = t("orders").select(col("o_orderkey"))
    val fkOrders = t("orders")
      .join(custKeys, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("f"))
      .select(lit("orders_custkey_fk").as("expectation"),
        lit(t("orders").count()).as("n_checked"), col("f").as("n_failed"))
    val fkLineitem = t("lineitem")
      .join(orderKeys, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("f"))
      .select(lit("lineitem_orderkey_fk").as("expectation"),
        lit(t("lineitem").count()).as("n_checked"), col("f").as("n_failed"))
    val pkUnique = t("customer").agg(
        count(lit(1)).as("n"), countDistinct(col("c_custkey")).as("d"))
      .select(lit("customer_pk_unique").as("expectation"),
        col("n").as("n_checked"), (col("n") - col("d")).as("n_failed"))
    val priceRange = t("orders").agg(count(lit(1)).as("n"),
        sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("f"))
      .select(lit("orders_totalprice_nonneg").as("expectation"),
        col("n").as("n_checked"), col("f").as("n_failed"))
    val valueNotNull = t("events").agg(count(lit(1)).as("n"),
        sum(col("value").isNull.cast("long")).as("f"))
      .select(lit("events_value_not_null").as("expectation"),
        col("n").as("n_checked"), col("f").as("n_failed"))
    val derivedConsistent = t("documents").agg(count(lit(1)).as("n"),
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)).as("f"))
      .select(lit("documents_nchars_consistent").as("expectation"),
        col("n").as("n_checked"), col("f").as("n_failed"))
    Seq(fkOrders, fkLineitem, pkUnique, priceRange, valueNotNull,
        derivedConsistent)
      .reduce(_ union _)
      .withColumn("pass", col("n_failed") === 0)
      .orderBy("expectation")
  }

  val pExpectationsSql: String =
    """WITH checks AS (
      |  SELECT 'orders_custkey_fk' AS expectation,
      |    (SELECT COUNT(*) FROM orders) AS n_checked,
      |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |      AS n_failed
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_fk',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL
      |  SELECT 'customer_pk_unique',
      |    (SELECT COUNT(*) FROM customer),
      |    (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
      |  UNION ALL
      |  SELECT 'orders_totalprice_nonneg',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FILTER (o_totalprice < 0) FROM orders)
      |  UNION ALL
      |  SELECT 'events_value_not_null',
      |    (SELECT COUNT(*) FROM events),
      |    (SELECT COUNT(*) FILTER (value IS NULL) FROM events)
      |  UNION ALL
      |  SELECT 'documents_nchars_consistent',
      |    (SELECT COUNT(*) FROM documents),
      |    (SELECT COUNT(*) FILTER (n_chars <> length(text)) FROM documents))
      |SELECT expectation, n_checked, n_failed, n_failed = 0 AS pass
      |FROM checks ORDER BY expectation""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_expectations" -> (pExpectations _),
    "p_k_anonymity" -> (pKAnonymity _),
    "p_temperature_mix" -> (pTemperatureMix _),
    "p_reservoir_sample" -> (pReservoirSample _),
    "p_dedup_weight" -> (pDedupWeight _),
    "p_epoch_mix" -> (pEpochMix _),
    "p_shard_manifest" -> (pShardManifest _),
    "p_quality_curve" -> (pQualityCurve _),
    "p_dataset_card" -> (pDatasetCard _))

  val oracles: Map[String, String] = Map(
    "p_expectations" -> pExpectationsSql,
    "p_k_anonymity" -> pKAnonymitySql,
    "p_temperature_mix" -> pTemperatureMixSql,
    "p_reservoir_sample" -> pReservoirSampleSql,
    "p_dedup_weight" -> pDedupWeightSql,
    "p_epoch_mix" -> pEpochMixSql,
    "p_shard_manifest" -> pShardManifestSql,
    "p_quality_curve" -> pQualityCurveSql,
    "p_dataset_card" -> pDatasetCardSql)
}
