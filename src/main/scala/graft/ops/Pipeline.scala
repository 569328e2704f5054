package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.8 End-to-end training-data pipeline compositions — the operators a
  * 100 TB curation run actually chains: quality-gate → language-filter →
  * dedup (p_curate), and train/test decontamination (p_decontaminate).
  * Both are pure compositions of §2.3/§2.4 primitives — one plan each, so
  * Catalyst fuses the filters into the scan and the whole curation pass
  * stays two shuffles (dedup fingerprint + the contamination join). */
object Pipeline {

  private def norm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Deterministic multiplicative admit hash, ANSI-overflow-safe: the
    * multiply runs in DECIMAL(20,0)×DECIMAL(10,0) → DECIMAL(31,0) — exact
    * in both Spark and DuckDB for EVERY possible BIGINT doc_id (19 digits
    * + 10 ≪ 38). The previous LONG multiply threw ARITHMETIC_OVERFLOW
    * under ANSI mode (the repo default) once doc_id ≥ 2⁶³/2654435761
    * ≈ 3.47e9 — i.e. the query ABORTED on a corpus with more documents
    * than that; a 100 TB corpus qualifies. Same Knuth multiplier, same
    * bucket values, no overflow at any id. PipelineSpec pushes
    * doc_id ≥ 2⁴⁰ through this expression as the regression gate. */
  private[graft] def admitHashSql(modulus: Int, keyCol: String = "doc_id"): String =
    s"(CAST($keyCol AS DECIMAL(20,0)) * CAST(2654435761 AS DECIMAL(10,0)) + 40503) % $modulus"
  private[graft] def admitHash(modulus: Int): org.apache.spark.sql.Column =
    expr(admitHashSql(modulus))

  /** Curation: quality ≥ 0.55, metadata lang ∈ {en, fr}, exact-dup collapsed
    * (keep min doc_id per md5 fingerprint). The dedup "keeper" is a
    * `min(struct(doc_id, <row>))` aggregate keyed on the fingerprint — the
    * struct carries the whole surviving row, so keep-first needs NO window
    * and NO join-back. Unlike a fingerprint-partitioned window (which ships
    * every occurrence of a hot fingerprint into one task), the aggregate is
    * map-side combined: a document duplicated across 10% of a 100 TB corpus
    * collapses to one row per partition before the shuffle. */
  def pCurate(spark: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nTokens = size(split(norm(col("text")), " ")).cast("double")
    val nPunct = size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double")
    val nAlpha = size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0))).cast("double")
    val nStop = size(regexp_extract_all(concat(lit(" "), norm(col("text")), lit(" ")),
      lit(" (the|a|of|and|to|in|is|it) "), lit(0))).cast("double")
    val quality = round(
      least(nTokens / 50.0, lit(1.0)) * 0.25
        + (lit(1.0) - least(nPunct / nChars * 5.0, lit(1.0))) * 0.25
        + least(nStop / nTokens * 5.0, lit(1.0)) * 0.25
        + nAlpha / nChars * 0.25, 6)
    Tables.table(spark, dir, "documents")
      .where(col("lang").isin("en", "fr"))
      .select(col("doc_id"), col("lang"), quality.as("quality"),
        md5(norm(col("text"))).as("fp"))
      .where(col("quality") >= 0.55)
      .groupBy("fp")
      .agg(min(struct(col("doc_id"), col("lang"), col("quality"))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.quality").as("quality"))
      .orderBy("doc_id")
  }

  val pCurateSql: String = {
    val nChars = "CAST(length(text) AS DOUBLE)"
    val nTokens = s"CAST(length(string_split($normSql, ' ')) AS DOUBLE)"
    val nPunct = "CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)"
    val nAlpha = "CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)"
    val nStop = s"CAST(length(regexp_extract_all(' ' || $normSql || ' ', ' (the|a|of|and|to|in|is|it) ')) AS DOUBLE)"
    s"""WITH q AS (
       |  SELECT doc_id, lang, md5($normSql) AS fp,
       |    round(least($nTokens / 50.0, 1.0) * 0.25
       |      + (1.0 - least($nPunct / $nChars * 5.0, 1.0)) * 0.25
       |      + least($nStop / $nTokens * 5.0, 1.0) * 0.25
       |      + $nAlpha / $nChars * 0.25, 6) AS quality
       |  FROM documents WHERE lang IN ('en', 'fr')),
       |g AS (SELECT q.*, min(doc_id) OVER (PARTITION BY fp) AS keep
       |      FROM q WHERE quality >= 0.55)
       |SELECT doc_id, lang, quality FROM g WHERE doc_id = keep
       |ORDER BY doc_id""".stripMargin
  }

  /** Train/test decontamination: test split = doc_id % 4 == 0; flag every
    * train doc whose word-5-gram Jaccard with ANY test doc is ≥ 0.5 (the
    * standard benchmark-leak sweep). Same inverted-index blocking as
    * d_ngram_jaccard, restricted to cross-split pairs — at 100 TB the test
    * side is tiny, so the candidate join is effectively a semi-broadcast. */
  def pDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.filteredShingles(spark, dir).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val train = sh.where(col("doc_id") % 4 =!= 0)
    val test = sh.where(col("doc_id") % 4 === 0)
    train.as("a").join(test.as("b"), col("a.h") === col("b.h"))
      .groupBy(col("a.doc_id").as("train_id"), col("b.doc_id").as("test_id"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.as("sa"), col("train_id") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("test_id") === col("sb.doc_id"))
      .select(col("train_id"), col("test_id"),
        round(col("shared").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("shared")), 6).as("jaccard"))
      .where(col("jaccard") >= 0.5)
      .orderBy("train_id", "test_id")
  }

  val pDecontaminateSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
       |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
       |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,4) OVER w IS NOT NULL),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS train_id, b.doc_id AS test_id, COUNT(*) AS shared
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle
       |  WHERE a.doc_id % 4 <> 0 AND b.doc_id % 4 = 0
       |  GROUP BY 1, 2)
       |SELECT train_id, test_id,
       |  round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) AS jaccard
       |FROM pairs JOIN sizes sa ON train_id = sa.doc_id JOIN sizes sb ON test_id = sb.doc_id
       |WHERE round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) >= 0.5
       |ORDER BY train_id, test_id""".stripMargin

  /** Deterministic stratified sampling: ~10% per (source, lang) stratum via
    * a multiplicative hash-mod on doc_id — reproducible across runs/engines
    * (never rand(): a resumable 100 TB pipeline needs the same sample on
    * retry). One partial-agg pass computes per-stratum totals, sample
    * counts and a sample checksum. The admit hash is [[admitHash]] —
    * decimal-exact and overflow-free for every BIGINT doc_id. */
  def pSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val bucket = admitHash(100)
    Tables.table(spark, dir, "documents")
      .select(col("source"), col("lang"), col("doc_id"), bucket.as("bucket"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_total"),
        count(when(col("bucket") < 10, 1)).as("n_sampled"),
        sum(when(col("bucket") < 10, col("doc_id"))).as("sample_idsum"))
      .orderBy("source", "lang")
  }

  val pSampleStratifiedSql: String =
    s"""SELECT source, lang, COUNT(*) AS n_total,
       |  COUNT(CASE WHEN ${admitHashSql(100)} < 10 THEN 1 END) AS n_sampled,
       |  CAST(SUM(CASE WHEN ${admitHashSql(100)} < 10 THEN doc_id END) AS BIGINT) AS sample_idsum
       |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin

  /** Token-budget selection: per source, admit documents in doc_id order
    * until the cumulative whitespace-token count crosses 2000 — the "fill
    * the training mix per domain" primitive. One window (running sum per
    * source partition); the admit predicate is `cum − own ≤ budget`, i.e.
    * the document that CROSSES the budget is still admitted (budget is a
    * floor on coverage, not a hard cap), which keeps every source
    * represented even when its first document alone exceeds the budget. */
  def pTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2000L
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.table(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(norm(col("text")), " ")).cast("long").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .where(col("cum_tok") - col("n_tok") <= budget)
      .orderBy("source", "doc_id")
  }

  val pTokenBudgetSql: String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    CAST(length(string_split($normSql, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT source, doc_id, n_tok,
       |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
       |  FROM t)
       |SELECT source, doc_id, n_tok, cum_tok FROM c
       |WHERE cum_tok - n_tok <= 2000 ORDER BY source, doc_id""".stripMargin

  /** Training-mix composition report — the dashboard row a data lead reads
    * before a run: per (source, lang) docs, whitespace tokens, exact-dup
    * rate, mean quality proxy (alpha ratio). One scan, one partial agg:
    * the dup rate reuses the md5-fingerprint count-distinct inside the
    * same aggregate (no second pass). */
  def pMixReport(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = size(split(norm(col("text")), " ")).cast("long")
    val nChars = length(col("text")).cast("double")
    val nAlpha = size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0))).cast("double")
    Tables.table(spark, dir, "documents")
      .select(col("source"), col("lang"), nTokens.as("n_tok"),
        md5(norm(col("text"))).as("fp"), (nAlpha / nChars).as("alpha_ratio"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("fp")).as("n_unique"),
        round((count(lit(1)) - countDistinct(col("fp"))).cast("double")
          / count(lit(1)), 6).as("dup_rate"),
        round(Tables.dsum(col("alpha_ratio")) / count(lit(1)), 6).as("mean_alpha"))
      .orderBy("source", "lang")
  }

  val pMixReportSql: String =
    s"""SELECT source, lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CAST(length(string_split($normSql, ' ')) AS BIGINT)) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(DISTINCT md5($normSql)) AS BIGINT) AS n_unique,
       |  round((COUNT(*) - COUNT(DISTINCT md5($normSql))) * 1.0 / COUNT(*), 6) AS dup_rate,
       |  round(CAST(SUM(CAST(
       |      CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
       |    AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS mean_alpha
       |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin

  /** Incremental-batch dedup — THE production ingest pattern: a new batch
    * (doc_id % 10 == 7 stands in for today's crawl) checked against the
    * existing corpus, never corpus × corpus. Exact dups via fingerprint
    * join; near-dups via the shingle inverted index restricted to
    * cross-side pairs (docs already exact-flagged are excluded from the
    * near pass). At 100 TB the batch side is tiny relative to the corpus,
    * so both probes are effectively semi-broadcasts; the corpus is never
    * self-joined. */
  def pIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
    val isNew = col("doc_id") % 10 === 7
    val fps = docs.select(col("doc_id"), md5(norm(col("text"))).as("fp"))
    val exact = fps.where(isNew).as("n")
      .join(fps.where(!isNew).as("c"), col("n.fp") === col("c.fp"))
      .groupBy(col("n.doc_id").as("doc_id"))
      .agg(min(col("c.doc_id")).as("dup_of"))
      .select(col("doc_id"), col("dup_of"), lit("exact").as("kind"))
    val sh = Dedup.filteredShingles(spark, dir).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val near = sh.where(isNew).as("a")
      .join(sh.where(!isNew).as("b"), col("a.h") === col("b.h"))
      .groupBy(col("a.doc_id").as("new_id"), col("b.doc_id").as("corpus_id"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.as("sa"), col("new_id") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("corpus_id") === col("sb.doc_id"))
      .where(round(col("shared").cast("double")
        / (col("sa.n_sh") + col("sb.n_sh") - col("shared")), 6) >= 0.5)
      .join(exact.select(col("doc_id").as("x_id")), col("new_id") === col("x_id"), "left_anti")
      .groupBy("new_id")
      .agg(min(col("corpus_id")).as("dup_of"))
      .select(col("new_id").as("doc_id"), col("dup_of"), lit("near").as("kind"))
    exact.unionByName(near).orderBy("doc_id")
  }

  val pIncrementalDedupSql: String =
    s"""WITH fps AS (SELECT doc_id, md5($normSql) AS fp FROM documents),
       |exact AS (
       |  SELECT n.doc_id AS doc_id, min(c.doc_id) AS dup_of, 'exact' AS kind
       |  FROM fps n JOIN fps c ON n.fp = c.fp
       |  WHERE n.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
       |  GROUP BY n.doc_id),
       |tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
       |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
       |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,4) OVER w IS NOT NULL),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       |near AS (
       |  SELECT p.doc_id AS doc_id, min(p.corpus_id) AS dup_of, 'near' AS kind
       |  FROM (SELECT a.doc_id AS doc_id, b.doc_id AS corpus_id, COUNT(*) AS shared
       |        FROM sh a JOIN sh b ON a.shingle = b.shingle
       |        WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7
       |        GROUP BY 1, 2) p
       |  JOIN sizes sa ON p.doc_id = sa.doc_id
       |  JOIN sizes sb ON p.corpus_id = sb.doc_id
       |  WHERE round(p.shared*1.0/(sa.n_sh + sb.n_sh - p.shared), 6) >= 0.5
       |    AND p.doc_id NOT IN (SELECT doc_id FROM exact)
       |  GROUP BY p.doc_id)
       |SELECT * FROM exact UNION ALL SELECT * FROM near ORDER BY doc_id""".stripMargin

  /** THE end-to-end curation flagship — every gate a 100 TB pre-training
    * run chains, in ONE plan: language filter → quality score → PII gate →
    * repetition gate (all fused into the scan projection) → exact-dup
    * keep-min (one fp-window shuffle) → pairwise near-dup keep-earliest
    * (shingle inverted-index join restricted to survivors) → per-source
    * token budget (one window). Every per-doc gate rides the SAME scan
    * projection — adding a gate costs zero extra passes — and the shuffles
    * are the dedup family's own (fp window, shingle-index join and its
    * aggregates, budget window): all linear in the corpus, nothing
    * quadratic, small sides broadcast. The PII gate is vacuous on the
    * synthetic corpus (no PII) but sits in the plan; Text2Spec proves its
    * semantics on planted data. */
  def pCurateFull(spark: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nTokens = size(split(norm(col("text")), " ")).cast("double")
    val nPunct = size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double")
    val nAlpha = size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0))).cast("double")
    val nStop = size(regexp_extract_all(concat(lit(" "), norm(col("text")), lit(" ")),
      lit(" (the|a|of|and|to|in|is|it) "), lit(0))).cast("double")
    val quality = round(
      least(nTokens / 50.0, lit(1.0)) * 0.25
        + (lit(1.0) - least(nPunct / nChars * 5.0, lit(1.0))) * 0.25
        + least(nStop / nTokens * 5.0, lit(1.0)) * 0.25
        + nAlpha / nChars * 0.25, 6)
    val ws = split(norm(col("text")), " ")
    val rep = lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws)
    val nPii =
      size(regexp_extract_all(col("text"), lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))) +
        size(regexp_extract_all(col("text"), lit("\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"), lit(0))) +
        size(regexp_extract_all(col("text"), lit("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"), lit(0)))

    // r13 (guide §4.4's duplicated-evaluation problem, Scala-expression
    // form, found by stage profiling): the gate predicate references the
    // regex-computed columns, so Catalyst pushed the WHOLE five-regex
    // evaluation down through the fanout exchange into the single-split
    // scan's Filter (one 0.9 s task) — and the projection above the
    // exchange recomputed it all for surviving rows. Fix: evaluate the
    // gates ONCE, parallel, into a narrow per-doc proxy row (doc_id,
    // source, quality, fp, n_tok, rep, n_pii — no text), materialize it,
    // and filter ABOVE the materialization where no pushdown can reach.
    // This is guide §8's decision-pass shape: at 100 TB this proxy is the
    // fingerprint table a curation pipeline materializes anyway.
    val gateCols = Tables.fanout(Tables.table(spark, dir, "documents")
        .where(col("lang").isin("en", "fr")))
      .select(col("doc_id"), col("source"), quality.as("quality"),
        md5(norm(col("text"))).as("fp"),
        size(split(norm(col("text")), " ")).cast("long").as("n_tok"),
        rep.as("rep"), nPii.as("n_pii"))
      .localCheckpoint()
    val gated = gateCols
      .where(col("quality") >= 0.55 && col("n_pii") === 0 && col("rep") <= 0.6)
    // exact-dup keep-first: min(struct) aggregate on fp — map-side combined,
    // skew-immune (see pCurate scaladoc); the struct carries the full row
    val keepExact = gated
      .groupBy("fp")
      .agg(min(struct(col("doc_id"), col("source"), col("quality"),
        col("n_tok"))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
        col("r.quality").as("quality"), col("r.n_tok").as("n_tok"))

    // near-dup keep-earliest among survivors: the shingle pipeline runs
    // over ONLY the surviving docs (broadcast semi-join restricts the scan
    // before any hashing) — dropped rows never pay the shingle cost
    val ids = keepExact.select("doc_id")
    val sh = Dedup.filteredShinglesOf(
      Tables.fanout(Tables.table(spark, dir, "documents"))
        .join(broadcast(ids), Seq("doc_id"), "left_semi")).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val dropNear = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .where(round(col("shared").cast("double")
        / (col("sa.n_sh") + col("sb.n_sh") - col("shared")), 6) >= 0.5)
      .select(col("doc_b").as("drop_id")).distinct()
    val kept = keepExact.join(dropNear, col("doc_id") === col("drop_id"), "left_anti")

    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kept.withColumn("cum_tok", sum(col("n_tok")).over(w))
      .where(col("cum_tok") - col("n_tok") <= 4000L)
      .select(col("source"), col("doc_id"), col("quality"), col("n_tok"), col("cum_tok"))
      .orderBy("source", "doc_id")
  }

  val pCurateFullSql: String = {
    val nChars = "CAST(length(text) AS DOUBLE)"
    val nTokens = s"CAST(length(string_split($normSql, ' ')) AS DOUBLE)"
    val nPunct = "CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)"
    val nAlpha = "CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)"
    val nStop = s"CAST(length(regexp_extract_all(' ' || $normSql || ' ', ' (the|a|of|and|to|in|is|it) ')) AS DOUBLE)"
    val nPii = """(length(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 | + length(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
                 | + length(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')))""".stripMargin
    s"""WITH q AS (
       |  SELECT doc_id, source, md5($normSql) AS fp,
       |    CAST(length(string_split($normSql, ' ')) AS BIGINT) AS n_tok,
       |    round(least($nTokens / 50.0, 1.0) * 0.25
       |      + (1.0 - least($nPunct / $nChars * 5.0, 1.0)) * 0.25
       |      + least($nStop / $nTokens * 5.0, 1.0) * 0.25
       |      + $nAlpha / $nChars * 0.25, 6) AS quality,
       |    1.0 - CAST(len(list_distinct(string_split($normSql, ' '))) AS DOUBLE)
       |        / len(string_split($normSql, ' ')) AS rep,
       |    $nPii AS n_pii
       |  FROM documents WHERE lang IN ('en', 'fr')),
       |f AS (SELECT * FROM q WHERE quality >= 0.55 AND n_pii = 0 AND rep <= 0.6),
       |g AS (SELECT f.*, min(doc_id) OVER (PARTITION BY fp) AS keep FROM f),
       |ke AS (SELECT * FROM g WHERE doc_id = keep),
       |tok AS (
       |  SELECT d.doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
       |  FROM documents d JOIN ke ON d.doc_id = ke.doc_id),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
       |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
       |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,4) OVER w IS NOT NULL),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |dropn AS (
       |  SELECT DISTINCT doc_b FROM pairs
       |  JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) >= 0.5),
       |kept AS (SELECT * FROM ke WHERE doc_id NOT IN (SELECT doc_b FROM dropn)),
       |b AS (
       |  SELECT source, doc_id, quality, n_tok,
       |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
       |  FROM kept)
       |SELECT source, doc_id, quality, n_tok, cum_tok FROM b
       |WHERE cum_tok - n_tok <= 4000 ORDER BY source, doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_curate_full" -> (pCurateFull _),
    "p_incremental_dedup" -> (pIncrementalDedup _),
    "p_mix_report" -> (pMixReport _),
    "p_curate" -> (pCurate _),
    "p_decontaminate" -> (pDecontaminate _),
    "p_sample_stratified" -> (pSampleStratified _),
    "p_token_budget" -> (pTokenBudget _))

  val oracles: Map[String, String] = Map(
    "p_curate_full" -> pCurateFullSql,
    "p_incremental_dedup" -> pIncrementalDedupSql,
    "p_mix_report" -> pMixReportSql,
    "p_curate" -> pCurateSql,
    "p_decontaminate" -> pDecontaminateSql,
    "p_sample_stratified" -> pSampleStratifiedSql,
    "p_token_budget" -> pTokenBudgetSql)
}
