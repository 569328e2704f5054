package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.3 additions (round 7): Gopher-style document quality rules and PMI
  * collocation mining — the remaining two standard text-corpus passes a
  * training-data pipeline runs (beyond the C4/RefinedWeb line filters in
  * TextOps3 and the length/punct heuristics in TextOps.quality_score).
  *
  * Scale shape: both are one tokenizing scan plus map-side-combined
  * aggregates keyed on doc_id or vocabulary words (Zipf-bounded fan); the
  * collocation ranking is corpus-global top-k via TakeOrderedAndProject,
  * never a global window.
  */
object TextOps5 {

  /** Gopher quality rules (Rae et al. 2021, public): word-count range,
    * mean-word-length range, alphabetic-word fraction, stop-word presence.
    * Emits the per-rule measurements plus the combined verdict so the
    * downstream curation join can both filter and explain. Per-doc means
    * divide a decimal-exact sum by the group count — identical expression
    * text in both engines (§4 davg rule). */
  def tGopherFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text")))
      .where(length(col("text")) > 0)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        expr("round(cast(sum(cast(length(w) as decimal(30,6))) as double) / count(1), 4)")
          .as("mean_word_len"),
        expr("""round(cast(sum(cast(case when w rlike '[a-z]' then 1 else 0 end
               |  as decimal(30,6))) as double) / count(1), 4)""".stripMargin)
          .as("alpha_frac"),
        expr("cast(sum(case when w in ('the','a','and','of','to') then 1 else 0 end) as bigint)")
          .as("stop_hits"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("alpha_frac"), col("stop_hits"),
        (col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("alpha_frac") >= 0.8 && col("stop_hits") >= 2).as("passes"))
      .orderBy("doc_id")

  val tGopherFilterSql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents WHERE length(text) > 0),
      |st AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      |    round(CAST(SUM(CAST(length(w) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 4) AS mean_word_len,
      |    round(CAST(SUM(CAST(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END
      |      AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 4) AS alpha_frac,
      |    CAST(SUM(CASE WHEN w IN ('the', 'a', 'and', 'of', 'to') THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
      |  FROM w GROUP BY 1)
      |SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
      |  CAST(n_words BETWEEN 50 AND 100000
      |   AND mean_word_len BETWEEN 3.0 AND 10.0
      |   AND alpha_frac >= 0.8 AND stop_hits >= 2 AS BOOLEAN) AS passes
      |FROM st ORDER BY doc_id""".stripMargin

  /** Top-20 bigram collocations by pointwise mutual information
    * (pmi = ln(p(ab) / (p(a)·p(b))), support ≥ 25). Bigrams come from the
    * scan projection (explode positions + O(1) element_at — §4.1: never
    * slice-in-transform, never a windowed lead), unigram/bigram totals are
    * two one-row broadcasts, and the final ranking is
    * TakeOrderedAndProject on the rounded score. Support threshold is
    * absolute (the Zipf head scales with the corpus; top-20 output is
    * scale-invariant). */
  def tPmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.fanout(Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text")))
      .where(length(col("text")) > 0)
      .select(split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 2)
      .cache()
    val uni = toks.select(explode(col("ws")).as("w"))
    val ucnt = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val n1 = uni.agg(count(lit(1)).as("n1"))
    val big = toks
      .select(explode(sequence(lit(1), size(col("ws")) - 1)).as("i"), col("ws"))
      .select(expr("element_at(ws, cast(i as int))").as("w1"),
        expr("element_at(ws, cast(i as int) + 1)").as("w2"))
    val n2 = big.agg(count(lit(1)).as("n2"))
    big.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .where(col("c") >= 25)
      .join(ucnt.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
      .join(ucnt.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select(col("w1"), col("w2"), col("c").as("pair_n"),
        expr("round(ln(cast(c as double) * n1 * n1 / (n2 * cast(c1 as double) * c2)), 4)")
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(20)
  }

  val tPmiBigramsSql: String =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS ws FROM documents
      |  WHERE length(text) > 0 AND len(string_split(text, ' ')) >= 2),
      |uni AS (SELECT unnest(ws) AS w FROM toks),
      |ucnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
      |n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM uni),
      |big AS (
      |  SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
      |  FROM toks, unnest(range(1, len(ws))) AS t(i)),
      |bcnt AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY 1, 2),
      |n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM big)
      |SELECT b.w1, b.w2, CAST(b.c AS BIGINT) AS pair_n,
      |  round(ln(CAST(b.c AS DOUBLE) * n1.n * n1.n / (n2.n * CAST(u1.c AS DOUBLE) * u2.c)), 4) AS pmi
      |FROM bcnt b JOIN ucnt u1 ON u1.w = b.w1 JOIN ucnt u2 ON u2.w = b.w2, n1, n2
      |WHERE b.c >= 25
      |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin

  /** Lexical-diversity profile per language: type-token ratio (distinct
    * words / words) and hapax rate (words occurring exactly once / distinct
    * words) — the two classic vocabulary-richness signals corpus audits
    * report (low TTR ⇒ templated/boilerplate text; high hapax ⇒ OCR noise
    * or code). Shape: one tokenizing scan → (lang, word) counts
    * (vocabulary-keyed, Zipf-bounded fan, map-side combined) → per-lang
    * rollup of |vocab|, token mass, and hapax count. Ratios in exact ppm
    * (integer division) so the gate never touches a double. */
  def tLexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.fanout(Tables.table(spark, dir, "documents")
        .select(col("lang"), col("text")))
      .where(length(col("text")) > 0)
      .select(col("lang"), explode(split(
        trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
    wc.groupBy("lang")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("lang"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("n_types * 1000000 div n_tokens").as("ttr_ppm"),
        expr("n_hapax * 1000000 div n_types").as("hapax_ppm"))
      .orderBy("lang")
  }

  val tLexicalDiversitySql: String =
    """WITH wc AS (
      |  SELECT lang, w, COUNT(*) AS c
      |  FROM (
      |    SELECT lang,
      |      unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |    FROM documents WHERE length(text) > 0)
      |  WHERE w <> '' GROUP BY 1, 2)
      |SELECT lang,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_types,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  CAST(COUNT(*) * 1000000 // CAST(SUM(c) AS BIGINT) AS BIGINT) AS ttr_ppm,
      |  CAST(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // COUNT(*) AS BIGINT) AS hapax_ppm
      |FROM wc GROUP BY lang ORDER BY lang""".stripMargin

  /** Word burstiness (Church & Gale): variance-to-mean ratio of per-doc
    * occurrence counts across the docs that CONTAIN the word. Content
    * words burst (a doc about X says X many times → VMR ≫ 1); function
    * words approach Poisson (VMR ≈ 1) — the signal that separates topical
    * vocabulary from glue, orthogonal to raw frequency (t_zipf_slope) and
    * to contrastive weight (t_tfidf). Per-(word, doc) counts are exact
    * BIGINT, so Σc and Σc² are exact and VMR is one identical-text IEEE
    * row per word; report = top-30 by document frequency (df ≥ 20),
    * TakeOrderedAndProject. */
  def tBurstiness(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val wd = Tables.fanout(Tables.table(spark, dir, "documents"))
      .select(col("doc_id"), explode(split(norm, " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
    wd.groupBy("w")
      .agg(count(lit(1)).cast("long").as("df"),
        sum("c").cast("long").as("tf"),
        sum(col("c") * col("c")).cast("long").as("scc"))
      .where(col("df") >= 20)
      .select(col("w"), col("df"), col("tf"),
        expr("((cast(scc as double) - (cast(tf as double)*cast(tf as double))/cast(df as double)) / (cast(df as double) - 1.0)) / (cast(tf as double)/cast(df as double))")
          .as("burstiness"))
      .orderBy(col("df").desc, col("w"))
      .limit(30)
  }

  val tBurstinessSql: String =
    """WITH wd AS (
      |  SELECT doc_id, w.word AS w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents,
      |    LATERAL (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word) w
      |  WHERE length(w.word) > 0
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
      |    CAST(SUM(c) AS BIGINT) AS tf,
      |    CAST(SUM(c*c) AS BIGINT) AS scc
      |  FROM wd GROUP BY 1 HAVING COUNT(*) >= 20)
      |SELECT w, df, tf,
      |  ((CAST(scc AS DOUBLE) - (CAST(tf AS DOUBLE)*CAST(tf AS DOUBLE))/CAST(df AS DOUBLE)) / (CAST(df AS DOUBLE) - 1.0)) / (CAST(tf AS DOUBLE)/CAST(df AS DOUBLE)) AS burstiness
      |FROM agg ORDER BY df DESC, w LIMIT 30""".stripMargin

  /** Code-vs-prose routing: per-source counts of documents that read as
    * source code — the modality router a mixed web crawl runs before
    * sending docs to the code or prose pipeline (tokenizers, quality
    * rules and dedup keys all differ by branch). Signals, all exact
    * integer ppm: code-symbol density ({}();=[]<>), digit density, and
    * language-keyword hits (def/class/import/return/function/var/const) —
    * is_code when symbols ≥ 2% of chars with ≥ 2 keyword hits, or
    * symbols ≥ 5% alone. Scan-projection regex algebra, one map-side
    * rollup to |sources| rows. */
  def tCodeDetect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.fanout(Tables.table(spark, dir, "documents"))
      .select(col("source"),
        length(col("text")).cast("long").as("n_chars"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[{}();=\\[\\]<>]", "")))
          .cast("long").as("n_sym"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("n_dig"),
        expr("regexp_count(text, '\\\\b(def|class|import|return|function|var|const)\\\\b')")
          .cast("long").as("kw_hits"))
      .where(col("n_chars") > 0)
      .select(col("source"), col("n_chars"),
        expr("(1000000 * n_sym) div n_chars").as("sym_ppm"),
        expr("(1000000 * n_dig) div n_chars").as("dig_ppm"),
        col("kw_hits"))
      .withColumn("is_code",
        (col("sym_ppm") >= 20000 && col("kw_hits") >= 2) ||
          col("sym_ppm") >= 50000)
    docs.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("is_code"), 1L).otherwise(0L)).cast("long").as("n_code"),
        sum("sym_ppm").cast("long").as("sym_ppm_sum"),
        sum("dig_ppm").cast("long").as("dig_ppm_sum"),
        sum("kw_hits").cast("long").as("kw_hits_total"))
      .select(col("source"), col("n_docs"), col("n_code"),
        expr("sym_ppm_sum div n_docs").as("mean_sym_ppm"),
        expr("dig_ppm_sum div n_docs").as("mean_dig_ppm"),
        col("kw_hits_total"))
      .orderBy("source")
  }

  val tCodeDetectSql: String =
    """WITH d AS (
      |  SELECT source,
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    CAST(length(text) - length(regexp_replace(text, '[{}();=\[\]<>]', '', 'g')) AS BIGINT) AS n_sym,
      |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_dig,
      |    CAST(len(regexp_extract_all(text, '\b(def|class|import|return|function|var|const)\b')) AS BIGINT) AS kw_hits
      |  FROM documents WHERE length(text) > 0),
      |p AS (
      |  SELECT source, n_chars,
      |    (1000000 * n_sym) // n_chars AS sym_ppm,
      |    (1000000 * n_dig) // n_chars AS dig_ppm,
      |    kw_hits,
      |    ((1000000 * n_sym) // n_chars >= 20000 AND kw_hits >= 2)
      |      OR (1000000 * n_sym) // n_chars >= 50000 AS is_code
      |  FROM d)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN is_code THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
      |  CAST(SUM(sym_ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_sym_ppm,
      |  CAST(SUM(dig_ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_dig_ppm,
      |  CAST(SUM(kw_hits) AS BIGINT) AS kw_hits_total
      |FROM p GROUP BY 1 ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_gopher_filter" -> (tGopherFilter _),
    "t_pmi_bigrams" -> (tPmiBigrams _),
    "t_lexical_diversity" -> (tLexicalDiversity _),
    "t_burstiness" -> (tBurstiness _),
    "t_code_detect" -> (tCodeDetect _))

  val oracles: Map[String, String] = Map(
    "t_gopher_filter" -> tGopherFilterSql,
    "t_pmi_bigrams" -> tPmiBigramsSql,
    "t_lexical_diversity" -> tLexicalDiversitySql,
    "t_burstiness" -> tBurstinessSql,
    "t_code_detect" -> tCodeDetectSql)
}
