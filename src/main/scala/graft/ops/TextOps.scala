package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.3 Text analysis over `documents` — the per-document scoring layer of a
  * training-data pipeline. Everything here is pure column algebra
  * (`org.apache.spark.sql.functions`, whole-stage codegen): no UDFs, so each
  * operator is a narrow map over the scan — embarrassingly parallel and
  * shuffle-free at any corpus size. Outputs are deterministic and expressible
  * in ANSI SQL, so every operator carries a DuckDB oracle.
  */
object TextOps {

  /** Normalized text: lowercase, collapse whitespace, trim — the shared
    * canonical form for token/dedup operators. Same regex both engines. */
  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (letter-runs, digit-runs, single punctuation — the classic pre-tokenizer
    * shape) + char count. */
  def tTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(split(norm(col("text")), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .as("bpe_tokens"),
        length(col("text")).as("n_chars"))
      .orderBy("doc_id")

  val tTokenCountSql: String =
    s"""SELECT doc_id,
       |  CAST(length(string_split($normSql, ' ')) AS INTEGER) AS ws_tokens,
       |  CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS bpe_tokens,
       |  CAST(length(text) AS INTEGER) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean word
    * length, alpha ratio → composite score in [0,1]. The ratio formulas are
    * written with decimal-free integer counts divided once at the end, so
    * both engines compute identical doubles. */
  def tQualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nTokens = size(split(norm(col("text")), " ")).cast("double")
    val nPunct = size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double")
    val nAlpha = size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0))).cast("double")
    val nStop = size(regexp_extract_all(concat(lit(" "), norm(col("text")), lit(" ")),
      lit(" (the|a|of|and|to|in|is|it) "), lit(0))).cast("double")
    val punctRatio = nPunct / nChars
    val alphaRatio = nAlpha / nChars
    val stopRatio = nStop / nTokens
    val meanWordLen = nChars / nTokens
    // quality: long-enough, low punctuation, some stopwords, sane word length
    val score =
      (least(nTokens / 50.0, lit(1.0)) * 0.25
        + (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.25
        + least(stopRatio * 5.0, lit(1.0)) * 0.25
        + alphaRatio * 0.25)
    Tables.table(spark, dir, "documents")
      .select(
        col("doc_id"),
        round(punctRatio, 6).as("punct_ratio"),
        round(alphaRatio, 6).as("alpha_ratio"),
        round(stopRatio, 6).as("stop_ratio"),
        round(meanWordLen, 6).as("mean_word_len"),
        round(score, 6).as("quality"))
      .orderBy("doc_id")
  }

  val tQualityScoreSql: String = {
    val nChars = "CAST(length(text) AS DOUBLE)"
    val nTokens = s"CAST(length(string_split($normSql, ' ')) AS DOUBLE)"
    val nPunct = "CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)"
    val nAlpha = "CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)"
    val nStop = s"CAST(length(regexp_extract_all(' ' || $normSql || ' ', ' (the|a|of|and|to|in|is|it) ')) AS DOUBLE)"
    s"""SELECT doc_id,
       |  round($nPunct / $nChars, 6) AS punct_ratio,
       |  round($nAlpha / $nChars, 6) AS alpha_ratio,
       |  round($nStop / $nTokens, 6) AS stop_ratio,
       |  round($nChars / $nTokens, 6) AS mean_word_len,
       |  round(
       |    least($nTokens / 50.0, 1.0) * 0.25
       |    + (1.0 - least($nPunct / $nChars * 5.0, 1.0)) * 0.25
       |    + least($nStop / $nTokens * 5.0, 1.0) * 0.25
       |    + $nAlpha / $nChars * 0.25, 6) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Language-ID: marker-word scoring argmax — the classic n-gram-profile
    * heuristic reduced to codegen-able column algebra. Score per language =
    * count of marker-word occurrences; argmax with deterministic tie-break
    * (first in fixed language order). At 100 TB: narrow map, no shuffle. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "es" -> Seq("el", "los", "que", "es"),
    "fr" -> Seq("le", "les", "est", "une"),
    "zh" -> Seq("de5", "shi4", "zai4", "le5"))

  private def markerCount(c: Column, words: Seq[String]): Column =
    words.map(w => size(regexp_extract_all(c, lit(s" ${java.util.regex.Pattern.quote(w)} "), lit(0))))
      .reduce(_ + _)

  /** Predicted language as a column expression (argmax of marker scores,
    * deterministic first-in-order tie-break) — shared by tLangId and the
    * lang-mismatch audit. */
  private[graft] def predLang: Column = {
    val padded = concat(lit(" "), norm(col("text")), lit(" "))
    val scores = langMarkers.map { case (lang, ws) => lang -> markerCount(padded, ws) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    // first language (in langMarkers order) achieving the max score
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
  }

  def tLangId(spark: SparkSession, dir: String): DataFrame = {
    val padded = concat(lit(" "), norm(col("text")), lit(" "))
    val scores = langMarkers.map { case (lang, ws) => lang -> markerCount(padded, ws) }
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        scores.head._2.as("score_en"),
        predLang.as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Language-metadata audit: the confusion matrix between the `lang`
    * column a crawler claimed and the content-predicted language — the
    * report that catches mislabeled corpora before they skew a training
    * mix. One scan + one partial agg over ≤ |langs|² groups. */
  def tLangMismatch(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .select(col("lang"), predLang.as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("agree", col("lang") === col("pred_lang"))
      .orderBy("lang", "pred_lang")

  val tLangMismatchSql: String = {
    def mc(words: Seq[String]) =
      words.map(w => s"length(regexp_extract_all(' ' || $normSql || ' ', ' ${w} '))")
        .mkString("(", " + ", ")")
    val scoreExprs = langMarkers.map { case (lang, ws) => lang -> mc(ws) }
    val best = scoreExprs.map(_._2).mkString("greatest(", ", ", ")")
    val caseExpr = scoreExprs
      .map { case (lang, s) => s"WHEN $s = $best AND $best > 0 THEN '$lang'" }
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH p AS (SELECT lang, $caseExpr AS pred_lang FROM documents)
       |SELECT lang, pred_lang, COUNT(*) AS n, lang = pred_lang AS agree
       |FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
  }

  val tLangIdSql: String = {
    def mc(words: Seq[String]) =
      words.map(w => s"length(regexp_extract_all(' ' || $normSql || ' ', ' ${w} '))")
        .mkString("(", " + ", ")")
    val scoreExprs = langMarkers.map { case (lang, ws) => lang -> mc(ws) }
    val best = scoreExprs.map(_._2).mkString("greatest(", ", ", ")")
    val caseExpr = scoreExprs
      .map { case (lang, s) => s"WHEN $s = $best AND $best > 0 THEN '$lang'" }
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""SELECT doc_id,
       |  CAST(${scoreExprs.head._2} AS INTEGER) AS score_en,
       |  $caseExpr AS pred_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: md5 of the canonical form (engine-portable) +
    * Spark-native xxhash64 (the one to use at 100 TB — 64-bit, no string
    * materialization) + a 16-hex-char truncated signature. */
  def tFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .select(
        col("doc_id"),
        md5(norm(col("text"))).as("fp_md5"),
        substring(md5(norm(col("text"))), 1, 16).as("fp_sig64"),
        xxhash64(norm(col("text"))).as("fp_xx"))
      .orderBy("doc_id")

  // xxhash64 is Spark-specific → excluded from the oracle columns; the oracle
  // checks the portable md5 fingerprints. fp_xx correctness is covered by
  // TextSpec (stability + collision-freedom vs distinct texts).
  val tFingerprintSql: String =
    s"""SELECT doc_id,
       |  md5($normSql) AS fp_md5,
       |  substr(md5($normSql), 1, 16) AS fp_sig64
       |FROM documents ORDER BY doc_id""".stripMargin

  /** tFingerprint without the Spark-only column, for the oracle compare. */
  def tFingerprintOracle(spark: SparkSession, dir: String): DataFrame =
    tFingerprint(spark, dir).drop("fp_xx")

  /** Corpus-level top-25 word bigrams: explode adjacent pairs via a window
    * lead, count, top-k. One shuffle on the bigram key with map-side partial
    * counts; top-k via TakeOrderedAndProject. */
  def tNgramTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.table(spark, dir, "documents"))
      .select(split(norm(col("text")), " ").as("ws"))
      .select(explode(expr(
        "transform(sequence(1, greatest(size(ws) - 1, 0)), i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(25)

  val tNgramTopkSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
       |  FROM documents),
       |big AS (
       |  SELECT word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
       |  FROM tok)
       |SELECT bigram, COUNT(*) AS n FROM big WHERE bigram IS NOT NULL
       |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 25""".stripMargin

  /** TF-IDF: top-3 terms per document. tf = in-doc count, idf = ln(N/df)
    * over the corpus. Three partial aggregates ((doc,word) tf, word df,
    * corpus N) and one window top-k; the df and N sides are tiny and
    * broadcast back. Ranking uses the ROUNDED score (6 dp) with a word
    * tie-break — ln() can differ in the last ulp across libm
    * implementations, and ranking on the rounded value keeps the top-k
    * engine-portable (same technique as the cosine rankings). */
  def tTfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.table(spark, dir, "documents")
    val tok = Tables.fanout(docs)
      .select(col("doc_id"), explode(split(norm(col("text")), " ")).as("word"))
    val tf = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    // df derives from tf — (doc, word) is already distinct there — so the
    // corpus is tokenized ONCE, not re-scanned for document frequencies
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df), Seq("word"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6).as("tfidf"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("word"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("word"), col("tfidf"))
      .orderBy("doc_id", "rnk")
  }

  val tTfidfSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word FROM documents),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT word, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, word FROM tok) GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, tf.word AS word,
       |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
       |  FROM tf JOIN df ON tf.word = df.word CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, word, tfidf,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rnk
       |  FROM scored)
       |SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, word, tfidf
       |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  /** Corpus Zipf profile: log-log regression of word frequency vs rank over
    * the top-100 words — the standard "is this corpus natural-language-
    * shaped" diagnostic (slope ≈ −1 for Zipfian text). Word counting is one
    * partial agg; the regression runs on 100 rows. regr_* accumulate in
    * parallel (order-nondeterministic doubles) → round(4), same rule as
    * q_stats. */
  def tZipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val freqs = Tables.fanout(Tables.table(spark, dir, "documents"))
      .select(explode(split(norm(col("text")), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // top-100 FIRST via TakeOrderedAndProject — a global row_number window
    // here would sort the ENTIRE vocabulary (billions of rows at 100 TB) on
    // one partition. The 100 survivors are then ranked by sorting a single
    // collected array (bounded at 100 by construction) — no WindowExec, no
    // all-rows-to-one-partition plan at any corpus size.
    val top100 = freqs.orderBy(col("freq").desc, col("word")).limit(100)
    val ranked = top100
      .agg(collect_list(struct(col("freq"), col("word"))).as("a"))
      .select(posexplode(expr(
        """array_sort(a, (l, r) -> CASE
          |  WHEN l.freq > r.freq THEN -1 WHEN l.freq < r.freq THEN 1
          |  WHEN l.word < r.word THEN -1 WHEN l.word > r.word THEN 1
          |  ELSE 0 END)""".stripMargin)).as(Seq("rank0", "fw")))
      .select((col("rank0") + 1).cast("int").as("rank"), col("fw.freq").as("freq"))
    ranked.agg(
      count(lit(1)).as("n_words"),
      round(expr("regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE)))"), 4).as("zipf_slope"),
      round(expr("regr_intercept(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE)))"), 4).as("zipf_intercept"),
      round(expr("regr_r2(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE)))"), 4).as("fit_r2"))
  }

  val tZipfSlopeSql: String =
    s"""WITH freqs AS (
       |  SELECT word, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split($normSql, ' ')) AS word FROM documents)
       |  GROUP BY word),
       |ranked AS (
       |  SELECT freq, row_number() OVER (ORDER BY freq DESC, word) AS rank
       |  FROM freqs QUALIFY rank <= 100)
       |SELECT COUNT(*) AS n_words,
       |  round(regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4) AS zipf_slope,
       |  round(regr_intercept(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4) AS zipf_intercept,
       |  round(regr_r2(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4) AS fit_r2
       |FROM ranked""".stripMargin

  /** Full BM25 (Robertson k1/b length normalization, Lucene's +1 idf) for
    * the query {spark, table}: one tokenizing scan carries the document
    * length alongside the term counts (no second pass), df/N/avgdl are
    * one-row-or-tiny broadcasts, and the score is a single projected
    * expression — top-20 via TakeOrderedAndProject. avgdl uses the
    * decimal-exact mean rule so both engines normalize by the identical
    * double; ranking on the ROUNDED score (§4). */
  def tBm25(spark: SparkSession, dir: String): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val docs = Tables.table(spark, dir, "documents")
    val toks = Tables.fanout(docs)
      .select(col("doc_id"), size(split(norm(col("text")), " ")).cast("long").as("dl"),
        explode(split(norm(col("text")), " ")).as("word"))
      .where(col("word").isin("spark", "table"))
    val tf = toks.groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df")) // one tokenize pass
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      (Tables.dsum(size(split(norm(col("text")), " ")).cast("long"))
        / count(lit(1))).as("avgdl"))
    val scored = tf.join(broadcast(df), Seq("word")).crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * (col("tf") * (k1 + 1))
          / (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))).as("s"))
      .groupBy("doc_id").agg(round(sum(col("s")), 6).as("bm25"))
    scored.orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  val tBm25Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(length(string_split($normSql, ' ')) AS BIGINT) AS dl,
       |         unnest(string_split($normSql, ' ')) AS word
       |  FROM documents),
       |qt AS (SELECT * FROM toks WHERE word IN ('spark', 'table')),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf, max(dl) AS dl FROM qt GROUP BY 1, 2),
       |df AS (SELECT word, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, word FROM qt) GROUP BY 1),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(CAST(CAST(length(string_split($normSql, ' ')) AS BIGINT) AS DECIMAL(30,6))) AS DOUBLE)
       |      / COUNT(*) AS avgdl
       |  FROM documents)
       |SELECT doc_id,
       |  round(SUM(
       |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |      * (tf * (CAST(1.2 AS DOUBLE) + 1))
       |      / (tf + CAST(1.2 AS DOUBLE) * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
       |FROM tf JOIN df ON tf.word = df.word CROSS JOIN stats
       |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_token_count" -> (tTokenCount _),
    "t_quality_score" -> (tQualityScore _),
    "t_lang_id" -> (tLangId _),
    "t_lang_mismatch" -> (tLangMismatch _),
    "t_fingerprint" -> (tFingerprintOracle _),
    "t_ngram_topk" -> (tNgramTopk _),
    "t_tfidf" -> (tTfidf _),
    "t_zipf_slope" -> (tZipfSlope _),
    "t_bm25" -> (tBm25 _))

  val oracles: Map[String, String] = Map(
    "t_token_count" -> tTokenCountSql,
    "t_quality_score" -> tQualityScoreSql,
    "t_lang_id" -> tLangIdSql,
    "t_lang_mismatch" -> tLangMismatchSql,
    "t_fingerprint" -> tFingerprintSql,
    "t_ngram_topk" -> tNgramTopkSql,
    "t_tfidf" -> tTfidfSql,
    "t_zipf_slope" -> tZipfSlopeSql,
    "t_bm25" -> tBm25Sql)
}
