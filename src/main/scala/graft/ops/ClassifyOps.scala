package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3/§2.5 additions (round 4): in-plan classifier TRAINING + inference —
  * the quality/language/domain classifiers every large-scale curation
  * pipeline runs (CCNet's fastText lang-id, quality filters trained on
  * reference corpora), expressed as pure distributed aggregation so both
  * engines can verify them:
  *
  *  - [[tNbClassify]]: multinomial Naive Bayes language classifier, trained
  *    on the 80% split and evaluated on the held-out 20%, entirely as
  *    column algebra (counts → log-likelihoods → argmax). NB training IS a
  *    groupBy — the one classifier family whose exact training is a single
  *    map-side-combined aggregate pass at any corpus size.
  *  - [[sLabelProbe]]: nearest-class-centroid probe over the labeled
  *    embeddings (the "linear probe" of representation learning, in its
  *    cosine form): per-label centroid = one aggregate; inference = argmax
  *    over k broadcast centroids in the scan projection.
  *
  * Both emit confusion matrices — the evaluation artifact a pipeline stores.
  * Determinism: every log term is rounded (8 dp) then decimal-summed, so
  * partition order can't drift scores; argmax ties break on class id.
  */
object ClassifyOps {

  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Multinomial NB over word counts: P(lang|doc) ∝ P(lang)·Π P(w|lang)^tf
    * with add-one smoothing; OOV test words are dropped (standard). Train =
    * doc_id % 5 ≠ 0, test = doc_id % 5 = 0. Output: (actual, predicted, n)
    * confusion matrix.
    *
    * On the synthetic corpus the `lang` column is independent of the text
    * (all docs draw the same vocabulary), so the matrix here documents that
    * absence of signal — the driver's DuckDB hash gate verifies the exact
    * TRAINING + INFERENCE computation, and ClassifySpec proves the same
    * learner reaches ≥0.9 accuracy on a planted corpus whose classes do
    * have distinct vocabulary. */
  def tNbClassify(spark: SparkSession, dir: String): DataFrame =
    nbConfusion(Tables.fanout(Tables.table(spark, dir, "documents")))

  /** The NB train+eval pipeline over any (doc_id, lang, text) frame —
    * split, three training aggregates, grid join, argmax, confusion. */
  private[graft] def nbConfusion(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(norm(col("text")), " ")).as("word"))
    val train = toks.where(col("doc_id") % 5 =!= 0)
    val test = toks.where(col("doc_id") % 5 === 0)

    // training = three aggregates, all map-side combined
    val wc = train.groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
    val classTot = train.groupBy("lang").agg(count(lit(1)).as("tok_total"))
    val docsPerLang = docs.where(col("doc_id") % 5 =!= 0)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val nTrainDocs = docs.where(col("doc_id") % 5 =!= 0)
      .agg(count(lit(1)).as("n_total"))
    val vocab = train.agg(countDistinct(col("word")).as("v_size"))

    // full (word × lang) likelihood grid: vocab words cross the (tiny) lang
    // set, absent counts smoothed to 0+1 — linear in |vocab|·|langs|
    val langs = classTot.select(col("lang"))
    val grid = train.select("word").distinct()
      .crossJoin(broadcast(langs))
      .join(wc, Seq("lang", "word"), "left")
      .join(broadcast(classTot), Seq("lang"))
      .crossJoin(broadcast(vocab))
      .select(col("word"), col("lang"),
        round(log((coalesce(col("cnt"), lit(0L)) + lit(1)).cast("double") /
          (col("tok_total") + col("v_size")).cast("double")), 8).as("loglik"))

    val prior = docsPerLang.crossJoin(broadcast(nTrainDocs))
      .select(col("lang"),
        round(log(col("n_docs").cast("double") / col("n_total")), 8).as("logprior"))

    // per-(test doc, candidate lang) score: decimal-summed rounded terms —
    // bit-identical across partition orders and engines
    val testTf = test.groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"), min(col("lang")).as("actual"))
    val scored = testTf.join(grid, Seq("word")) // inner: OOV words dropped
      .groupBy(col("doc_id"), col("actual"), col("lang").as("cand"))
      .agg(sum((col("tf") * col("loglik")).cast("decimal(30,8)")).as("ll"))
      .join(broadcast(prior.select(col("lang").as("cand"), col("logprior"))),
        Seq("cand"))
      .select(col("doc_id"), col("actual"), col("cand"),
        (col("ll").cast("double") + col("logprior")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
      .groupBy(col("actual"), col("cand").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")
  }

  val tNbClassifySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    unnest(string_split($normSql, ' ')) AS word
       |  FROM documents),
       |train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
       |test AS (SELECT * FROM toks WHERE doc_id % 5 = 0),
       |wc AS (SELECT lang, word, COUNT(*) AS cnt FROM train GROUP BY 1, 2),
       |ct AS (SELECT lang, COUNT(*) AS tok_total FROM train GROUP BY 1),
       |dpl AS (SELECT lang, COUNT(*) AS n_docs FROM documents
       |        WHERE doc_id % 5 <> 0 GROUP BY 1),
       |nt AS (SELECT COUNT(*) AS n_total FROM documents WHERE doc_id % 5 <> 0),
       |vs AS (SELECT COUNT(DISTINCT word) AS v_size FROM train),
       |grid AS (
       |  SELECT vw.word, l.lang,
       |    round(ln(CAST(COALESCE(wc.cnt, 0) + 1 AS DOUBLE) /
       |             CAST(ct.tok_total + vs.v_size AS DOUBLE)), 8) AS loglik
       |  FROM (SELECT DISTINCT word FROM train) vw
       |  CROSS JOIN (SELECT lang FROM ct) l
       |  LEFT JOIN wc ON wc.lang = l.lang AND wc.word = vw.word
       |  JOIN ct ON ct.lang = l.lang
       |  CROSS JOIN vs),
       |prior AS (
       |  SELECT lang, round(ln(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)), 8)
       |    AS logprior
       |  FROM dpl CROSS JOIN nt),
       |ttf AS (
       |  SELECT doc_id, word, COUNT(*) AS tf, min(lang) AS actual
       |  FROM test GROUP BY 1, 2),
       |ll AS (
       |  SELECT t.doc_id, t.actual, g.lang AS cand,
       |    CAST(SUM(CAST(t.tf * g.loglik AS DECIMAL(30,8))) AS DOUBLE) AS ll
       |  FROM ttf t JOIN grid g ON t.word = g.word
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT ll.doc_id, ll.actual, ll.cand, ll.ll + p.logprior AS score
       |  FROM ll JOIN prior p ON p.lang = ll.cand),
       |ranked AS (
       |  SELECT actual, cand,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score DESC, cand) AS rnk
       |  FROM scored)
       |SELECT actual, cand AS predicted, COUNT(*) AS n
       |FROM ranked WHERE rnk = 1
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Nearest-centroid linear probe over embeddings.label: train-split
    * centroids (decimal-exact per-dim mean), test rows classified by argmax
    * cosine against the k broadcast centroids. Output: per-(actual,
    * predicted) confusion counts. */
  def sLabelProbe(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanout(Tables.table(spark, dir, "embeddings"))
    val train = e.where(col("vec_id") % 5 =!= 0)
    val cents = train
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((Tables.dsum(col("v").cast("double")) / count(lit(1))).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("cent"))
      .select(col("label").as("cand"), col("cent"),
        sqrt(graft.functions.Vec.vdot(col("cent"), col("cent"))).as("cnorm"))
    val test = e.where(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("label").as("actual"), col("embedding"),
        graft.functions.Vec.vnorm(col("embedding")).as("nrm"))
    val scored = test.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("actual"), col("cand"),
        round(graft.functions.Vec.vdot(col("embedding"), col("cent"))
          / (col("nrm") * col("cnorm")), 6).as("cos"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cand"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
      .groupBy(col("actual"), col("cand").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")
  }

  val sLabelProbeSql: String =
    """WITH tr AS (SELECT * FROM embeddings WHERE vec_id % 5 <> 0),
      |cd AS (
      |  SELECT label, dim,
      |    CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE)
      |      / COUNT(*) AS c
      |  FROM (SELECT label, generate_subscripts(embedding, 1) AS dim,
      |               unnest(embedding) AS v FROM tr)
      |  GROUP BY 1, 2),
      |cents AS (
      |  SELECT label AS cand, list(c ORDER BY dim) AS cent,
      |    sqrt(list_sum([x * x for x in list(c ORDER BY dim)])) AS cnorm
      |  FROM cd GROUP BY label),
      |te AS (
      |  SELECT vec_id, label AS actual, embedding,
      |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
      |                   for i in generate_series(1, len(embedding))])) AS nrm
      |  FROM embeddings WHERE vec_id % 5 = 0),
      |scored AS (
      |  SELECT te.vec_id, te.actual, cents.cand,
      |    round(list_sum([CAST(te.embedding[i] AS DOUBLE) * cents.cent[i]
      |                    for i in generate_series(1, len(te.embedding))])
      |      / (te.nrm * cents.cnorm), 6) AS cos
      |  FROM te CROSS JOIN cents),
      |ranked AS (
      |  SELECT actual, cand,
      |    row_number() OVER (PARTITION BY vec_id
      |                       ORDER BY cos DESC, cand) AS rnk
      |  FROM scored)
      |SELECT actual, cand AS predicted, COUNT(*) AS n
      |FROM ranked WHERE rnk = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_nb_classify" -> (tNbClassify _),
    "s_label_probe" -> (sLabelProbe _))

  val oracles: Map[String, String] = Map(
    "t_nb_classify" -> tNbClassifySql,
    "s_label_probe" -> sLabelProbeSql)
}
