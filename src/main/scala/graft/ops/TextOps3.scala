package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.3 additions (round 5): character-entropy scoring and C4-style
  * line-level filtering — two more of the text-quality gates a training-data
  * pipeline runs before anything expensive (reference scope: the
  * training-data operators SURVEY.md §2 adds beyond the reference's own SQL
  * surface, which serves arbitrary DuckDB SQL over one table —
  * IcebergConnection.py:99-131).
  *
  * Scale shape: both are linear, keyed only on doc_id (never a content key),
  * and every aggregate map-side combines. Entropy explodes one row per
  * character — the same O(corpus bytes) a tokenizing scan already pays — and
  * the C4 filter explodes one row per 12-word line.
  */
object TextOps3 {

  /** Per-document character-level Shannon entropy (plus distinct-char
    * count) — the classic gibberish/binary-junk detector: natural text sits
    * near 4.1 bits-equivalent (~2.9 nats), base64/hex junk runs higher,
    * mojibake and repeated-char padding lower. Identity used:
    * H = ln(N) − (Σ n·ln n)/N over per-char counts n, so the whole thing is
    * TWO map-side-combined aggregates — (doc_id, ch) counts, then one
    * doc_id-keyed rollup; no join-back of totals. Per-term products are
    * rounded then decimal-summed (§4 rule: fp sums must not depend on
    * partition order). */
  def tEntropy(spark: SparkSession, dir: String): DataFrame = {
    val chars = Tables.fanout(
      Tables.table(spark, dir, "documents").select("doc_id", "text"))
      // empty docs: Spark's 2-arg sequence(1, 0) infers step -1 and emits
      // phantom rows (the ADVICE r4 Multimodal2 bug class); DuckDB's
      // range(1, 1) is empty. Filter them out identically on both sides.
      .where(length(col("text")) > 0)
      .select(col("doc_id"), lower(col("text")).as("text"))
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")))).as("i"),
        col("text"))
      .select(col("doc_id"), expr("substring(text, i, 1)").as("ch"))
    chars
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("distinct_chars"),
        sum(col("n")).cast("long").as("n_chars_counted"),
        expr("cast(sum(cast(round(n * ln(n), 6) as decimal(30,7))) as double)")
          .as("s"))
      .select(col("doc_id"), col("distinct_chars"), col("n_chars_counted"),
        expr("round(ln(n_chars_counted) - s / n_chars_counted, 4)")
          .as("char_entropy"))
      .orderBy("doc_id")
  }

  val tEntropySql: String =
    """WITH chars AS (
      |  SELECT doc_id,
      |    substr(lower(text), CAST(unnest(range(1, length(text) + 1)) AS INT), 1) AS ch
      |  FROM documents WHERE length(text) > 0),
      |cnt AS (SELECT doc_id, ch, COUNT(*) AS n FROM chars GROUP BY 1, 2)
      |SELECT doc_id, COUNT(*) AS distinct_chars,
      |  CAST(SUM(n) AS BIGINT) AS n_chars_counted,
      |  round(ln(CAST(SUM(n) AS BIGINT))
      |    - CAST(SUM(CAST(round(n * ln(n), 6) AS DECIMAL(30,7))) AS DOUBLE)
      |      / CAST(SUM(n) AS BIGINT), 4) AS char_entropy
      |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // 12-word "lines" via one sequential-findall regex pass (the corpus has no
  // newlines — same deterministic segmentation trick as ChunkOps; on real
  // data the identical operator runs on split(text, '\n')).
  private val lineRe = "(?:\\S+ ){11}\\S+"
  private def norm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** C4/RefinedWeb-style LINE-level cleaning: segment each doc into lines,
    * keep a line iff (a) it is mostly non-repetitive — ≥ 7 of its 12 words
    * distinct — and (b) it contains no blocklisted token ('dup' stands in
    * for C4's bad-word list; the rule shape, a word-boundary containment
    * test on the normalized line, is the real thing). Emits per-doc line
    * counts, kept fraction, and the md5 of the IN-ORDER surviving text — the
    * cleaned doc itself, proving reassembly order, not just counts.
    *
    * Plan: chunking + per-line rules are all scan-projection column algebra;
    * the only shuffle is the doc_id-keyed reassembly aggregate (collect_list
    * is bounded by lines-per-doc, order restored by array_sort on the
    * (idx, line) struct — no window). */
  def tC4Filter(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.fanout(
      Tables.table(spark, dir, "documents").select("doc_id", "text"))
      .select(col("doc_id"),
        posexplode(regexp_extract_all(norm(col("text")), lit(lineRe), lit(0)))
          .as(Seq("idx", "line")))
      .withColumn("keep",
        size(array_distinct(split(col("line"), " "))) >= 7 &&
          !concat(lit(" "), col("line"), lit(" ")).contains(" dup "))
    lines.groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("keep").cast("long")).as("kept_lines"),
        md5(array_join(
          expr("transform(array_sort(collect_list(CASE WHEN keep THEN struct(idx, line) END)), x -> x.line)"),
          " ")).as("kept_md5"))
      .select(col("doc_id"), col("n_lines"), col("kept_lines"),
        round(col("kept_lines").cast("double") / col("n_lines"), 4)
          .as("kept_frac"),
        col("kept_md5"))
      .orderBy("doc_id")
  }

  val tC4FilterSql: String =
    s"""WITH ln AS (
       |  SELECT doc_id,
       |    generate_subscripts(regexp_extract_all($normSql, '$lineRe'), 1) - 1 AS idx,
       |    unnest(regexp_extract_all($normSql, '$lineRe')) AS line
       |  FROM documents),
       |k AS (
       |  SELECT doc_id, idx, line,
       |    len(list_distinct(string_split(line, ' '))) >= 7
       |      AND NOT contains(' ' || line || ' ', ' dup ') AS keep
       |  FROM ln)
       |SELECT doc_id, COUNT(*) AS n_lines,
       |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
       |  round(SUM(CASE WHEN keep THEN 1 ELSE 0 END)*1.0 / COUNT(*), 4) AS kept_frac,
       |  md5(coalesce(string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY idx), '')) AS kept_md5
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val bpeRounds = 5
  private val bpeVocab = 2000

  /** BPE tokenizer training (Sennrich et al. ACL'16), distributed: learn
    * the first 5 merge rules over the corpus word-frequency table — "train
    * the tokenizer on the cluster" rather than sampling to one machine.
    *
    * Shape per merge round (the classic algorithm, re-expressed):
    *  1. adjacent-pair counts over the CURRENT symbol sequences — one
    *     explode + map-side-combined aggregate (the only shuffle, bounded
    *     by |symbol-pair vocabulary| per partition);
    *  2. argmax pair via TakeOrdered(1) — a single (left, right, count)
    *     row crosses to the driver per round (model scale, the k-means
    *     centroid-matrix precedent);
    *  3. apply the merge to every word — a pure scan projection: symbols
    *     live as space-joined strings with sentinel spaces, so one literal
    *     `replace(' a b ' → ' ab ')` IS the standard left-to-right
    *     non-overlapping BPE merge scan, identical in both engines.
    * The trainer input is the frequency-truncated vocabulary (top-2000
    * words by count — standard practice, and it makes the per-round
    * rewrite vocabulary-sized, not corpus-sized: at 100 TB the word-count
    * aggregate is the only corpus-scale pass, everything after runs on the
    * bounded vocab). localCheckpoint materializes the 2000-row vocab once
    * and bounds lineage across rounds. Integer counts only — no fp
    * anywhere — so the DuckDB oracle (the same 5 rounds as chained CTEs)
    * matches exactly; ties break on (count desc, left, right). */
  def tBpeTrain(spark: SparkSession, dir: String): DataFrame =
    spark.createDataFrame(bpeMergesLearned(spark, dir))
      .toDF("round", "lhs", "rhs", "merged", "pair_count")
      .orderBy("round")

  /** The merge-learning loop, shared by train (emits the rules) and apply
    * (tokenizes the corpus with them). Per round: ONE map-side-combined
    * pair-count aggregate; only the single argmax row (3 fields — model
    * scale) crosses to the driver. */
  private[graft] def bpeMergesLearned(spark: SparkSession,
      dir: String): Seq[(Int, String, String, String, Long)] = {
    import org.apache.spark.sql.functions.call_function
    val words0 = Tables.fanout(Tables.table(spark, dir, "documents"))
      .select(explode(split(norm(col("text")), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(bpeVocab)
      .select(concat(lit(" "),
        concat_ws(" ", expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")),
        lit(" ")).as("sym"), col("n"))
      .localCheckpoint()
    var words = words0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (r <- 1 to bpeRounds) {
      // guard the single-symbol case: Spark's 2-arg sequence(1, 0) infers
      // step -1 (phantom pairs — the ADVICE r4 bug class); DuckDB's
      // generate_series(1, 0) is empty
      val top = words
        .select(col("n"), explode(expr(
          """case when size(split(trim(sym), ' ')) < 2 then array()
            |else transform(sequence(1, size(split(trim(sym), ' ')) - 1),
            |  i -> struct(element_at(split(trim(sym), ' '), i) as a,
            |              element_at(split(trim(sym), ' '), i + 1) as b)) end""".stripMargin))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .collect()(0)
      val (a, b, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r, a, b, a + b, cnt))
      // call_function keeps corpus symbols out of SQL text (a quote in a
      // learned symbol must not break the expression)
      words = words.select(
        call_function("replace", col("sym"),
          lit(s" $a $b "), lit(s" $a$b ")).as("sym"), col("n"))
        .localCheckpoint()
    }
    merges.toSeq
  }

  /** The training CTE chain (w0 + per-round pair-count/argmax/replace),
    * shared verbatim by the train and apply oracles. */
  private val bpeTrainCtes: String = {
    val base =
      s"""w0 AS (
         |  SELECT ' ' || array_to_string([substr(w, CAST(i AS INT), 1)
         |           for i in generate_series(1, length(w))], ' ') || ' ' AS sym, n
         |  FROM (
         |    SELECT w, COUNT(*) AS n FROM (
         |      SELECT unnest(string_split($normSql, ' ')) AS w FROM documents)
         |    WHERE length(w) > 0 GROUP BY w
         |    ORDER BY n DESC, w LIMIT $bpeVocab))""".stripMargin
    val rounds = (1 to bpeRounds).map { k =>
      val p = k - 1
      s"""pc$k AS (
         |  SELECT p.a AS a, p.b AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
         |    SELECT n, unnest([struct_pack(a := l[CAST(i AS INT)], b := l[CAST(i AS INT) + 1])
         |             for i in generate_series(1, len(l) - 1)]) AS p
         |    FROM (SELECT string_split(trim(sym), ' ') AS l, n FROM w$p))
         |  GROUP BY 1, 2),
         |top$k AS (SELECT a, b, cnt FROM pc$k ORDER BY cnt DESC, a, b LIMIT 1),
         |w$k AS (SELECT replace(sym, ' ' || t.a || ' ' || t.b || ' ', ' ' || t.a || t.b || ' ') AS sym, n
         |        FROM w$p, top$k t)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  val tBpeTrainSql: String = {
    val fin = (1 to bpeRounds).map(k =>
      s"SELECT CAST($k AS INT) AS round, a AS lhs, b AS rhs, a || b AS merged, cnt AS pair_count FROM top$k")
      .mkString(" UNION ALL ")
    "WITH " + bpeTrainCtes + "\n" + fin + " ORDER BY round"
  }

  /** BPE tokenizer APPLICATION — the other half of the tokenizer loop:
    * tokenize the whole corpus with the merges [[tBpeTrain]] learned, and
    * report per-source token economics (chars per BPE token — the metric a
    * budget pipeline converts corpus bytes → training tokens with).
    *
    * Scale shape: merges apply per word TYPE, not per occurrence — the
    * distinct-word table (vocab-scale) goes through the 5 learned replaces
    * in a scan projection, and occurrences get their token counts by a
    * word-keyed join (vocab right side; AQE handles the Zipf head) +
    * map-side-combined source rollup. The corpus is scanned once; merge
    * learning itself re-runs the training loop (argmax rows only to the
    * driver). Oracle replays training AND application as one CTE chain. */
  def tBpeApply(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.call_function
    val merges = bpeMergesLearned(spark, dir)
    val dw = Tables.fanout(Tables.table(spark, dir, "documents"))
      .select(col("source"), explode(split(norm(col("text")), " ")).as("w"))
      .where(length(col("w")) > 0)
    val types = dw.select("w").distinct()
      .withColumn("sym", concat(lit(" "),
        concat_ws(" ", expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")),
        lit(" ")))
    val applied = merges.foldLeft(types) { case (df, (_, a, b, _, _)) =>
      df.withColumn("sym", call_function("replace", col("sym"),
        lit(s" $a $b "), lit(s" $a$b ")))
    }.select(col("w"),
      size(split(trim(col("sym")), " ")).cast("long").as("n_tok"))
    dw.join(applied, Seq("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(col("n_tok")).cast("long").as("bpe_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("bpe_tokens"), 6))
      .orderBy("source")
  }

  val tBpeApplySql: String = {
    val applySteps = (1 to bpeRounds).map { k =>
      val p = k - 1
      s"""s$k AS (SELECT w, replace(sym, ' ' || t.a || ' ' || t.b || ' ', ' ' || t.a || t.b || ' ') AS sym
         |        FROM s$p, top$k t)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeTrainCtes,
       |dw AS (
       |  SELECT source, w.word AS w
       |  FROM documents,
       |    LATERAL (SELECT unnest(string_split($normSql, ' ')) AS word) w
       |  WHERE length(w.word) > 0),
       |s0 AS (
       |  SELECT w, ' ' || array_to_string([substr(w, CAST(i AS INT), 1)
       |           for i in generate_series(1, length(w))], ' ') || ' ' AS sym
       |  FROM (SELECT DISTINCT w FROM dw)),
       |$applySteps,
       |nt AS (SELECT w, CAST(len(string_split(trim(sym), ' ')) AS BIGINT) AS n_tok
       |       FROM s$bpeRounds)
       |SELECT source, COUNT(*) AS n_words,
       |  CAST(SUM(length(w)) AS BIGINT) AS n_chars,
       |  CAST(SUM(n_tok) AS BIGINT) AS bpe_tokens,
       |  round(CAST(SUM(length(w)) AS DOUBLE) / SUM(n_tok), 6) AS chars_per_token
       |FROM dw JOIN nt USING (w)
       |GROUP BY 1 ORDER BY source""".stripMargin
  }

  /** RAKE keyword extraction (Rose et al. 2010) — corpus-level top-25 key
    * phrases: candidate phrases are maximal stopword-free word runs; a
    * word scores degree/freq (degree = Σ length of the phrases it appears
    * in — co-occurrence weighted); a phrase scores the sum of its words'
    * scores. The classic zero-training keyword baseline a curation
    * pipeline runs to label domains.
    *
    * Scale shape: phrase segmentation is a per-DOC window (doc_id keyed —
    * bounded fan, never content); word stats are ONE map-side-combined
    * aggregate; the score join-back keys on word (vocab-scale right side;
    * hot words are exactly what AQE skew-split handles — and stopwords,
    * the worst offenders, are already gone by construction); phrase
    * dedup-and-count is a map-side-combined group on phrase text; final
    * top-25 is TakeOrdered on (rounded score, phrase). Word scores are
    * integer-ratio doubles rounded 6 dp, phrase scores decimal-summed
    * (§4 order-proof). */
  def tRakeKeywords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for",
      "on", "with", "as", "at", "by", "an", "be", "this", "that", "from",
      "or", "are", "was", "i", "you", "he", "she", "we", "they", "not",
      "but", "have", "has", "had")
    val alpha = regexp_replace(lower(col("text")), "[^a-z]+", " ")
    val words = Tables.fanout(Tables.table(spark, dir, "documents"))
      .select(col("doc_id"), posexplode(split(trim(alpha), " ")).as(Seq("pos", "word")))
      .where(col("word") =!= "" && !col("word").isin(stops: _*))
    // phrase length rides along as a window count over the SAME doc-keyed
    // partitioning the run-grouping already uses — no phrase join-back
    val runs = words.withColumn("grp",
        col("pos") - row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      .withColumn("phrase_len",
        count(lit(1)).over(Window.partitionBy("doc_id", "grp")))
    val wordStats = runs
      .groupBy("word")
      .agg(count(lit(1)).as("freq"), sum(col("phrase_len")).as("degree"))
      .select(col("word"),
        round(col("degree").cast("double") / col("freq"), 6).as("wscore"))
    runs.join(wordStats, Seq("word"))
      .groupBy("doc_id", "grp")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, word))), s -> s.word), ' ')")
        .as("phrase"),
        Tables.dsum(col("wscore")).as("score"),
        first(col("phrase_len")).as("n_words"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_occ"), max(col("score")).as("score"),
        first(col("n_words")).cast("long").as("n_words"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(25)
  }

  val tRakeKeywordsSql: String = {
    val stops = "'the','a','of','and','to','in','is','it','for','on','with','as','at','by','an','be','this','that','from','or','are','was','i','you','he','she','we','they','not','but','have','has','had'"
    s"""WITH w0 AS (
       |  SELECT doc_id, w.word, w.pos
       |  FROM documents,
       |    LATERAL (SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS word,
       |                    generate_subscripts(string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' '), 1) - 1 AS pos) w
       |  WHERE w.word <> '' AND w.word NOT IN ($stops)),
       |runs AS (
       |  SELECT doc_id, word, pos,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM w0),
       |ph AS (
       |  SELECT doc_id, grp, string_agg(word, ' ' ORDER BY pos) AS phrase,
       |    COUNT(*) AS phrase_len
       |  FROM runs GROUP BY 1, 2),
       |ws AS (
       |  SELECT word,
       |    round(CAST(SUM(phrase_len) AS DOUBLE) / COUNT(*), 6) AS wscore
       |  FROM runs JOIN ph USING (doc_id, grp) GROUP BY 1),
       |psc AS (
       |  SELECT r.doc_id, r.grp, ph.phrase,
       |    CAST(SUM(CAST(ws.wscore AS DECIMAL(30,6))) AS DOUBLE) AS score,
       |    CAST(MAX(ph.phrase_len) AS BIGINT) AS n_words
       |  FROM runs r JOIN ph USING (doc_id, grp) JOIN ws ON r.word = ws.word
       |  GROUP BY 1, 2, 3)
       |SELECT phrase, COUNT(*) AS n_occ, MAX(score) AS score,
       |  CAST(MAX(n_words) AS BIGINT) AS n_words
       |FROM psc GROUP BY 1
       |ORDER BY MAX(score) DESC, phrase LIMIT 25""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_entropy" -> (tEntropy _),
    "t_c4_filter" -> (tC4Filter _),
    "t_rake_keywords" -> (tRakeKeywords _),
    "t_bpe_train" -> (tBpeTrain _),
    "t_bpe_apply" -> (tBpeApply _))

  val oracles: Map[String, String] = Map(
    "t_entropy" -> tEntropySql,
    "t_c4_filter" -> tC4FilterSql,
    "t_rake_keywords" -> tRakeKeywordsSql,
    "t_bpe_train" -> tBpeTrainSql,
    "t_bpe_apply" -> tBpeApplySql)
}
