package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.4 continued (round 4): bloom-filter membership pre-filtering for
  * ingest-time dedup — the constant-space complement to
  * [[Pipeline.pIncrementalDedup]]'s join-based exact check.
  *
  * Why a bloom filter at 100 TB: when the INGEST BATCH itself is large
  * (billions of rows/day), the exact batch⋈corpus fingerprint join is a
  * full shuffle of both sides. A bloom filter over the corpus fingerprints
  * is a fixed-size bitset (m bits, sized for the target FPR) that each
  * executor probes locally — the exact confirm join then runs only on the
  * surviving sliver (true dups + FPR-bounded false positives), small enough
  * to broadcast. No-match rows (the vast majority of a healthy ingest)
  * never shuffle at all. False negatives are impossible, so the final
  * result stays EXACT — the oracle is the plain text-equality join.
  *
  * The filter is built and probed as DataFrame algebra — no custom agg, no
  * driver-side bitset:
  *  - build: each corpus fp emits its k=5 bit positions (double hashing:
  *    pos_i = (h1 + i·h2) mod m over xxhash64) → groupBy(word) bit_or —
  *    one map-side-combined aggregate producing ≤ m/64 longs;
  *  - the ≤ m/64-entry word→bits map (32 KB at m=2¹⁸) broadcasts to every
  *    probe task — model-parameter scale, like a centroid matrix;
  *  - probe: k unrolled bit tests (plain codegen'd column algebra, no HOF).
  */
object Dedup2 {

  private val mBits = 1L << 18 // 262144 bits ⇒ FPR ≈ 3e-4 at 4.5k keys, k=5
  private val kHashes = 5

  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Bag-of-words fingerprint: the sorted distinct word set. Catches
    * reordering/repetition variants of the same content (the corpus has no
    * byte-exact dups but plenty of shuffled near-dups) while staying an
    * EXACT equality key — exactly what membership filtering needs. */
  private[graft] def fingerprint(c: Column): Column =
    concat_ws(" ", array_sort(array_distinct(split(norm(c), " "))))
  private val fingerprintSql =
    s"array_to_string(list_sort(list_distinct(string_split($normSql, ' '))), ' ')"

  /** the k bloom bit positions for a text column (double hashing).
    * Both hashes are reduced mod m BEFORE the combine so the arithmetic
    * stays far from Long range (ANSI overflow checking is on). */
  private def positions(t: Column): Seq[Column] = {
    val h1 = pmod(xxhash64(t), lit(mBits))
    val h2 = pmod(xxhash64(t, lit("graft-bloom")), lit(mBits))
    (0 until kHashes).map(i => pmod(h1 + lit(i.toLong) * h2, lit(mBits)))
  }

  /** single-row DataFrame: the corpus bloom bitset as a word→bits map */
  private def bloomOf(corpus: DataFrame): DataFrame =
    corpus.select(explode(array(positions(fingerprint(col("text"))): _*)).as("pos"))
      .select((col("pos") / lit(64L)).cast("long").as("word"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64L)).cast("int"))
          .as("bit"))
      .groupBy("word").agg(call_function("bit_or", col("bit")).as("bits"))
      .groupBy()
      .agg(map_from_entries(array_sort(collect_list(struct(col("word"), col("bits")))))
        .as("bloom"))

  /** k unrolled bit tests against the broadcast word→bits map */
  private def mightContain(t: Column, bloom: Column): Column =
    positions(t).map { p =>
      val word = (p / lit(64L)).cast("long")
      val mask = call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))
      coalesce(element_at(bloom, word), lit(0L)).bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)

  /** batch rows surviving the bloom probe (true dups + bounded FPs) —
    * exposed for the spec's FPR assertion. */
  private[graft] def bloomSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.fanout(Tables.table(spark, dir, "documents"))
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    batch.crossJoin(broadcast(bloomOf(corpus)))
      .where(mightContain(fingerprint(col("text")), col("bloom")))
      .select(col("doc_id"), fingerprint(col("text")).as("t"))
  }

  /** Ingest-batch exact dedup with bloom pre-filter: batch docs (doc_id %
    * 10 = 0) whose normalized text already exists in the corpus (doc_id %
    * 10 ≠ 0), each with its smallest matching corpus doc. The bloom probe
    * eliminates non-duplicates before the exact confirm join; the result is
    * identical to the plain join (no false negatives), which IS the oracle. */
  def dBloomIngest(spark: SparkSession, dir: String): DataFrame = {
    val survivors = bloomSurvivors(spark, dir)
    val corpus = Tables.fanout(Tables.table(spark, dir, "documents"))
      .where(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("corpus_doc"), fingerprint(col("text")).as("t"))
    survivors.join(corpus, Seq("t")) // exact confirm: text equality
      .groupBy("doc_id").agg(min(col("corpus_doc")).as("dup_of"))
      .orderBy("doc_id")
  }

  val dBloomIngestSql: String =
    s"""WITH n AS (SELECT doc_id, $fingerprintSql AS t FROM documents)
       |SELECT b.doc_id, min(c.doc_id) AS dup_of
       |FROM n b JOIN n c ON b.t = c.t
       |WHERE b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
       |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin

  /** Content-defined chunking (round 7): chunk boundaries where the rolling
    * 8-codepoint window hash ≡ 0 (mod 64) — boundaries move WITH the
    * content, so an insertion early in a document shifts only the chunk it
    * lands in, and every identical substring longer than a chunk yields
    * byte-identical chunks across documents (the property fixed-size
    * chunking destroys; THE dedup technique for append/edit-heavy and
    * binary corpora — rsync/LBFS/casync lineage, m_cas_dedup's
    * sub-object-granularity sibling).
    *
    * Boundary detection = ONE O(n) pass per doc through the native
    * [[graft.functions.PolyRollHashes]] codegen expression (true
    * Rabin–Karp rolling identity, not per-window refolds); chunk content
    * keys are poly hashes (portable family ⇒ the DuckDB oracle replays
    * boundaries AND chunk identity bit-for-bit, per-window refolds being
    * its equivalent spelling); the dedup rollup is one hash-keyed
    * map-side-combined aggregate. Expected chunk length = 64+8 chars
    * (mask 2⁻⁶) — the mask is THE chunk-size dial; production adds
    * min/max clamps, stated here as the deliberate simplification. */
  def dCdcChunks(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Poly
    val d = Tables.fanout(Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text")))
      .where(col("doc_id") % 5 === 0 && length(col("text")) >= 8)
      .cache()
    val edges = d
      .select(col("doc_id"), col("text"),
        Poly.rollHashes(col("text"), 8).as("wh"))
      .select(col("doc_id"), col("text"), expr(
        """array_distinct(concat(array(0),
          |  filter(transform(wh, (h, i) -> CASE WHEN h % 64 = 0 THEN i + 8
          |                                 ELSE -1 END), p -> p > 0),
          |  array(length(text))))""".stripMargin).as("es"))
    val chunks = edges
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(2, size(es))")).as("k"), col("es"))
      .select(col("doc_id"), expr(
        "substring(text, element_at(es, k - 1) + 1, element_at(es, k) - element_at(es, k - 1))")
        .as("chunk"))
    val grp = chunks
      .select(element_at(Poly.ngramHashes(array(col("chunk")), 1), 1).as("h"),
        length(col("chunk")).as("len"))
      .groupBy("h").agg(count(lit(1)).as("c"), max("len").as("len"))
    grp.agg(
        expr("cast(sum(c) as bigint)").as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        expr("cast(sum(c) - count(1) as bigint)").as("dup_copies"),
        max("c").as("max_reuse"),
        expr("round(cast(sum(cast(len * c as decimal(30,6))) as double) / sum(c), 4)")
          .as("mean_chunk_len"))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("n_docs"))))
      .select(col("n_docs"), col("n_chunks"), col("n_distinct"),
        col("dup_copies"), col("max_reuse"), col("mean_chunk_len"))
  }

  val dCdcChunksSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS n FROM documents
       |  WHERE doc_id % 5 = 0 AND length(text) >= 8),
       |w AS (
       |  SELECT doc_id, n, CAST(i AS INT) AS s,
       |    ${Dedup.polySql("substr(text, CAST(i AS INT), 8)")} AS h
       |  FROM d, unnest(range(1, n - 6)) AS t(i)),
       |cuts AS (
       |  SELECT doc_id, list_sort(list(DISTINCT s + 7)) AS cs
       |  FROM w WHERE h % 64 = 0 GROUP BY 1),
       |edges AS (
       |  SELECT d.doc_id, d.text,
       |    list_sort(list_distinct([0] || COALESCE(c.cs, []) || [CAST(d.n AS INT)])) AS es
       |  FROM d LEFT JOIN cuts c USING (doc_id)),
       |chunks AS (
       |  SELECT doc_id, substr(text, es[k-1] + 1, es[k] - es[k-1]) AS chunk
       |  FROM edges, unnest(range(2, len(es) + 1)) AS t(k)),
       |ch AS (SELECT ${Dedup.polySql("chunk")} AS h, length(chunk) AS len FROM chunks),
       |grp AS (SELECT h, COUNT(*) AS c, MAX(len) AS len FROM ch GROUP BY 1)
       |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_docs,
       |  CAST(SUM(c) AS BIGINT) AS n_chunks,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
       |  CAST(SUM(c) - COUNT(*) AS BIGINT) AS dup_copies,
       |  CAST(MAX(c) AS BIGINT) AS max_reuse,
       |  round(CAST(SUM(CAST(len * c AS DECIMAL(30,6))) AS DOUBLE) / SUM(c), 4) AS mean_chunk_len
       |FROM grp""".stripMargin

  /** Persisted LSH index + incremental fuzzy lookup (round 7): the corpus
    * side's MinHash band signatures are built ONCE and committed as a LAKE
    * TABLE; an ingest batch then computes only ITS OWN signatures and
    * equi-joins the persisted index — the production shape for continuous
    * near-dup screening at 100 TB (corpus signatures are never recomputed
    * per batch; the index table is 32 rows × 16 bytes per document,
    * ~0.1% of corpus bytes, and appends compose because bands are
    * per-document). d_bloom_ingest's fuzzy sibling: the bloom pre-filter
    * screens EXACT dups constant-space, this screens NEAR-dups
    * index-space. Candidates verify against exact shingle Jaccard ≥ 0.5
    * (precision 1.0 by construction); keep-min winner via min(struct) —
    * no content-keyed window. Oracle replays the identical signature
    * algebra (portable poly family) with the corpus/batch split applied
    * at candidate time. */
  def dIndexPersist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val cat = new graft.catalog.LakeCatalog(spark,
      s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
    val sh = Dedup.polyShingles(spark, dir).cache()
    def sigsOf(s: DataFrame): DataFrame = s.groupBy("doc_id")
      .agg(graft.functions.Poly.minhash(col("h"), 128).as("m"))
      .select(col("doc_id"),
        posexplode(graft.functions.Poly.bandSigs(col("m"), 4))
          .as(Seq("band", "sig")))
    // BUILD once: persist the corpus index as a lake table
    cat.dropTable("scratch", "lsh_index")
    cat.createTable("scratch", "lsh_index", StructType(Seq(
      StructField("doc_id", LongType), StructField("band", IntegerType),
      StructField("sig", LongType))))
    cat.append("scratch", "lsh_index",
      sigsOf(sh.where(col("doc_id") % 10 =!= 0))
        .select("doc_id", "band", "sig"))
    // QUERY: the batch joins the PERSISTED index read back from the lake
    val idx = cat.load("scratch", "lsh_index")
    val cand = sigsOf(sh.where(col("doc_id") % 10 === 0)).as("q")
      .join(idx.as("i"),
        col("q.band") === col("i.band") && col("q.sig") === col("i.sig"))
      .select(col("i.doc_id").as("doc_a"), col("q.doc_id").as("doc_b"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shared = broadcast(cand)
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"), col("doc_b") === col("b.doc_id") && col("a.h") === col("b.h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("shared").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("shared")), 6).as("jaccard"))
      .where(col("jaccard") >= 0.5)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min(struct(col("doc_a"), col("jaccard"))).as("w"))
      .select(col("doc_id"), col("w.doc_a").as("dup_of"),
        col("w.jaccard").as("jaccard"))
      .orderBy("doc_id")
  }

  val dIndexPersistSql: String = {
    val M = graft.functions.PolyHash.M
    val (b2, phi, psi) = (graft.functions.PolyHash.B2,
      graft.functions.PolyHash.PHI, graft.functions.PolyHash.PSI)
    val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
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
       |ph AS (SELECT doc_id, ${Dedup.polySql("shingle")} AS h FROM sh),
       |mh AS (
       |  SELECT doc_id, t.p AS p,
       |    min((((CAST(2*t.p+1 AS HUGEINT) * $phi) % $M) * CAST(h AS HUGEINT)
       |         + ((CAST(t.p+1 AS HUGEINT) * $psi) % $M)) % $M) AS mv
       |  FROM ph CROSS JOIN generate_series(0, 127) t(p) GROUP BY 1, 2),
       |ml AS (SELECT doc_id, list(mv ORDER BY p) AS ml FROM mh GROUP BY 1),
       |sg AS (
       |  SELECT doc_id, b.b AS band,
       |    CAST(list_reduce([0::HUGEINT, CAST(b.b+1 AS HUGEINT)] ||
       |           [CAST(ml[b.b*4 + r] + 1 AS HUGEINT) for r in generate_series(1, 4)],
       |         (acc, x) -> (acc * $b2 + x) % $M::HUGEINT) AS BIGINT) AS sig
       |  FROM ml CROSS JOIN generate_series(0, 31) b(b)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM sg x JOIN sg y ON x.band = y.band AND x.sig = y.sig
       |  WHERE x.doc_id % 10 <> 0 AND y.doc_id % 10 = 0),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       |shr AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) AS jaccard
       |  FROM shr JOIN sizes sa ON doc_a = sa.doc_id
       |           JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) >= 0.5)
       |SELECT doc_b AS doc_id, doc_a AS dup_of, jaccard FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_b ORDER BY doc_a) AS r
       |  FROM pairs) z
       |WHERE r = 1 ORDER BY doc_id""".stripMargin
  }

  /** LSH index-quality telemetry: per-similarity-bucket recall of the
    * banded MinHash index against exact ground truth — the DEDUP side of
    * s_ann_recall, and the empirical form of the banding S-CURVE every LSH
    * deployment is tuned by (P[collide] = 1−(1−j^r)^b; with r=4, b=32 the
    * curve should be near-0 below j≈0.4 and near-1 above j≈0.7 — this op
    * MEASURES where it actually sits on the corpus). Ground truth = exact
    * Jaccard ≥ 0.5 over the same shingle set via the blocked h-equi-join
    * (d_ngram_jaccard's shape — never all-pairs); found = d_minhash_lsh's
    * verified pairs (a subset by construction, so precision is 1 and
    * RECALL is the entire story). Buckets are ⌊10·j⌋ clamped to 9;
    * recall in exact ppm.
    *
    * Fixed anchor panel (VERDICT r12 #3): the exact-truth side anchors on
    * docs with `doc_id < 100000` — recall is ESTIMATED over a fixed-size
    * anchor sample instead of every pair, so the truth join's cost is
    * panel-shingles × bucket contents (linear in corpus), never Σ|bucket|²
    * over the whole corpus. Vacuous at test scale (doc_id ≤ 4999): hash
    * gates unchanged; the oracle carries the identical bound. */
  def dLshRecall(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.polyShingles(spark, dir).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val exact = sh.where(col("doc_id") < 100000).as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("shared").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("shared")), 6).as("jaccard"))
      .where(col("jaccard") >= 0.5)
    val found = Dedup.dMinhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
    exact
      .withColumn("bucket",
        least(floor(col("jaccard") * 10), lit(9)).cast("int"))
      .join(found, Seq("doc_a", "doc_b"), "left")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .select(col("bucket"), col("n_true"), col("n_found"),
        expr("n_found * 1000000 div n_true").as("recall_ppm"))
      .orderBy("bucket")
  }

  val dLshRecallSql: String = {
    val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    // the nested SQL is substituted AFTER stripMargin: it contains lines
    // whose first non-blank char is the `||` concat operator, which
    // stripMargin would otherwise truncate at
    s"""WITH lsh AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM (@@LSH@@) t),
       |tok2 AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS word,
       |         generate_subscripts(string_split($normSql, ' '), 1) AS pos
       |  FROM documents),
       |sh2 AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w
       |         || ' ' || lead(word,3) OVER w || ' ' || lead(word,4) OVER w AS shingle
       |  FROM tok2 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |  QUALIFY lead(word,4) OVER w IS NOT NULL),
       |sizes2 AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY 1),
       |exact AS MATERIALIZED (
       |  SELECT doc_a, doc_b,
       |    round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) AS jaccard
       |  FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |    FROM sh2 a JOIN sh2 b
       |      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |    WHERE a.doc_id < 100000
       |    GROUP BY 1, 2) s
       |  JOIN sizes2 sa ON doc_a = sa.doc_id
       |  JOIN sizes2 sb ON doc_b = sb.doc_id
       |  WHERE round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) >= 0.5)
       |SELECT bucket, n_true, n_found,
       |  CAST(n_found * 1000000 // n_true AS BIGINT) AS recall_ppm
       |FROM (
       |  SELECT CAST(LEAST(CAST(floor(e.jaccard * 10) AS INTEGER), 9) AS INTEGER) AS bucket,
       |    COUNT(*) AS n_true,
       |    CAST(SUM(CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_found
       |  FROM exact e LEFT JOIN lsh l
       |    ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b
       |  GROUP BY 1)
       |ORDER BY bucket""".stripMargin
      .replace("@@LSH@@", Dedup.dMinhashLshSql)
  }

  /** Duplication profile: the histogram of exact-duplicate cluster sizes —
    * how many fingerprints occur exactly k times, with per-k document and
    * redundant-copy mass plus corpus-level shares in exact ppm. The first
    * number a curation run reports ("X% of the corpus is literal
    * duplicates") and the input to dedup-capacity planning (the k tail
    * decides whether soft-dedup weights or hard removal is the right
    * policy). Two map-side-combined aggregates: fingerprint → cluster
    * size, size → cluster count; fan bounded by the distinct-size domain. */
  def dDupProfile(spark: SparkSession, dir: String): DataFrame = {
    val norm2 = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val clusters = Tables.table(spark, dir, "documents")
      .groupBy(md5(norm2).as("fp")).agg(count(lit(1)).as("k"))
    val total = clusters.agg(sum(col("k")).as("n_docs"))
    clusters.groupBy("k").agg(count(lit(1)).as("n_clusters"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("n_clusters"),
        (col("k") * col("n_clusters")).as("n_docs_at_k"),
        ((col("k") - 1) * col("n_clusters")).as("n_redundant"),
        expr("k * n_clusters * 1000000 div n_docs").as("docs_share_ppm"),
        expr("(k - 1) * n_clusters * 1000000 div n_docs").as("redundant_share_ppm"))
      .orderBy("k")
  }

  val dDupProfileSql: String =
    """WITH cl AS (
      |  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |    COUNT(*) AS k
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(k) AS BIGINT) AS n_docs FROM cl)
      |SELECT k, COUNT(*) AS n_clusters,
      |  CAST(k * COUNT(*) AS BIGINT) AS n_docs_at_k,
      |  CAST((k - 1) * COUNT(*) AS BIGINT) AS n_redundant,
      |  CAST(k * COUNT(*) * 1000000 // n_docs AS BIGINT) AS docs_share_ppm,
      |  CAST((k - 1) * COUNT(*) * 1000000 // n_docs AS BIGINT)
      |    AS redundant_share_ppm
      |FROM cl, t GROUP BY k, n_docs ORDER BY k""".stripMargin

  /** Asymmetric near-dup: shingle CONTAINMENT C(A→B) = |A∩B|/|A| (Broder's
    * second resemblance measure). Jaccard under-scores a short document
    * swallowed whole by a long one (the quote / partial-mirror case:
    * |A∩B|/|A∪B| is small when |B| ≫ |A| even at full containment), so
    * dedup pipelines run BOTH thresholds. Directed pairs, C ≥ 0.8, jaccard
    * reported alongside so the asymmetric catches are visible.
    *
    * Same inverted-index candidate generation as d_ngram_jaccard (pairs
    * only for docs sharing a shingle, df-cap skew guard); one extra
    * direction doubles the pair rows, nothing else. */
  def dShingleContainment(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.filteredShingles(spark, dir).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shared = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("shared").cast("double") / col("sa.n_sh"), 6)
          .as("containment"),
        round(col("shared").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("shared")), 6).as("jaccard"))
      .where(col("containment") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  val dShingleContainmentSql: String =
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
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(shared*1.0/sa.n_sh, 6) AS containment,
       |  round(shared*1.0/(sa.n_sh + sb.n_sh - shared), 6) AS jaccard
       |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE round(shared*1.0/sa.n_sh, 6) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Corpus novelty curve: per 100-doc ingest bucket, what fraction of
    * shingles had never been seen in any EARLIER document (first_seen =
    * min doc_id per shingle — one map-side-combined aggregate, no ordered
    * scan). The declining-novelty curve is how corpus collection decides
    * when a source is mined out — the marginal-value number next to
    * d_dup_profile's literal-dup rate. Uses the UNfiltered shingle
    * universe (the df-cap would drop exactly the repeated shingles novelty
    * measures); hashed shingles are equality-equivalent to the oracle's
    * strings (the documented 2⁻⁶⁴ contract at Dedup.shingles). */
  def dNoveltyCurve(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(spark, dir).cache()
    val first = sh.groupBy("h").agg(min("doc_id").as("first_doc"))
    val perDoc = sh.join(first, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    perDoc.groupBy(expr("doc_id div 100").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_sh").cast("long").as("total_shingles"),
        sum("n_novel").cast("long").as("novel_shingles"))
      .select(col("bucket"), col("n_docs"), col("total_shingles"),
        col("novel_shingles"),
        expr("(1000000 * novel_shingles) div total_shingles").as("novelty_ppm"))
      .orderBy("bucket")
  }

  val dNoveltyCurveSql: String =
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
       |fs AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
       |pd AS (
       |  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh,
       |    CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
       |  FROM sh s JOIN fs f ON f.shingle = s.shingle GROUP BY 1)
       |SELECT doc_id // 100 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_sh) AS BIGINT) AS total_shingles,
       |  CAST(SUM(n_novel) AS BIGINT) AS novel_shingles,
       |  (1000000 * CAST(SUM(n_novel) AS BIGINT)) // CAST(SUM(n_sh) AS BIGINT) AS novelty_ppm
       |FROM pd GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Cross-source duplication matrix — the provenance contamination map:
    * for every ordered source pair (a, b), how many of a's documents have
    * an exact-dup twin in b (ppm of a's docs). The matrix that answers
    * "is crawl X just a mirror of dump Y?" before anyone weights sources
    * independently. Exact-dup fingerprints (d_exact's md5 canonical key)
    * reduced to per-(fp, source) presence, then one self-join on fp —
    * candidate fan bounded by sources-per-fingerprint, never docs². */
  def dCrossSourceDup(spark: SparkSession, dir: String): DataFrame = {
    val fps = Tables.table(spark, dir, "documents")
      .select(col("source"), md5(norm(col("text"))).as("fp"))
    val bySrc = fps.groupBy("source", "fp").agg(count(lit(1)).as("n_docs"))
      .cache()
    val srcTot = bySrc.groupBy("source")
      .agg(sum("n_docs").cast("long").as("total_docs"))
    val overlap = bySrc.as("a").join(bySrc.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(sum(col("a.n_docs")).cast("long").as("dup_docs"))
    // complete ordered-pair spine: a clean matrix reports its ZEROS (the
    // "no contamination" cells are the answer most pairs give)
    val spine = srcTot.select(col("source").as("src_a"),
        col("total_docs").as("a_total"))
      .crossJoin(srcTot.select(col("source").as("src_b")))
      .where(col("src_a") =!= col("src_b"))
    spine.join(overlap, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"), col("a_total"),
        expr("(1000000 * coalesce(dup_docs, 0)) div a_total").as("dup_ppm"))
      .orderBy("src_a", "src_b")
  }

  val dCrossSourceDupSql: String =
    s"""WITH fps AS (
       |  SELECT source, md5($normSql) AS fp FROM documents),
       |bys AS (SELECT source, fp, CAST(COUNT(*) AS BIGINT) AS n_docs
       |        FROM fps GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS total_docs
       |        FROM bys GROUP BY 1),
       |ov AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |         CAST(SUM(a.n_docs) AS BIGINT) AS dup_docs
       |  FROM bys a JOIN bys b ON a.fp = b.fp AND a.source <> b.source
       |  GROUP BY 1, 2),
       |spine AS (
       |  SELECT ta.source AS src_a, ta.total_docs AS a_total, tb.source AS src_b
       |  FROM tot ta CROSS JOIN tot tb WHERE ta.source <> tb.source)
       |SELECT s.src_a, s.src_b, COALESCE(ov.dup_docs, 0) AS dup_docs,
       |  s.a_total,
       |  (1000000 * COALESCE(ov.dup_docs, 0)) // s.a_total AS dup_ppm
       |FROM spine s LEFT JOIN ov ON ov.src_a = s.src_a AND ov.src_b = s.src_b
       |ORDER BY s.src_a, s.src_b""".stripMargin

  /** Cross-source NEAR-duplicate matrix (r10 — [[dCrossSourceDup]]'s fuzzy
    * sibling, the provenance question exact fingerprints under-answer:
    * "is crawl X a light paraphrase mirror of dump Y?"): per ordered
    * source pair (a, b), a's docs with a VERIFIED near-dup twin in b
    * (Jaccard ≥ 0.5 over the d_minhash_lsh chain — banded candidates,
    * exact shingle verify, never all-pairs), as count + exact ppm of a.
    * The COMPLETE |sources|² spine reports its zeros (most cells SHOULD
    * read 0 — that silence is the answer). Exact dups count too (j = 1 —
    * near-dup is a superset by construction). At 100 TB: the pair set is
    * the near-dup graph (sparse), tagging is two doc_id equi-joins, the
    * matrix is |sources|²-bounded metadata. */
  def dCrossSourceNeardup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.dMinhashLsh(spark, dir).select("doc_a", "doc_b")
    val src = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val both = pairs.union(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val tagged = both
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
      .where(col("src_a") =!= col("src_b"))
    val nd = tagged.groupBy("src_a", "src_b")
      .agg(countDistinct(col("doc_a")).as("nd_docs"))
    val tot = src.groupBy("source").agg(count(lit(1)).as("total_docs"))
    val spine = tot.select(col("source").as("src_a"), col("total_docs").as("a_total"))
      .crossJoin(tot.select(col("source").as("src_b")))
      .where(col("src_a") =!= col("src_b"))
    spine.join(nd, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("nd_docs"), lit(0L)).as("nd_docs"), col("a_total"),
        expr("CAST((1000000 * coalesce(nd_docs, 0)) div a_total AS BIGINT)")
          .as("nd_ppm"))
      .orderBy("src_a", "src_b")
  }

  // the nested chain substitutes AFTER stripMargin (its continuation lines
  // begin with the || concat operator — the d_lsh_recall precedent)
  val dCrossSourceNeardupSql: String =
    s"""WITH p AS (SELECT doc_a, doc_b FROM (__LSH_PAIRS__) t),
       |bi AS (SELECT doc_a, doc_b FROM p
       |       UNION ALL SELECT doc_b, doc_a FROM p),
       |src AS (SELECT doc_id, source FROM documents),
       |tg AS (
       |  SELECT sa.source AS src_a, sb.source AS src_b, bi.doc_a
       |  FROM bi JOIN src sa ON sa.doc_id = bi.doc_a
       |          JOIN src sb ON sb.doc_id = bi.doc_b
       |  WHERE sa.source <> sb.source),
       |nd AS (SELECT src_a, src_b,
       |         CAST(COUNT(DISTINCT doc_a) AS BIGINT) AS nd_docs
       |       FROM tg GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS total_docs
       |        FROM documents GROUP BY 1),
       |spine AS (
       |  SELECT a.source AS src_a, a.total_docs AS a_total, b.source AS src_b
       |  FROM tot a JOIN tot b ON a.source <> b.source)
       |SELECT s.src_a, s.src_b, COALESCE(nd.nd_docs, 0) AS nd_docs, s.a_total,
       |  CAST((1000000 * COALESCE(nd.nd_docs, 0)) // s.a_total AS BIGINT) AS nd_ppm
       |FROM spine s LEFT JOIN nd ON nd.src_a = s.src_a AND nd.src_b = s.src_b
       |ORDER BY s.src_a, s.src_b""".stripMargin
      .replace("__LSH_PAIRS__", Dedup.dMinhashLshSql)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_cross_source_neardup" -> (dCrossSourceNeardup _),
    "d_cross_source_dup" -> (dCrossSourceDup _),
    "d_novelty_curve" -> (dNoveltyCurve _),
    "d_dup_profile" -> (dDupProfile _),
    "d_lsh_recall" -> (dLshRecall _),
    "d_bloom_ingest" -> (dBloomIngest _),
    "d_cdc_chunks" -> (dCdcChunks _),
    "d_index_persist" -> (dIndexPersist _),
    "d_shingle_containment" -> (dShingleContainment _))

  val oracles: Map[String, String] = Map(
    "d_cross_source_neardup" -> dCrossSourceNeardupSql,
    "d_cross_source_dup" -> dCrossSourceDupSql,
    "d_novelty_curve" -> dNoveltyCurveSql,
    "d_dup_profile" -> dDupProfileSql,
    "d_lsh_recall" -> dLshRecallSql,
    "d_bloom_ingest" -> dBloomIngestSql,
    "d_cdc_chunks" -> dCdcChunksSql,
    "d_index_persist" -> dIndexPersistSql,
    "d_shingle_containment" -> dShingleContainmentSql)
}
