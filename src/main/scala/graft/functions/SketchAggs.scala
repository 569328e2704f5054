package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sketch aggregates as single-column TypedImperativeAggregates.
  *
  * Why not N plain agg columns? A 128-column `min(xxhash64(h, p))` aggregate
  * is semantically perfect and executes fast once compiled, but Janino pays
  * seconds compiling the generated wide HashAggregate (measured: 5-7 s of
  * the d_minhash_lsh / d_simhash cold time at sf0.1 was codegen, not data).
  * A TypedImperativeAggregate keeps the whole sketch in ONE agg column with
  * a primitive long[] buffer — tiny generated plan, no per-element boxing
  * (the failure mode of encoder-based Aggregators, SURVEY §4.1), partial
  * aggregation (map-side combine) intact, buffers serialized only across
  * the exchange. At 100 TB the shuffle carries one ≤1 KB buffer per
  * (partition, group) — same volume as the wide-column shape.
  */
abstract class LongArraySketchAgg extends TypedImperativeAggregate[Array[Long]] {

  protected def bufferLen: Int

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}

/** MinHash signature: `minhash(h, nPerm)` over a LongType pre-hashed element
  * column → array<long> of nPerm minimums, where permutation p's hash is
  * `XXH64.hashLong(h, seed = p)` — byte-identical to the Catalyst
  * `XxHash64(Seq(h), p)` expression the wide-column formulation used, and
  * ANSI-safe (no wrap-around affine arithmetic; Spark 4 rejects overflow).
  */
case class MinHashAgg(
    child: Expression,
    nPerm: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends LongArraySketchAgg {

  override protected def bufferLen: Int = nPerm
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash expects a BIGINT element hash, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nPerm)(Long.MaxValue)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var p = 0
      while (p < nPerm) {
        val x = XXH64.hashLong(h, p)
        if (x < buf(p)) buf(p) = x
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < a.length) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

/** 64-bit SimHash: `simhash(fh)` over a LongType feature-hash column → the
  * packed signature. Each occurrence votes ±1 on every bit by the feature
  * hash's bit pattern; bit j of the result is set iff its vote total is
  * positive. Feeding raw occurrences is equivalent to the classic
  * count-weighted formulation (a feature seen c times contributes ±c either
  * way), so no (doc, feature) pre-aggregation pass is needed — one shuffle
  * total, with map-side combine into the 64-long vote buffer.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends LongArraySketchAgg {

  override protected def bufferLen: Int = 64
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash expects a BIGINT feature hash, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val fh = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        if (((fh >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var s = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) s |= 1L << j; j += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

/** All random-hyperplane LSH signatures in one pass: for an embedding and a
  * plane matrix of `nTables × k` rows, returns array<int> of nTables k-bit
  * signatures (bit j of table t = sign of dot(emb, plane[t*k+j])).
  *
  * Replaces nTables×k separate literal-plane vdot expressions — same double
  * precision left-fold dots, but one compact codegen loop instead of a
  * 72-expression projection (which cost seconds of Janino compile per cold
  * plan) and one traversal of the embedding per plane row.
  */
case class HyperplaneSigs(child: Expression, planes: Seq[Seq[Float]], k: Int)
  extends UnaryExpression {

  @transient private lazy val mat: Array[Array[Float]] = planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes.nonEmpty && planes.length % k == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs expects array<float> and |planes| divisible by k")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"

  override protected def nullSafeEval(a: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val nTables = mat.length / k
    val sigs = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0
      var j = 0
      while (j < k) {
        val plane = mat(t * k + j)
        val n = math.min(emb.numElements(), plane.length)
        var s = 0.0d
        var i = 0
        while (i < n) { s += emb.getFloat(i).toDouble * plane(i).toDouble; i += 1 }
        if (s > 0) sig |= 1 << j
        j += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("planes", mat, "float[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val plane = ctx.freshName("plane")
      s"""
         |int[] $sigs = new int[${mat.length / k}];
         |for (int $t = 0; $t < ${mat.length / k}; $t++) {
         |  int $sig = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    float[] $plane = $matRef[$t * $k + $j];
         |    int $n = java.lang.Math.min($a.numElements(), $plane.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += (double) $a.getFloat($i) * (double) $plane[$i];
         |    }
         |    if ($s > 0) $sig |= 1 << $j;
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

/** All word-k-gram hashes of a string array in one codegen loop:
  * `ngram_hashes(ws, k)[i] = xxhash64(ws[i], …, ws[i+k-1])` — byte-identical
  * to the Catalyst multi-arg XxHash64 fold (seed 42, then each word's
  * XXH64.hashUTF8String chains the running seed).
  *
  * Replaces `transform(sequence(…), i -> xxhash64(element_at(…)…))`: array
  * HOF lambdas are CodegenFallback, so that shape pays interpreted
  * per-element dispatch on the hottest loop of the dedup family. This is a
  * plain UnaryExpression — whole-stage codegen'd wherever the scan
  * projection compiles, k×(n−k+1) hash calls and nothing else. */
case class NgramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects (array<string>, k >= 1), got ${child.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(a: Any): Any = {
    val ws = a.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val m = math.max(n - k + 1, 0)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < k) { h = XXH64.hashUTF8String(ws.getUTF8String(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $a.numElements();
         |int $m = java.lang.Math.max($n - $k + 1, 0);
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = 42L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    $h = $xxh.hashUTF8String($a.getUTF8String($i + $j), $h);
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** Product-quantization encode: split the embedding into `m` subvectors,
  * emit the index of the nearest codebook centroid per subvector
  * (array<int> of m codes). Codebook shape: m × k × (dims/m) floats. One
  * codegen loop; L2 argmin per subvector with first-wins tie-break. */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Float]]])
  extends UnaryExpression {

  @transient private lazy val cb: Array[Array[Array[Float]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if codebook.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("pq_encode expects array<float>")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(a: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val m = cb.length
    val sub = cb(0)(0).length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb(s).length) {
        val cent = cb(s)(c)
        var d = 0.0d
        var i = 0
        while (i < sub) {
          val diff = emb.getFloat(s * sub + i).toDouble - cent(i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cent = ctx.freshName("cent")
      val sub = cb(0)(0).length
      s"""
         |int[] $codes = new int[${cb.length}];
         |for (int $s = 0; $s < ${cb.length}; $s++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cbRef[$s].length; $c++) {
         |    float[] $cent = $cbRef[$s][$c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $diff = (double) $a.getFloat($s * $sub + $i) - (double) $cent[$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric distance computation: approximate inner product of a FULL
  * query vector against a PQ-encoded corpus vector — Σ_s dot(q_sub[s],
  * centroid[codes[s]]). The query side stays exact (that's the
  * "asymmetric" in ADC); only the corpus is quantized. */
case class PqAdc(query: Expression, codes: Expression,
                 codebook: Seq[Seq[Seq[Float]]])
  extends BinaryExpression {

  @transient private lazy val cb: Array[Array[Array[Float]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def left: Expression = query
  override def right: Expression = codes
  override def checkInputDataTypes(): TypeCheckResult =
    (query.dataType, codes.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_adc expects (array<float>, array<int>)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(q: Any, cAny: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val cd = cAny.asInstanceOf[ArrayData]
    val sub = cb(0)(0).length
    var s = 0
    var acc = 0.0d
    while (s < cb.length) {
      val cent = cb(s)(cd.getInt(s))
      var i = 0
      while (i < sub) { acc += qv.getFloat(s * sub + i).toDouble * cent(i).toDouble; i += 1 }
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, (q, cd) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val cent = ctx.freshName("cent")
      val sub = cb(0)(0).length
      s"""
         |double $acc = 0.0;
         |for (int $s = 0; $s < ${cb.length}; $s++) {
         |  float[] $cent = $cbRef[$s][$cd.getInt($s)];
         |  for (int $i = 0; $i < $sub; $i++) {
         |    $acc += (double) $q.getFloat($s * $sub + $i) * (double) $cent[$i];
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(query = newLeft, codes = newRight)
}

/** DataFrame-API entry points for the sketch aggregates. */
object Sketch {
  import org.apache.spark.sql.{Column, GraftBridge}

  def minhash(h: Column, nPerm: Int): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(h), nPerm).toAggregateExpression())

  def simhash(fh: Column): Column =
    GraftBridge.column(
      SimHashAgg(GraftBridge.expression(fh)).toAggregateExpression())

  def hyperplaneSigs(emb: Column, planes: Seq[Seq[Float]], k: Int): Column =
    GraftBridge.column(HyperplaneSigs(GraftBridge.expression(emb), planes, k))

  def ngramHashes(ws: Column, k: Int): Column =
    GraftBridge.column(NgramHashes(GraftBridge.expression(ws), k))

  def pqEncode(emb: Column, codebook: Seq[Seq[Seq[Float]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(emb), codebook))

  def pqAdc(query: Column, codes: Column, codebook: Seq[Seq[Seq[Float]]]): Column =
    GraftBridge.column(PqAdc(GraftBridge.expression(query),
      GraftBridge.expression(codes), codebook))
}
