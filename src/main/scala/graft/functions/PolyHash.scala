package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable polynomial hash family over GF(2^61 − 1) (round 6).
  *
  * Why it exists: the minhash/simhash dedup tiers hashed with Spark's
  * xxhash64 — statistically fine, but engine-PRIVATE: no other engine
  * reproduces the values, so those two ops were the last non-codec
  * rows-only entries on the correctness board. This family keeps the same
  * statistical properties (uniform 61-bit values, affine permutations) while
  * being nothing but modular arithmetic — DuckDB replays it exactly with
  * HUGEINT `%` and `list_reduce`, so MinHash signatures, LSH band buckets
  * and SimHash votes become deterministic functions of the DATA.
  *
  * The contract (mirrored verbatim by the SQL in Dedup.scala oracles):
  *  - M  = 2^61 − 1 (Mersenne; mulmod reduces by 61-bit folding)
  *  - string hash: h := 0; per Unicode CODEPOINT cp (decoded from UTF-8):
  *      h := (h·B + cp + 1) mod M,  B = 1000003
  *  - word-k-gram hash: the same fold over the words joined by single
  *    spaces (codepoint 32) — no string is ever materialized
  *  - permutation p: g_p(h) = (a_p·h + b_p) mod M with
  *      a_p = ((2p+1)·PHI) mod M,  b_p = ((p+1)·PSI) mod M
  *  - band signature over values v (band index b first):
  *      s := 0; s := (s·B2 + (b+1)) mod M; per v: s := (s·B2 + v + 1) mod M,
  *      B2 = 1000033
  *
  * All helpers are static and allocation-free; the expressions below call
  * them as single static calls inside whole-stage codegen (the NfcNormalize
  * pattern).
  */
object PolyHash {
  val M: Long = (1L << 61) - 1
  val B: Long = 1000003L
  val B2: Long = 1000033L
  val PHI: Long = 1737350767027740263L
  val PSI: Long = 930451384150289747L

  /** (a·b) mod M for 0 ≤ a,b < 2^61: 128-bit product via multiplyHigh,
    * Mersenne-folded (2^61 ≡ 1 mod M). */
  def mulmod(a: Long, b: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, b) // product < 2^122 ⇒ hi < 2^58
    val lo = a * b
    var s = (lo & M) + ((lo >>> 61) | (hi << 3)) // both terms ≤ M ⇒ s < 2^62
    s = (s & M) + (s >>> 61)
    if (s >= M) s - M else s
  }

  /** Fold one codepoint into the running hash. */
  private def step(h: Long, cp: Int): Long = {
    var s = mulmod(h, B) + cp + 1 // < M + 2^21
    if (s >= M) s -= M
    s
  }

  /** Fold every codepoint of `s` (decoded straight from the UTF-8 buffer —
    * no String allocation). */
  def foldString(h0: Long, s: UTF8String): Long = {
    var h = h0
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var k = 1
      while (k < len && i + k < n) { cp = (cp << 6) | (s.getByte(i + k) & 0x3F); k += 1 }
      h = step(h, cp)
      i += len
    }
    h
  }

  /** All word-k-gram hashes: out(i) = polyhash of "ws(i) ws(i+1) … ws(i+k−1)"
    * (single-space joined), matching a char fold over the joined string. */
  def ngramHashes(ws: ArrayData, k: Int): ArrayData = {
    val n = ws.numElements()
    val m = math.max(n - k + 1, 0)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) {
        if (j > 0) h = step(h, 32) // the joining space
        h = foldString(h, ws.getUTF8String(i + j))
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All w-codepoint window hashes of `s` — out(i) = fold of codepoints
    * [i, i+w) (seed 0, the foldString contract, no separators) — computed
    * with the TRUE rolling identity:
    *   h_{i+1} = (h_i − (cp_i+1)·B^{w−1})·B + (cp_{i+w}+1)  (mod M)
    * One O(n) pass regardless of w — the Rabin–Karp shape content-defined
    * chunking runs at 100 TB (per-window refold would be O(n·w)). */
  def rollHashes(s: UTF8String, w: Int): ArrayData = {
    // decode codepoints once (same UTF-8 walk as foldString)
    val nBytes = s.numBytes()
    val cps = new Array[Int](s.numChars())
    var nc = 0
    var i = 0
    while (i < nBytes) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var k = 1
      while (k < len && i + k < nBytes) { cp = (cp << 6) | (s.getByte(i + k) & 0x3F); k += 1 }
      cps(nc) = cp; nc += 1
      i += len
    }
    val m = math.max(nc - w + 1, 0)
    val out = new Array[Long](m)
    if (m > 0) {
      var bw1 = 1L // B^(w−1) mod M
      var t = 1
      while (t < w) { bw1 = mulmod(bw1, B); t += 1 }
      var h = 0L
      var j = 0
      while (j < w) { h = step(h, cps(j)); j += 1 }
      out(0) = h
      var p = 1
      while (p < m) {
        // remove cps(p−1), admit cps(p+w−1)
        var hs = h - mulmod(cps(p - 1) + 1L, bw1)
        if (hs < 0) hs += M
        h = step(hs, cps(p + w - 1))
        out(p) = h
        p += 1
      }
    }
    new GenericArrayData(out)
  }

  /** LSH band signatures over a minhash array: band b folds (b+1) then its
    * bandRows values (+1 each) with base B2. */
  def bandSigs(m: ArrayData, bandRows: Int): ArrayData = {
    val nBands = m.numElements() / bandRows
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var s = (b + 1).toLong // first fold step from s=0: 0·B2 + (b+1)
      var r = 0
      while (r < bandRows) {
        var t = mulmod(s, B2) + m.getLong(b * bandRows + r) + 1 // < 2^62
        t = (t & M) + (t >>> 61)
        if (t >= M) t -= M
        s = t
        r += 1
      }
      out(b) = s
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Per-row minhash over an ARRAY of element hashes — the STATELESS form
    * of [[PolyMinHashAgg]] (identical permutation arithmetic, min over the
    * array instead of over grouped rows). Exists for streaming: a per-doc
    * signature as a projection needs no shuffle, so a screening pipeline
    * can follow it with its one allowed streaming aggregation. Empty input
    * yields the agg's empty buffer (all Long.MaxValue) — callers decide
    * what a signature-less doc means. */
  def minhashArray(hs: ArrayData, pa: Array[Long], pb: Array[Long]): ArrayData = {
    val nPerm = pa.length
    val out = Array.fill(nPerm)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var p = 0
      while (p < nPerm) {
        val x = perm(h, pa(p), pb(p))
        if (x < out(p)) out(p) = x
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def permA(p: Int): Long = mulmod(2L * p + 1, PHI)
  def permB(p: Int): Long = mulmod(p + 1L, PSI)

  /** g(h) = (a·h + b) mod M. */
  def perm(h: Long, a: Long, b: Long): Long = {
    var s = mulmod(a, h) + b // < 2M < 2^62
    s = (s & M) + (s >>> 61)
    if (s >= M) s - M else s
  }

  /** Scalar polynomial hash of one string (seed 0 — the foldString
    * contract verbatim, the value Dedup.polySql replays in DuckDB). The
    * key-normalization step string-keyed bloom indexes hash through before
    * [[bloomBits]]. */
  def stringHash(s: UTF8String): Long = foldString(0L, s)

  /** Driver-side twin of [[stringHash]] for planning-time probes. */
  def stringHashOf(s: String): Long = stringHash(UTF8String.fromString(s))

  /** The k bloom-filter bit positions of a BIGINT key: permutations
    * 128..128+k−1 of the family (disjoint from the minhash range), each
    * reduced mod mBits. Portable: a SQL engine reproduces the positions
    * with the same HUGEINT arithmetic. */
  def bloomBits(v: Long, mBits: Int, k: Int): ArrayData = {
    val x = ((v % M) + M) % M
    val out = new Array[Int](k)
    var i = 0
    while (i < k) {
      out(i) = (perm(x, permA(128 + i), permB(128 + i)) % mBits).toInt
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** MinHash signature under the portable affine permutation family —
  * the engine-portable sibling of [[MinHashAgg]]: same one-column
  * primitive-buffer TypedImperativeAggregate (map-side combine, ≤1 KB
  * buffer per group across the exchange), g_p instead of XXH64. */
case class PolyMinHashAgg(
    child: Expression,
    nPerm: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends LongArraySketchAgg {

  @transient private lazy val pa: Array[Long] = Array.tabulate(nPerm)(PolyHash.permA)
  @transient private lazy val pb: Array[Long] = Array.tabulate(nPerm)(PolyHash.permB)

  override protected def bufferLen: Int = nPerm
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_minhash expects a BIGINT element hash, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nPerm)(Long.MaxValue)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var p = 0
      while (p < nPerm) {
        val x = PolyHash.perm(h, pa(p), pb(p))
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

  override def withNewMutableAggBufferOffset(o: Int): PolyMinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PolyMinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PolyMinHashAgg =
    copy(child = newChildren.head)
}

/** Bloom-filter bit positions of a BIGINT key — one codegen call. */
case class BloomBits(child: Expression, mBits: Int, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if mBits >= 2 && k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"bloom_bits expects (bigint, mBits >= 2, k >= 1), got ${child.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bloom_bits"

  override protected def nullSafeEval(a: Any): Any =
    PolyHash.bloomBits(a.asInstanceOf[Long], mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash$$.MODULE$$.bloomBits($c, $mBits, $k)")

  override protected def withNewChildInternal(newChild: Expression): BloomBits =
    copy(child = newChild)
}

/** Column-API entry points for the portable poly-hash family. */
object Poly {
  import org.apache.spark.sql.{Column, GraftBridge}

  def ngramHashes(ws: Column, k: Int): Column =
    GraftBridge.column(PolyNgramHashes(GraftBridge.expression(ws), k))

  def rollHashes(s: Column, w: Int): Column =
    GraftBridge.column(PolyRollHashes(GraftBridge.expression(s), w))

  def bloomBits(v: Column, mBits: Int, k: Int): Column =
    GraftBridge.column(BloomBits(GraftBridge.expression(v), mBits, k))

  def stringHash(s: Column): Column =
    GraftBridge.column(PolyStringHash(GraftBridge.expression(s)))

  def bandSigs(m: Column, bandRows: Int): Column =
    GraftBridge.column(PolyBandSigs(GraftBridge.expression(m), bandRows))

  def minhash(h: Column, nPerm: Int): Column =
    GraftBridge.column(
      PolyMinHashAgg(GraftBridge.expression(h), nPerm).toAggregateExpression())

  def minhashArray(hs: Column, nPerm: Int): Column =
    GraftBridge.column(PolyMinHashArray(GraftBridge.expression(hs), nPerm))
}

/** Stateless per-row minhash over an array of element hashes — the
  * projection form of [[PolyMinHashAgg]] (see PolyHash.minhashArray). */
case class PolyMinHashArray(child: Expression, nPerm: Int) extends UnaryExpression {

  @transient private lazy val pa: Array[Long] = Array.tabulate(nPerm)(PolyHash.permA)
  @transient private lazy val pb: Array[Long] = Array.tabulate(nPerm)(PolyHash.permB)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if nPerm >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"poly_minhash_array expects (array<bigint>, nPerm >= 1), got ${child.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_minhash_array"

  override protected def nullSafeEval(a: Any): Any =
    PolyHash.minhashArray(a.asInstanceOf[ArrayData], pa, pb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val paRef = ctx.addReferenceObj("pa", pa, "long[]")
    val pbRef = ctx.addReferenceObj("pb", pb, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash$$.MODULE$$.minhashArray($c, $paRef, $pbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyMinHashArray =
    copy(child = newChild)
}

/** Scalar string polyhash — one codegen call (the bloom-index key
  * normalization for string columns; DuckDB replays it via the same
  * HUGEINT fold Dedup.polySql emits). */
case class PolyStringHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"poly_string_hash expects a string, got ${child.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_string_hash"

  override protected def nullSafeEval(a: Any): Any =
    PolyHash.stringHash(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash$$.MODULE$$.stringHash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyStringHash =
    copy(child = newChild)
}

/** Word-k-gram polynomial hashes — the engine-portable sibling of
  * [[NgramHashes]] (same window structure, poly fold instead of XXH64). */
case class PolyNgramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"poly_ngram_hashes expects (array<string>, k >= 1), got ${child.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_ngram_hashes"

  override protected def nullSafeEval(a: Any): Any =
    PolyHash.ngramHashes(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash$$.MODULE$$.ngramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): PolyNgramHashes =
    copy(child = newChild)
}

/** Rolling w-codepoint window hashes — one O(n) codegen call per string
  * (Rabin–Karp identity; the content-defined-chunking boundary detector). */
case class PolyRollHashes(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"poly_roll_hashes expects (string, w >= 1), got ${child.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_roll_hashes"

  override protected def nullSafeEval(a: Any): Any =
    PolyHash.rollHashes(a.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash$$.MODULE$$.rollHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): PolyRollHashes =
    copy(child = newChild)
}

/** LSH band signatures from a minhash array — one codegen loop. */
case class PolyBandSigs(child: Expression, bandRows: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bandRows >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"poly_band_sigs expects (array<bigint>, bandRows >= 1), got ${child.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_band_sigs"

  override protected def nullSafeEval(a: Any): Any =
    PolyHash.bandSigs(a.asInstanceOf[ArrayData], bandRows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash$$.MODULE$$.bandSigs($c, $bandRows)")

  override protected def withNewChildInternal(newChild: Expression): PolyBandSigs =
    copy(child = newChild)
}
