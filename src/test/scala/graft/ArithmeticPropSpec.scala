package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PolyHash

/** Property-style checks of the two arithmetic cores the hash gates stand
  * on: the GF(2^61−1) field multiply (every minhash/simhash/bloom/HLL oracle
  * replays it) and the Morton bit-interleave behind z-order clustering.
  * Each property is verified against an independent reference
  * implementation (BigInt for the field; bit-by-bit for the curve), not
  * against the production code's own algebra. Sampling is exhaustive where
  * the domain allows (all 2^16 spread inputs) and fixed-seed random
  * elsewhere (deterministic 10k-draw sweep — reproducible failures). */
class ArithmeticPropSpec extends AnyFunSuite {

  private val M = PolyHash.M
  private def rng = new scala.util.Random(0x5eed5eedL)
  private def drawField(r: scala.util.Random): Long = {
    var v = r.nextLong() & ((1L << 61) - 1)
    if (v >= M) v -= M
    v
  }

  test("mulmod agrees with BigInt over the whole field (10k-draw sweep)") {
    val r = rng
    (1 to 10000).foreach { _ =>
      val a = drawField(r); val b = drawField(r)
      assert(PolyHash.mulmod(a, b) ==
        ((BigInt(a) * BigInt(b)) mod BigInt(M)).toLong, s"mulmod($a, $b)")
    }
  }

  test("mulmod edge cases: 0, 1, M−1 and near-overflow operands") {
    val edges = Seq(0L, 1L, 2L, M - 1, M - 2, (1L << 60) + 17, M / 2, M / 2 + 1)
    for (a <- edges; b <- edges)
      assert(PolyHash.mulmod(a, b) ==
        ((BigInt(a) * BigInt(b)) mod BigInt(M)).toLong, s"mulmod($a, $b)")
  }

  test("mulmod field laws: commutative, associative, distributive") {
    val r = rng
    (1 to 3000).foreach { _ =>
      val a = drawField(r); val b = drawField(r); val c = drawField(r)
      assert(PolyHash.mulmod(a, b) == PolyHash.mulmod(b, a))
      assert(PolyHash.mulmod(PolyHash.mulmod(a, b), c) ==
        PolyHash.mulmod(a, PolyHash.mulmod(b, c)))
      assert(PolyHash.mulmod(a, (b + c) % M) ==
        (PolyHash.mulmod(a, b) + PolyHash.mulmod(a, c)) % M)
    }
  }

  test("permutation family g_p(h) = a_p·h + b_p is injective per p") {
    // a_p ≠ 0 mod the PRIME M ⇒ multiplication by a_p is invertible; the
    // sampled check guards the implementation, the algebra guards the rest
    val r = rng
    for (p <- Seq(0, 1, 7, 63, 127)) {
      val a = PolyHash.permA(p); val b = PolyHash.permB(p)
      assert(a != 0L, s"a_$p = 0 — not a bijection")
      (1 to 2000).foreach { _ =>
        val h1 = drawField(r); val h2 = drawField(r)
        if (h1 != h2)
          assert(PolyHash.perm(h1, a, b) != PolyHash.perm(h2, a, b),
            s"p=$p collides: $h1, $h2")
      }
    }
  }

  // ---- Morton interleave (the z-order curve): reference = bit-by-bit ----

  private def spreadRef(x: Long): Long =
    (0 until 16).map(i => ((x >> i) & 1L) << (2 * i)).sum

  private def mortonRef(a: Long, b: Long): Long =
    spreadRef(a) | (spreadRef(b) << 1)

  /** The same shift-and-mask pipeline appendZOrdered builds as Columns. */
  private def spreadProd(x0: Long): Long = {
    val a = x0 & 0xFFFFL
    val b = (a | (a << 8)) & 0x00FF00FFL
    val c = (b | (b << 4)) & 0x0F0F0F0FL
    val d = (c | (c << 2)) & 0x33333333L
    (d | (d << 1)) & 0x55555555L
  }

  test("Morton spread matches the bit-by-bit reference on ALL 16-bit codes") {
    (0L to 65535L).foreach(x =>
      assert(spreadProd(x) == spreadRef(x), s"spread($x)"))
  }

  test("Morton key is a bijection and monotone along each axis") {
    val r = rng
    (1 to 10000).foreach { _ =>
      val a1 = r.nextInt(65536).toLong; val b1 = r.nextInt(65536).toLong
      val a2 = r.nextInt(65536).toLong; val b2 = r.nextInt(65536).toLong
      val z1 = spreadProd(a1) | (spreadProd(b1) << 1)
      assert(z1 == mortonRef(a1, b1))
      val z2 = spreadProd(a2) | (spreadProd(b2) << 1)
      if (z1 == z2) assert(a1 == a2 && b1 == b2, "key collision across coords")
      if (a1 < a2) // other axis held fixed ⇒ key strictly grows
        assert((spreadProd(a1) | (spreadProd(b1) << 1)) <
          (spreadProd(a2) | (spreadProd(b1) << 1)))
    }
  }

  test("Morton locality: 16×16-aligned blocks map to one 256-key range") {
    // the property pruneFilesBox's rectangles rest on
    val r = rng
    (1 to 3000).foreach { _ =>
      val bx = r.nextInt(4096).toLong; val by = r.nextInt(4096).toLong
      val base = mortonRef(bx << 4, by << 4)
      for (dx <- Seq(0L, 7L, 15L); dy <- Seq(0L, 7L, 15L)) {
        val z = mortonRef((bx << 4) + dx, (by << 4) + dy)
        assert(z >= base && z < base + 256,
          s"block ($bx,$by) offset ($dx,$dy): $z outside [$base, ${base + 256})")
      }
    }
  }
}
