package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{LayoutOps, SketchOps}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Property-style contracts for the pure kernels the engine leans on —
 * seeded random sampling (deterministic across runs) explores the input
 * space the example specs cannot enumerate.
 */
class PropertySpec extends AnyFunSuite {

  private def rng = new scala.util.Random(20260814L)
  private val Trials = 500

  test("zorder2 round-trips: deinterleaving recovers both coordinates") {
    def unspread(z0: Long): Long = {
      var x = z0 & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
      x
    }
    val r = rng
    for (_ <- 1 to Trials) {
      val a = r.nextLong() & 0x7FFFFFFFL
      val b = r.nextLong() & 0x7FFFFFFFL
      val z = LayoutOps.zorder2(a, b)
      assert(unspread(z) == a && unspread(z >> 1) == b, s"($a, $b)")
    }
  }

  test("BPE: encode∘decode is the identity and training is order-insensitive over random corpora") {
    import graft.plans.BpeOps
    val r = rng
    def randWord(len: Int): String =
      (1 to len).map(_ => ('a' + r.nextInt(6)).toChar).mkString // small alphabet → real merges
    for (_ <- 1 to 50) {
      val vocab = (1 to 30).map(_ => randWord(1 + r.nextInt(10)) -> (1L + r.nextInt(20)))
        .groupBy(_._1).map { case (w, fs) => w -> fs.map(_._2).sum }.toSeq
      val merges = BpeOps.train(vocab, numMerges = 25)
      val ranks = BpeOps.rankMap(merges)
      val mArr = merges.toIndexedSeq
      // identity: concatenating the subwords reconstructs every word —
      // including words NOT in the training vocabulary
      val probes = vocab.map(_._1) ++ (1 to 20).map(_ => randWord(1 + r.nextInt(12)))
      probes.foreach { w =>
        val toks = BpeOps.encodeWord(w, mArr, ranks)
        assert(toks.mkString == w, s"decode broke for '$w': $toks")
        assert(toks.forall(_.nonEmpty))
      }
      // training is a pure function of the vocabulary SET (input order free)
      assert(BpeOps.train(scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(vocab), 25) == merges)
    }
  }

  test("zorder2 orders quadrants: strictly higher in both dims -> strictly larger code") {
    val r = rng
    for (_ <- 1 to Trials) {
      val a1 = r.nextLong() & 0x3FFFFFFFL
      val b1 = r.nextLong() & 0x3FFFFFFFL
      val a2 = a1 + 1 + (r.nextInt(1000))
      val b2 = b1 + 1 + (r.nextInt(1000))
      assert(LayoutOps.zorder2(a1, b1) < LayoutOps.zorder2(a2, b2), s"($a1,$b1) vs ($a2,$b2)")
    }
  }

  test("wordNgrams emits exactly tokens-n+1 grams, each of n tokens, in order") {
    val words = Array("alpha", "Beta", "g7", "x", "Ωmega")
    val r = rng
    for (_ <- 1 to Trials) {
      val t = Seq.fill(r.nextInt(12))(words(r.nextInt(words.length))).mkString(" ")
      val n = 1 + r.nextInt(4)
      val grams = SketchOps.wordNgrams(UTF8String.fromString(t), n)
      val toks = t.toLowerCase.trim.split("\\s+", -1)
      if (toks.length < n) assert(grams.numElements() == 0, s"'$t' n=$n")
      else {
        assert(grams.numElements() == toks.length - n + 1, s"'$t' n=$n")
        for (i <- 0 until grams.numElements())
          assert(grams.getUTF8String(i).toString == toks.slice(i, i + n).mkString(" "))
      }
    }
  }

  test("minhash lanes are monotone under sub-multiset sampling") {
    // removing grams can only move each min-lane UP (min over fewer values)
    val r = rng
    def sig(xs: Seq[String]): Seq[Long] = {
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        xs.map(UTF8String.fromString).toArray[Any])
      val s = SketchOps.minhashSig(arr, 16)
      (0 until 16).map(s.getLong)
    }
    for (_ <- 1 to 200) {
      val gs = Seq.fill(1 + r.nextInt(40))(r.alphanumeric.take(1 + r.nextInt(8)).mkString)
      val full = sig(gs)
      val half = sig(gs.take(math.max(1, gs.length / 2)))
      assert(full.zip(half).forall { case (f, h) => f <= h })
    }
  }

  private def md5hex(x: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  test("bottom-k md5 hex digests sort identically as strings and as 128-bit values") {
    // the UDAF's TreeSet[String] order must equal numeric digest order, or
    // the sketch would not be the k MINIMUM values
    val r = rng
    for (_ <- 1 to 200) {
      val digests = Seq.fill(20)(md5hex(r.nextString(6)))
      val asStrings = digests.sorted
      val asNumbers = digests.sortBy(d => BigInt(d, 16))
      assert(asStrings == asNumbers)
    }
  }
}
