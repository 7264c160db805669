package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{Fns, TextHashing}
import graft.operators.{GeomCodec, Tessellation}
import graft.operators.Tessellation.Rect

/** Property-based laws (SURVEY §5) — pure-JVM kernels, no SparkSession, so
  * thousands of cases run in milliseconds. ScalaCheck is discovered by sbt
  * as its own test framework alongside ScalaTest. */
object GraftProps extends Properties("graft") {

  private val genWord: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val genText: Gen[String] = Gen.choose(0, 40)
    .flatMap(n => Gen.listOfN(n, genWord).map(_.mkString(" ")))

  property("shingleHashes: count = max(words - w + 1, 1); all in [0, P)") =
    forAll(genText, Gen.choose(1, 6)) { (text, w) =>
      val hs = TextHashing.shingleHashesP(UTF8String.fromString(text), w)
      val nWords = text.trim.split("\\s+", -1).length
      hs.length == math.max(nWords - (w - 1), 1) &&
        hs.forall(h => h >= 0 && h < Fns.P)
    }

  property("minhashSig = per-term min over shingle hashes (declarative law)") =
    forAll(genText, Gen.choose(1, 4), Gen.choose(1, 8)) { (text, w, k) =>
      val u = UTF8String.fromString(text)
      val sig = TextHashing.minhashSig(u, w, k)
      val hs = TextHashing.shingleHashesP(u, w)
      (1 to k).forall { i =>
        sig(i - 1) == hs.map(h => (h * Fns.hashA(i) + Fns.hashB(i)) % Fns.P).min
      }
    }

  property("simhash16 is invariant under shingle permutation (vote commutativity)") =
    forAll(genText, Gen.choose(1, 4)) { (text, w) =>
      val u = UTF8String.fromString(text)
      val words = text.trim.split("\\s+", -1)
      val reversedDoc = words.reverse.mkString(" ")
      val a = TextHashing.simhash16(u, w)
      // reversing the document reverses shingle ORDER for w=1 (same multiset)
      if (w == 1)
        a == TextHashing.simhash16(UTF8String.fromString(reversedDoc), 1)
      else (a & ~0xffffL) == 0 // 16-bit range always
    }

  property("hash60 matches the 15-hex-chars-of-md5 definition") =
    forAll(genText) { text =>
      TextHashing.hash60(text) == Fns.hash60Local(text)
    }

  private val genRect: Gen[Rect] = for {
    x0 <- Gen.choose(-1000.0, 1000.0); y0 <- Gen.choose(-1000.0, 1000.0)
    w <- Gen.choose(1.0, 500.0); h <- Gen.choose(1.0, 500.0)
  } yield Rect(x0, y0, x0 + w, y0 + h)

  property("tessellation: conservation, part count, seq completeness") =
    forAll(genRect, Gen.choose(1, 12), Gen.choose(0L, Long.MaxValue)) { (r, parts, seed) =>
      val maxAcres = r.area / (parts + 0.5)
      val out = Tessellation.tessellate(r, r.area, maxAcres, seed)
      val expected = math.max(math.floor(r.area / maxAcres).toLong, 1L)
      val seqOk = out.map(_._2) == (1L to expected)
      val consOk = !out.forall(_._1.isDefined) ||
        math.abs(out.flatMap(_._1).map(_.area).sum - r.area) / r.area < 1e-6
      Prop(out.length == expected && seqOk && consOk)
    }

  property("WKB point round-trips any finite coordinates") =
    forAll(Gen.choose(-1e12, 1e12), Gen.choose(-1e12, 1e12)) { (x, y) =>
      val wkb = GeomCodec.pointWkbBytes(x, y)
      GeomCodec.wkbPointXOf(wkb) == x && GeomCodec.wkbPointYOf(wkb) == y
    }
}
