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

  property("WhereDialect.toSparkSql is idempotent (translated output re-translates to itself)") =
    forAll(Gen.oneOf(
      Gen.const("[a_field] > 5 AND \"Other\" = 'x [y]'"),
      Gen.const("[d] >= #3/15/1995# OR tag LIKE '%#x%'"),
      Gen.const("plain > 1 AND s = 'it''s'"),
      genText.map(t => s"name = '${t.replace("'", "''")}'"))) { w =>
      val once = graft.operators.WhereDialect.toSparkSql(w)
      graft.operators.WhereDialect.toSparkSql(once) == once
    }

  property("TopKHeap keeps exactly the k best by (score desc, id asc) — matches full sort") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0L, 50L))),
           Gen.choose(1, 8)) { (xs0, k) =>
      val xs = xs0.distinctBy(_._2) // unique ids like real corpus rows
      val h = new graft.functions.TopKHeap(k)
      xs.foreach { case (s, i) => h.insert(s, i) }
      val got = h.q.toArray.sorted(graft.functions.TopKHeap.ByQuality).toSeq
      val want = xs.sorted(graft.functions.TopKHeap.ByQuality).take(k)
      got == want
    }

  // SIMPLE (non-self-intersecting) rings: random points ordered by angle
  // around their centroid → star-shaped polygon. Area laws below require
  // simplicity — on a self-intersecting ring |signed area| is not monotone
  // under clipping (removing a negative lobe grows the abs), which this
  // property suite itself demonstrated on the naive generator.
  private val genRing: Gen[IndexedSeq[(Double, Double)]] = for {
    n <- Gen.choose(3, 9)
    pts <- Gen.listOfN(n, Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(-100.0, 100.0)))
  } yield {
    val cx = pts.map(_._1).sum / pts.length
    val cy = pts.map(_._2).sum / pts.length
    pts.distinct.sortBy { case (x, y) => math.atan2(y - cy, x - cx) }.toIndexedSeq
  }

  property("clipRect never grows area; clipping to the extent is identity-area") =
    forAll(genRing) { ring =>
      val poly = graft.operators.RingSplit.Poly(IndexedSeq(ring))
      val (x0, y0, x1, y1) = poly.extent
      val clippedToSelf = poly
        .clipHalfPlane(vertical = true, x1, keepBelow = true)
        .clipHalfPlane(vertical = true, x0, keepBelow = false)
        .clipHalfPlane(vertical = false, y1, keepBelow = true)
        .clipHalfPlane(vertical = false, y0, keepBelow = false)
      val shrunk = poly.clipHalfPlane(vertical = true, (x0 + x1) / 2, keepBelow = true)
      math.abs(clippedToSelf.area - poly.area) <= 1e-9 * math.max(poly.area, 1.0) &&
        shrunk.area <= poly.area + 1e-9
    }

  // ---- PQ kernels (pure-JVM faces of PqEncode / LutSum) -------------------
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import graft.functions.VectorExprs

  // Integer-valued coordinates in a small range force frequent exact ties,
  // exercising the first-min law (not just the generic argmin).
  private val genPqCase: Gen[(Int, Int, Array[Double], Array[Array[Double]])] = for {
    m <- Gen.choose(1, 4)
    d <- Gen.choose(1, 5)
    k <- Gen.choose(1, 6)
    vec <- Gen.listOfN(m * d, Gen.choose(-3, 3).map(_.toDouble))
    cbs <- Gen.listOfN(k, Gen.listOfN(m * d, Gen.choose(-3, 3).map(_.toDouble)))
  } yield (m, d, vec.toArray, cbs.map(_.toArray).toArray)

  property("pqEncodeOf = first-min L2 argmin per subspace (tie-heavy cases)") =
    forAll(genPqCase) { case (m, d, vec, cbs) =>
      val out = VectorExprs.pqEncodeOf(
        new GenericArrayData(vec),
        new GenericArrayData(cbs.map(c => new GenericArrayData(c): Any)),
        m, false, false).asInstanceOf[GenericArrayData]
      val codes = (0 until m).map(out.getInt)
      val ref = (0 until m).map { mi =>
        val dists = cbs.map { c =>
          (mi * d until (mi + 1) * d).foldLeft(0.0) { (acc, i) =>
            val df = c(i) - vec(i); acc + df * df
          }
        }
        dists.indexOf(dists.min) // first index of the minimum
      }
      codes == ref
    }

  property("lutSumOf = left fold of lut[m][codes[m]] (bit-exact)") =
    forAll(Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.choose(1, 5)
      vals <- Gen.listOfN(k, Gen.choose(-800, 800).map(_ / 8.0))
      c <- Gen.choose(0, k - 1)
    } yield (vals.toArray, c)))) { cells =>
      val codes = cells.map(_._2).toArray
      val lut = cells.map(_._1).toArray
      val out = VectorExprs.lutSumOf(
        new GenericArrayData(codes),
        new GenericArrayData(lut.map(l => new GenericArrayData(l): Any)))
      val ref = codes.indices.foldLeft(0.0)((acc, m) => acc + lut(m)(codes(m)))
      java.lang.Double.doubleToRawLongBits(out.asInstanceOf[Double]) ==
        java.lang.Double.doubleToRawLongBits(ref)
    }

  // ---- BPE kernel ≡ literal replace chain ---------------------------------
  // Independent reference implementations (the wrapped-symbol replace chain
  // and a from-the-spec trainer), so the law is checked against text-level
  // string semantics, not against the kernel's own code paths.
  private val BpeS = ""
  private def chainSegment(word: String, merges: Seq[(String, String)]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var s = word.toCharArray.map(c => BpeS + c + BpeS).mkString
    merges.foreach { case (l, r) =>
      s = s.replace(BpeS + l + BpeS + BpeS + r + BpeS, BpeS + l + r + BpeS)
    }
    s.stripPrefix(BpeS).stripSuffix(BpeS).split(BpeS + BpeS, -1).toSeq
  }
  private def trainRef(corpus: Seq[String], k: Int): Seq[(String, String)] = {
    var types = corpus.filter(_.nonEmpty).groupBy(identity)
      .map { case (w, ws) => (w.toCharArray.map(_.toString).toSeq, ws.length.toLong) }
      .toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      types.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties → LEXICOGRAPHICALLY SMALLEST (l, r) — the
        // bpeTopMerges ORDER BY cnt DESC, l, r contract
        val cMax = counts.values.max
        val (l, r) = counts.filter(_._2 == cMax).keys.minBy(identity)
        out += ((l, r))
        types = types.map { case (syms, f) =>
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.toSeq, f)
        }
        rank += 1
      }
    }
    out.toSeq
  }
  private val genBpeWord: Gen[String] = Gen.choose(0, 7)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val genBpeCorpus: Gen[Seq[String]] =
    Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, genBpeWord))

  property("BpeKernel.segmentWord ≡ literal replace chain for ANY trained merge list (incl. unseen words)") =
    forAll(genBpeCorpus, Gen.choose(0, 12), genBpeCorpus) { (corpus, k, probes) =>
      val merges = trainRef(corpus, k)
      val m = graft.functions.BpeKernel.mergeRanks(merges)
      (corpus ++ probes).filter(_.nonEmpty).forall { w =>
        graft.functions.BpeKernel.segmentWord(w, m).toSeq == chainSegment(w, merges)
      }
    }

  private val genPayload: Gen[Array[Byte]] =
    Gen.choose(1, 400).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 180)).map(_.map(_.toByte).toArray))

  property("dHash64: brightness-shift invariant; pure function; halves non-negative") =
    forAll(genPayload, Gen.choose(1, 70)) { (bytes, shift) =>
      val h = graft.operators.MediaCodec.dHash64(bytes, bytes.length)
      val hs = graft.operators.MediaCodec.dHash64(
        bytes.map(b => (b + shift).toByte), bytes.length)
      val h2 = graft.operators.MediaCodec.dHash64(bytes, bytes.length)
      h.getLong(0) >= 0 && h.getLong(1) >= 0 &&
        hs.getLong(0) == h.getLong(0) && hs.getLong(1) == h.getLong(1) &&
        h2.getLong(0) == h.getLong(0) && h2.getLong(1) == h.getLong(1)
    }

  property("videoShots invariants: 1 <= n_shots <= F, longest in [ceil(F/n_shots), F], keyframe < F") =
    forAll(genPayload, Gen.choose(1, 20), Gen.choose(0, 30)) { (bytes, f, thresh) =>
      val png = graft.operators.MediaCodec.encodePng(bytes)
      val r = graft.operators.MediaCodec.videoShots(png, bytes.length, f, thresh)
      val (nf, ns, longest, kf) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      nf == f.toLong && ns >= 1 && ns <= nf &&
        longest >= (nf + ns - 1) / ns && longest <= nf - (ns - 1) &&
        kf >= 0 && kf < nf &&
        // thresh 0, >1 frame, no EMPTY frames (f <= n — empty frames never
        // fire a boundary, merging runs): every gap is a boundary
        (thresh > 0 || f == 1 || f > bytes.length || ns == nf)
    }

  property("BpeKernel.encodeDoc = space-joined per-word segmentations of [a-z]+ runs") =
    forAll(genBpeCorpus, Gen.choose(0, 6)) { (corpus, k) =>
      val merges = trainRef(corpus, k)
      val m = graft.functions.BpeKernel.mergeRanks(merges)
      val doc = corpus.mkString(", ").toUpperCase + " 42!"
      val got = graft.functions.BpeKernel
        .encodeDoc(UTF8String.fromString(doc), m).toString
      val want = corpus.filter(_.nonEmpty)
        .flatMap(w => chainSegment(w, merges)).mkString(" ")
      got == want
    }
}
