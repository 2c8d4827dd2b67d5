package graft

import graft.scale.{Packing, TextOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks over generated documents for the fused text kernels and
  * chunking — corpus-based cross-checks (ScaleOpsSpec) cover realistic
  * text; these cover the degenerate shapes a fixture never produces
  * (empty strings, single tokens, heavy repetition, token counts landing
  * exactly on window/stride boundaries). Deterministic: fixed ScalaCheck
  * seeds, no runtime randomness.
  */
class KernelPropertySpec extends SparkSpec {

  import spark.implicits._

  /** Random space-joined token strings over a tiny alphabet — repetition
    * and shared runs are likely by construction.
    */
  private def randomDocs(n: Int, seedBase: Long): Seq[String] = {
    val tok = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "f", "gg2", "h-h")
    val doc = Gen.chooseNum(0, 24).flatMap(len => Gen.listOfN(len, tok))
    (0 until n).map { i =>
      doc.apply(Gen.Parameters.default, Seed(seedBase + i))
        .getOrElse(List("x")).mkString(" ")
    }
  }

  test("winnow kernel == HOF composition on degenerate and repetitive docs") {
    graft.functions.Hashing.register(spark)
    val docs = (randomDocs(150, 7000L) ++ Seq("", "one", "a a a a a a a a"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val d = docs.toDF("doc_id", "text")
    val diff = d.select(
        TextOps.winnowFingerprints(col("text")).as("native"),
        TextOps.winnowFingerprintsHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("winnow guarantee: docs sharing a >= w+k-1-token run share a fingerprint") {
    graft.functions.Hashing.register(spark)
    // shared run of exactly w+k-1 = 6 tokens embedded in different hosts
    val run = "r1 r2 r3 r4 r5 r6"
    val pairs = randomDocs(40, 8000L).grouped(2).collect {
      case Seq(a, b) => (s"$a $run", s"$run $b")
    }.toSeq.zipWithIndex
    val d = pairs.flatMap { case ((x, y), i) =>
      Seq((i.toLong * 2, x), (i.toLong * 2 + 1, y))
    }.toDF("doc_id", "text")
    val fps = d.select(col("doc_id"),
      TextOps.winnowFingerprints(col("text")).as("fps"))
    val joined = fps.as("l").join(fps.as("r"),
        (col("l.doc_id") / 2).cast("long") === (col("r.doc_id") / 2).cast("long") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(size(array_intersect(col("l.fps"), col("r.fps"))).as("shared"))
      .collect()
    assert(joined.length == pairs.length)
    joined.foreach(r => assert(r.getInt(0) >= 1,
      "a pair sharing a full window-length run produced no common fingerprint"))
  }

  test("chunking covers every token; neighbors overlap by maxT - stride") {
    val (maxT, stride) = (7, 3)
    val docs = (randomDocs(120, 9000L) :+ "single")
      .filter(_.nonEmpty).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val d = docs.toDF("doc_id", "text")
    val chunks = Packing.chunkByTokens(d, "doc_id", maxT, stride)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val cs = chunks(id).sortBy(_._2)
      // indices are dense from 0
      assert(cs.map(_._2).toSeq == cs.indices.toSeq)
      // full reconstruction: stride-disjoint prefixes concatenate to the doc
      val rebuilt = cs.map { case (_, idx, _, txt) =>
        val take = if (idx == cs.length - 1) txt.split(" ", -1).length
                   else stride
        txt.split(" ", -1).take(take)
      }.flatten
      assert(rebuilt.sameElements(toks), s"doc $id not covered: $text")
      // every chunk except the last is full-width
      cs.dropRight(1).foreach { case (_, _, n, _) => assert(n == maxT) }
    }
  }

  test("tri-products kernel == HOF composition, bitwise, incl. degenerate arrays") {
    graft.functions.Hashing.register(spark)
    val fixture = graft.sources.Tables.embeddings(spark, sf())
      .select(col("embedding"))
    // degenerate shapes the fixture never produces
    val edge = Seq(
      Array.empty[Float], Array(0.0f), Array(-1.5f, 2.25f),
      Array.fill(7)(0.9999999f), Array(1e-7f, -1e-7f, 0.5f))
      .map(Tuple1(_)).toDF("embedding")
    val quant =
      "transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000D) AS BIGINT))"
    val hof =
      s"""flatten(transform($quant, (vi, i) ->
         |  transform(slice($quant, i + 1, size(embedding) - i), (vj, jo) -> vi * vj)))"""
        .stripMargin
    Seq(fixture, edge).foreach { d =>
      val diff = d.select(expr("graft_tri_products(embedding)").as("k"),
          expr(hof).as("h"))
        .filter(not(col("k") <=> col("h"))).count()
      assert(diff == 0, "kernel and HOF tri-products must agree bitwise")
    }
  }

  test("window-keys kernel == composed substr+polyHash double hash") {
    graft.functions.Hashing.register(spark)
    val w = 7
    val stride = 3
    val docs = (randomDocs(150, 9000L) ++
        Seq("", "abc", "a" * 6, "b" * 7, "c" * 8, "d" * 29))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val d = docs.toDF("doc_id", "text")
    val kernel = d.filter(length(col("text")) >= w)
      .select(col("doc_id"),
        posexplode(call_function("graft_window_keys",
          col("text"), lit(w), lit(stride))))
      .select(col("doc_id"), (col("pos") * stride).cast("long").as("st"),
        col("col").as("k"))
    val composed = d.filter(length(col("text")) >= w)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L),
          length(col("text")).cast("long") - w, lit(stride.toLong))).as("st"))
      .select(col("doc_id"), col("st"),
        (graft.scale.TextOps.polyHash(expr(s"substr(text, st + 1, $w)"),
            graft.functions.TextKernels.P) * 2147483648L
          + graft.scale.TextOps.polyHash(expr(s"substr(text, st + 1, $w)"),
            graft.functions.TextKernels.P2)).as("k"))
    val diff = kernel.as("a").join(composed.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.st") === col("b.st"),
        "full_outer")
      .filter(not(col("a.k") <=> col("b.k"))).count()
    assert(diff == 0, "rolling-hash window keys must equal the composed form")
  }

  test("bigram-codes kernel == independent code-point reference incl. surrogate pairs") {
    graft.functions.Hashing.register(spark)
    val hostile = Seq("", "x", "ab", "aaa", "héllo wörld", "naïve café",
      "日本語テキスト", "étude", // combining accent: two code points
      "emoji 😀 pair 🍕 end", // surrogate pairs
      "mixed ascii και ελληνικά and 😀")
    val texts = randomDocs(100, 9000L) ++ hostile
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // independent reference: JDK code-point stream, written nothing like
    // the kernel's manual charCount walk
    def ref(s: String): Seq[Long] = {
      val cps = s.codePoints().toArray.toSeq
      cps.zip(cps.drop(1)).map { case (a, b) => a.toLong * 0x110000L + b }
    }
    val got = d.select(col("doc_id"), expr("graft_bigram_codes(text)").as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t),
        s"doc $i ('${t.take(20)}...'): kernel ${got(i.toLong).take(5)} != ref ${ref(t).take(5)}")
    }
  }
}
