package graft

import graft.scale.Bpe

/** Pins the greedy merge semantics the oracle replays: pair-count argmax
  * with the (count desc, pair asc) tie-break, and the gaps-and-islands
  * LEFT-TO-RIGHT non-overlapping application — "a a a a" under merge
  * (a,a) must become "a a" "a a", never the overlapped three merges.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("self-pair runs merge greedily left-to-right without overlap") {
    // doc 1: "a a a a b" -> best pair (a,a) count 3; greedy keeps pos 1
    // and 3: "(a a) (a a) b"
    val docs = Seq((1L, "a a a a b")).toDF("doc_id", "text")
    val toks = Bpe.tokensAfterMerges(docs, "doc_id", "text", rounds = 1)
      .orderBy("pos").select("tok").as[String].collect().toSeq
    assert(toks == Seq("a a", "a a", "b"))
  }

  test("odd-length run leaves the trailing singleton unmerged") {
    val docs = Seq((1L, "x a a a y")).toDF("doc_id", "text")
    val toks = Bpe.tokensAfterMerges(docs, "doc_id", "text", rounds = 1)
      .orderBy("pos").select("tok").as[String].collect().toSeq
    assert(toks == Seq("x", "a a", "a", "y"))
  }

  test("argmax tie-break is (count desc, pair asc)") {
    // (b,c) and (a,b) both occur twice; (a,b) wins the ascending tie-break
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, "doc_id", "text", rounds = 1)
      .collect().head
    assert(m.getAs[String]("pair_a") == "a")
    assert(m.getAs[String]("pair_b") == "b")
    assert(m.getAs[Long]("n_occ") == 2L)
  }

  test("round 2 can merge a merged symbol with its neighbour") {
    // round 1 merges (a,b) [tie-break among count-2 pairs]; round 2 then
    // sees ("a b", c) twice and merges it — vocabulary growth across
    // rounds, the property that makes BPE BPE
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "doc_id", "text", rounds = 2)
      .orderBy("round").collect()
    assert(merges(1).getAs[String]("pair_a") == "a b")
    assert(merges(1).getAs[String]("pair_b") == "c")
    val toks = Bpe.tokensAfterMerges(docs, "doc_id", "text", rounds = 2)
      .filter($"doc_id" === 1L).orderBy("pos")
      .select("tok").as[String].collect().toSeq
    assert(toks == Seq("a b c", "d"))
  }

  test("corpusAfterMerges reports the compression curve") {
    val docs = Seq((1L, "a a a a"), (2L, "a a b")).toDF("doc_id", "text")
    val out = Bpe.corpusAfterMerges(docs, "doc_id", "text", rounds = 1)
      .orderBy("doc_id").collect()
    // merge (a,a): doc1 -> ["a a","a a"] (2), doc2 -> ["a a","b"] (2)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 2L)))
    assert(out.head.getAs[Long]("vocab_size") == 2L) // {"a a", "b"}
    assert(out.head.getAs[Long]("total_tokens") == 4L)
  }

  test("encodeCorpus applies sample-trained merges to every doc") {
    // sampleOneIn=2 trains on docs 2 and 4 only -> merge (b,b); the encode
    // pass then applies it corpus-wide, including doc 1 and 3 (unsampled)
    val docs = Seq((1L, "b b x"), (2L, "b b"), (3L, "c c"), (4L, "b b"))
      .toDF("doc_id", "text")
    val out = Bpe.encodeCorpus(docs, "doc_id", "text", rounds = 1,
        sampleOneIn = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 1L), // "b b" "x"
          (2L, 1L, 1L), (3L, 2L, 0L), (4L, 1L, 1L)))
  }

  test("sample gate bounds the training corpus") {
    val docs = Seq((1L, "a a"), (2L, "b b"), (3L, "c c"), (4L, "b b"))
      .toDF("doc_id", "text")
    // sampleOneIn=2 keeps doc_id 2 and 4 only -> best pair is (b,b)
    val m = Bpe.trainMerges(docs, "doc_id", "text", rounds = 1,
      sampleOneIn = 2).collect().head
    assert(m.getAs[String]("pair_a") == "b")
    assert(m.getAs[Long]("n_occ") == 2L)
  }
}
