package graft

import graft.scale.FuzzyMatch
import scala.util.Random

/** The deletion-neighborhood guarantee, exercised as a property: for ANY
  * single-edit pair (insert, delete, or substitute at any position) the
  * blocking join finds the pair — no 1-edit match can be lost, which is
  * the claim that lets the verify step run only on block collisions.
  */
class FuzzyMatchSpec extends SparkSpec {

  private val alpha = "abcdefghij0123456789"
  private def randStr(rnd: Random, n: Int): String =
    (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString

  private def edit(rnd: Random, s: String): String = rnd.nextInt(3) match {
    case 0 => // substitute
      val i = rnd.nextInt(s.length)
      s.updated(i, alpha((alpha.indexOf(s(i)) + 1 + rnd.nextInt(alpha.length - 1)) % alpha.length))
    case 1 => // delete
      val i = rnd.nextInt(s.length)
      s.take(i) + s.drop(i + 1)
    case _ => // insert
      val i = rnd.nextInt(s.length + 1)
      s.take(i) + alpha(rnd.nextInt(alpha.length)) + s.drop(i)
  }

  test("every randomly-edited pair is found; exact pairs too; distance is honest") {
    import spark.implicits._
    val rnd = new Random(20260814L)
    val masters = (0 until 200).map(i => (i.toLong, randStr(rnd, 4 + rnd.nextInt(9))))
    val probes = masters.map { case (id, name) =>
      (id + 10000L, if (id % 5 == 0) name else edit(rnd, name))
    }
    val got = FuzzyMatch.matchWithin1(
        probes.toDF("id", "name"), masters.toDF("id", "name"), "id", "name")
      .select("probe_id", "master_id", "distance").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    masters.zip(probes).foreach { case ((mid, mname), (pid, pname)) =>
      val d = got.get((pid, mid))
      assert(d.isDefined,
        s"probe '$pname' (edit of '$mname') must be matched by the blocking")
      val expected = if (pname == mname) 0 else 1
      assert(d.contains(expected), s"distance for '$pname'~'$mname' is $d, want $expected")
    }
    // soundness: everything reported really is within distance 1
    assert(got.values.forall(_ <= 1))
  }

  test("a 2-edit pair is rejected by the verify even when blocks collide") {
    import spark.implicits._
    // 'abcd' vs 'abce'+'f'->'abef': distance 2; share NO deletion variant?
    // Build a pair that DOES share a variant but is distance 2:
    // 'aXbY' and 'aZbW' share nothing; use 'abc' vs 'acb' (transposition =
    // distance 2 under plain levenshtein) — they share variant 'ab'? abc
    // del c -> 'ab'; acb del c -> 'ab'. Blocks collide, verify must drop.
    val m = Seq((1L, "abc")).toDF("id", "name")
    val p = Seq((2L, "acb")).toDF("id", "name")
    val out = FuzzyMatch.matchWithin1(p, m, "id", "name").collect()
    assert(out.isEmpty, "transposition (levenshtein 2) must not survive the verify")
  }
}
