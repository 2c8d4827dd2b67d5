package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every registered oracle's SQL, pinning the two
  * driver-hasher parity conventions from SURVEY §5 at authoring time:
  *
  *  1. **No uncast integer SUM in the final select list.** DuckDB types
  *     `SUM(<integer>)` as HUGEINT, which the driver reads back as
  *     float64/object while Spark emits int64 — values compare equal but
  *     the hashes diverge (the round-6 `pivot_priority`/`q12_late_lines`/
  *     `sessionize_ids` reds). Spell it `CAST(SUM(...) AS BIGINT)`.
  *
  * This lint is deliberately narrow (paren-depth-0 select list only, i.e.
  * the outermost query): an uncast SUM inside a CTE is fine when its
  * consumer casts or divides it, and flagging all ~190 of those would
  * drown the signal. The AUTHORITATIVE guard for the flow-through class
  * (CTE HUGEINT projected to the output, and IEEE −0.0 after ROUND) is
  * dynamic: `tools/check_oracle.py` compares pandas dtype kinds and zero
  * signbits exactly as the driver's hasher does. This spec exists so the
  * common case is caught at `sbt test` time, before a DuckDB run.
  *
  * Heuristics that make a depth-0 SUM acceptable:
  *  - wrapped in `CAST(` directly;
  *  - argument is visibly floating (decimal literal, `DOUBLE`, exponent);
  *  - result immediately compared (`>`, `=`, ...) — never projected;
  *  - result immediately divided (`/` is float division in DuckDB).
  */
class OracleConventionSpec extends AnyFunSuite {

  private def balancedEnd(s: String, open: Int): Int = {
    var d = 0; var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  private val sumRe = "\\bSUM\\s*\\(".r
  private val floaty = "\\d\\.\\d|DOUBLE|\\d[eE]\\d".r
  private val overRe = "^OVER\\s*\\(".r
  private val consumedRe = "^(>=|<=|<>|!=|=|>|<|/)".r

  test("no uncast integer SUM in any oracle's outermost select list") {
    val viol = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      sumRe.findAllMatchIn(sql).flatMap { m =>
        val before = sql.substring(0, m.start)
        val depth = before.count(_ == '(') - before.count(_ == ')')
        val precast = before.takeRight(6).trim.toUpperCase.endsWith("CAST(")
        if (depth != 0 || precast) None
        else {
          val op = sql.indexOf('(', m.start)
          val end = balancedEnd(sql, op)
          val arg = sql.substring(op, end)
          if (floaty.findFirstIn(arg).isDefined) None
          else {
            var rest = sql.substring(end).dropWhile(_.isWhitespace)
            overRe.findFirstMatchIn(rest).foreach { o =>
              val oe = balancedEnd(rest, rest.indexOf('(', o.start))
              rest = rest.substring(oe).dropWhile(_.isWhitespace)
            }
            if (consumedRe.findFirstIn(rest).isDefined) None
            else Some(s"$name: ...${sql.substring(m.start, math.min(sql.length, m.start + 50)).replace('\n', ' ')}...")
          }
        }
      }
    }
    assert(viol.isEmpty,
      s"uncast HUGEINT SUM in final select (wrap in CAST(... AS BIGINT)):\n${viol.mkString("\n")}")
  }
}
