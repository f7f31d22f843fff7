package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SeqPattern

/** Unit contract for the row-pattern compiler behind
  * t30_match_recognize: hand-computed DFA tables, compile-time
  * validation, and a hand-traced fold over the generated CASE (via a
  * tiny local DataFrame, so the test drives the exact expression the
  * query embeds). */
class SeqPatternSpec extends AnyFunSuite with TestSpark {

  private def table(p: String): Map[(Int, Char), (Int, Boolean)] =
    SeqPattern.compile(p).rows.toMap

  test("'V C+ S? P' compiles to the hand-computed transition table") {
    val t = table("V C+ S? P")
    // state 0: only V starts a match
    assert(t((0, 'V')) === ((1, false)))
    assert(!t.contains((0, 'C')) && !t.contains((0, 'P')),
      "non-starting classes fall to the implicit default (0, no emit)")
    // state 1 (V committed): C advances; V restarts-as-start
    assert(t((1, 'C')) === ((2, false)))
    assert(t((1, 'V')) === ((1, false)))
    assert(!t.contains((1, 'P')), "P cannot skip the required C+")
    // state 2 (V C+): C absorbs, S takes the optional, P emits
    assert(t((2, 'C')) === ((2, false)))
    assert(t((2, 'S')) === ((3, false)))
    assert(t((2, 'P')) === ((0, true)), "P skips the optional S and emits")
    assert(t((2, 'V')) === ((1, false)))
    // state 3 (V C+ S): only P emits; V restarts
    assert(t((3, 'P')) === ((0, true)))
    assert(t((3, 'V')) === ((1, false)))
    assert(!t.contains((3, 'C')) && !t.contains((3, 'S')))
  }

  test("single-element and leading-optional patterns") {
    val one = table("A")
    assert(one((0, 'A')) === ((0, true)), "n == 1 emits immediately")
    val opt = table("A? B")
    assert(opt((0, 'A')) === ((1, false)))
    assert(opt((0, 'B')) === ((0, true)),
      "B may skip the optional A and complete the match from state 0")
  }

  test("compile-time validation rejects unmatchable or ambiguous patterns") {
    intercept[IllegalArgumentException](SeqPattern.compile("A B?"))
    intercept[IllegalArgumentException](SeqPattern.compile("A+ A"))
    intercept[IllegalArgumentException](SeqPattern.compile("A+ B? A"))
    // trailing '+' would silently lose greediness (emit resets state,
    // so absorb can never fire) — rejected like the trailing '?'
    intercept[IllegalArgumentException](SeqPattern.compile("A+"))
    intercept[IllegalArgumentException](SeqPattern.compile("A B+"))
    // an optional shadowed by a later same-class element greedily
    // commits the row to the wrong slot ("A? A" over one A must match)
    intercept[IllegalArgumentException](SeqPattern.compile("A? A"))
    intercept[IllegalArgumentException](SeqPattern.compile("A B? B"))
    intercept[IllegalArgumentException](SeqPattern.compile("a b"))
    intercept[IllegalArgumentException](SeqPattern.compile("A*"))
    intercept[IllegalArgumentException](SeqPattern.compile(""))
    SeqPattern.compile("A+ B? C") // the legal shapes still compile
    SeqPattern.compile("A? B+ C")
  }

  test("the generated CASE executes the hand-traced fold (the exact expression t30 embeds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pat = SeqPattern.compile("V C+ P")
    // trace: V C C P | V P(fail->restart as non-start) V C P | C(noise)
    //   V C C P   -> match 1
    //   V P       -> P fails at state 1, P is not a start -> state 0
    //   V C P     -> match 2
    //   C         -> not a start -> state 0
    val seq = Seq("V", "C", "C", "P", "V", "P", "V", "C", "P", "C")
    val df = seq.zipWithIndex.map { case (c, i) => (1L, i.toLong, c) }
      .toDF("k", "pos", "cls")
    val out = df.groupBy($"k")
      .agg(collect_list(struct($"pos", $"cls")).as("s"))
      .select(expr(
        s"""aggregate(array_sort(s),
             named_struct('st', 0, 'done', CAST(0 AS BIGINT)),
             (acc, e) -> named_struct(
               'st', ${pat.nextStateCase("acc.st", "e.cls")},
               'done', acc.done +
                 CAST(${pat.emitCase("acc.st", "e.cls")} AS BIGINT)))""")
        .as("fin"))
      .select($"fin.done", $"fin.st").head()
    assert(out.getLong(0) === 2L, "two complete V C+ P matches")
    assert(out.getInt(1) === 0, "scan ends outside any partial match")
  }
}
