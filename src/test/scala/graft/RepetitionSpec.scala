package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RepetitionKernel

/** Gopher n-gram repetition metrics — definition pinned against hand
  * computations (the driver oracle q_repetition cross-checks vs DuckDB).
  */
class RepetitionSpec extends SparkSpec {

  private def run(text: String, n: Int): (String, Double, Double) = {
    val r: InternalRow = RepetitionKernel.eval(UTF8String.fromString(text), n)
    (if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
      r.getDouble(1), r.getDouble(2))
  }

  test("top 2-gram fraction on a repetitious document") {
    // norm = "a b a b a b c" (13 chars); grams: "a b"×3, "b a"×2, "b c"×1
    val (g, tf, df) = run("A b a B a b c", 2)
    assert(g == "a b")
    assert(tf == 3.0 * 3 / 13)
    assert(df == (3.0 * 3 + 2.0 * 3) / 13)
  }

  test("tie on count → lexicographically smallest gram") {
    // "x y x y": "x y"×2, "y x"×1 → top is "x y". "b a b a" vs "a b a b":
    val (g, _, _) = run("b a b a", 2)
    // grams: "b a"×2, "a b"×1 → top "b a" (higher count beats lex order)
    assert(g == "b a")
    val (g2, _, _) = run("a b c a b c", 3)
    // "a b c"×2, "b c a"×1, "c a b"×1
    assert(g2 == "a b c")
  }

  test("no repetition → dup_frac 0, top_frac small") {
    val (g, tf, df) = run("one two three four", 2)
    assert(df == 0.0)
    assert(g == "one two") // all cnt=1 → lexicographic: "four"? no — smallest
    // counts all 1 → tie-break picks lexicographically smallest gram
    assert(Seq("one two", "three four", "two three").min == "one two")
    assert(tf == ("one two".length.toDouble / "one two three four".length))
  }

  test("normalization: case, interior runs, trim") {
    val (g, _, _) = run("  FOO\t\tBar  foo bar ", 2)
    // norm = "foo bar foo bar" → "foo bar"×2 top
    assert(g == "foo bar")
  }

  test("codepoint semantics: supplementary-plane chars count once") {
    // norm = "😀a 😀a b": cpLen = 7 (emoji is ONE codepoint, two UTF-16 units)
    // 2-grams "😀a 😀a" and "😀a b" both occur once; codepoint order makes
    // "😀a b" smaller ('b' = U+0062 < U+1F600) — exactly where a UTF-16
    // compareTo would have to agree by accident and a byte-order oracle
    // (DuckDB) demands codepoint comparison
    val (g, tf, df) = run("😀a 😀a b", 2)
    assert(g == "😀a b")
    assert(tf == 4.0 / 7)
    assert(df == 0.0)
    val (g1, tf1, df1) = run("😀a 😀a b", 1)
    assert(g1 == "😀a" && tf1 == 2.0 * 2 / 7 && df1 == 4.0 / 7)
  }

  test("degenerate inputs") {
    assert(run("", 2) == (null, 0.0, 0.0))
    assert(run("   \t ", 2) == (null, 0.0, 0.0))
    assert(run("single", 2) == (null, 0.0, 0.0))
    assert(run("a b", 3) == (null, 0.0, 0.0))
    // n=1: unigrams
    val (g1, tf1, _) = run("z z y", 1)
    assert(g1 == "z" && tf1 == 2.0 / 5)
  }
}
