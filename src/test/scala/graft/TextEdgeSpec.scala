package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** The text API must be TOTAL on inputs the corpus never ships: null
  * text, empty strings, whitespace runs, single chars, and multi-byte
  * unicode. A library user's first real dataset contains all of these;
  * none may throw, and null must propagate as null — in particular a
  * null document must NOT emit a winnow fingerprint (it would be the
  * hash of nothing, shared by every other null document, flooding the
  * near-dup sharing scan).
  */
class TextEdgeSpec extends SparkTestBase {
  test("text API is total on null/empty/unicode/whitespace inputs") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, "normal text here"),
      (2L, ""),
      (3L, "x"),
      (4L, "héllo wörld ünïcode ß 漢字 emoji 🚀 text"),
      (5L, "   "),
      (6L, null.asInstanceOf[String])
    ).toDF("id", "body")
    val rows = df.select(col("id"),
        GraftOps.tokens(col("body")).as("toks"),
        GraftOps.shingles(GraftOps.tokens(col("body"))).as("sh"),
        GraftOps.winnowFingerprints(col("body")).as("fp"),
        GraftOps.repetitionSignals("body").as("rep"))
      .collect().map(r => r.getLong(0) -> r).toMap

    // null propagates through all four surfaces
    assert(rows(6L).isNullAt(1) && rows(6L).isNullAt(2) && rows(6L).isNullAt(3))
    assert(rows(6L).getStruct(4).isNullAt(0))

    // empty text: one empty token, one whole-text shingle, one fingerprint
    assert(rows(2L).getSeq[String](1) === Seq(""))
    assert(rows(2L).getSeq[Long](3).length === 1)
    assert(rows(2L).getStruct(4).getLong(0) === 1L)

    // whitespace run: 4 empty tokens, 3 identical "bigrams" of empties
    assert(rows(5L).getSeq[String](1) === Seq("", "", "", ""))
    assert(rows(5L).getStruct(4).getLong(0) === 4L)
    assert(rows(5L).getStruct(4).getLong(2) === 3L)

    // multi-byte unicode: char-based substrings produce sane outputs
    assert(rows(4L).getSeq[String](1).length === 8)
    val fp4 = rows(4L).getSeq[Long](3)
    assert(fp4.nonEmpty && fp4 === fp4.distinct.sorted)

    // single char: everything defined and minimal
    assert(rows(3L).getSeq[String](2) === Seq("x"))
    assert(rows(3L).getSeq[Long](3).length === 1)
  }

  test("shingles drop interior null tokens instead of null-poisoning windows") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, Seq[String]("a", null, "c", "d")),
      (2L, Seq[String](null, null)),
      (3L, Seq[String]("a", "b", "c", "d"))
    ).toDF("id", "toks")
    val got = df.select(col("id"), GraftOps.shingles(col("toks"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // nulls are dropped, then windows form over the remaining tokens —
    // never a null shingle in the output
    assert(got(1L) === Seq("a c d"))
    assert(got(2L) === Seq[String]())
    assert(got(3L) === Seq("a b c", "b c d"))
  }
}
