package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Vector/similarity functions over `array<float>` embedding columns
  * (SURVEY.md §2.1 J1; determinism rules §2.0.3).
  *
  * Scale design: cosine against a broadcast probe is a map-side-only
  * operation — no shuffle, no all-pairs blow-up. The UDF iterates the
  * array once in index order accumulating dot/normA/normB in double,
  * the same single-pass shape DuckDB's `list_cosine_similarity` uses,
  * so a final ROUND(x, 6) absorbs any last-ulp divergence.
  */
object VectorFns {

  /** Cosine similarity of two float vectors, computed in double in array
    * order. Returns NaN on zero-norm inputs (neither engine produces
    * zero-norm vectors in this corpus) and null on mismatched lengths —
    * DuckDB's list_cosine_similarity errors on unequal lengths, so a
    * silent min-length truncation would quietly diverge from the oracle.
    * Same contract as the native cosine_sim expression (CosineExprSpec
    * pins their agreement).
    */
  val cosineSim: UserDefinedFunction = udf { (a: Seq[Float], b: Seq[Float]) =>
    if (a == null || b == null || a.length != b.length) None
    else {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      val n = a.length
      while (i < n) {
        val x = a(i).toDouble
        val y = b(i).toDouble
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      Some(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  /** Pure-Catalyst cosine similarity (no UDF): `zip_with` products and
    * higher-order `aggregate` sums, fully codegen-friendly. Accumulates
    * left-to-right like the UDF. Used as a cross-check in tests; the UDF
    * stays the declared surface (it IS the UDF requirement).
    */
  def cosineSimNative(a: Column, b: Column): Column = {
    def dotAcc(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0),
        (acc, v) => acc + v)
    dotAcc(a, b) / (sqrt(dotAcc(a, a)) * sqrt(dotAcc(b, b)))
  }

  /** Raw inner product ⟨a, b⟩ in double, accumulated left-to-right —
    * the UNNORMALIZED retrieval score (MIPS). Pure Catalyst HOFs with
    * both arrays in ARGUMENT position (evaluated once per row, not per
    * element — the winnow O(n²) lesson). Mirrors DuckDB's
    * `list_inner_product` element order, so ROUND-6 closes the gap.
    */
  def innerProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)
}
