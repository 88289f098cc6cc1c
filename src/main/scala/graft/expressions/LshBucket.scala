package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, IntegerLiteral, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Random-hyperplane LSH signature of a float vector as a native
  * codegen expression: bit i of the result is the sign of
  * `embedding · plane_i`. Replaces a per-row Scala UDF — the hyperplane
  * matrix rides into the generated code as a referenced object
  * (`ctx.addReferenceObj`), so the hot loop is a branch-free fused
  * double loop with no serialization boundary.
  *
  * The planes are derived deterministically from a fixed seed, and the
  * first `k` planes of an `nbits = k` expression are a prefix of any
  * larger `nbits` — so growing the bucket count (the scale knob, see
  * `LshBucket.bitsFor`) refines buckets rather than reshuffling them.
  * Accumulation order matches the retired UDF exactly (index-order
  * float→double promote-multiply-add), pinned in AnnSpec.
  */
case class LshBucket(child: Expression, nbits: Int) extends UnaryExpression {

  require(nbits >= 1 && nbits <= LshBucket.MaxBits,
    s"nbits must be in [1, ${LshBucket.MaxBits}], got $nbits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  // NULL is produced for vectors with null elements even when the child
  // is non-nullable (same contract as cosine_sim — reading a null slot
  // through ArrayData.getFloat yields undefined data, and a
  // representation-dependent bucket would diverge between interpreted
  // and generated code).
  override def nullable: Boolean = true

  override def prettyName: String = "lsh_bucket"

  @transient private lazy val matrix: Array[Array[Double]] =
    LshBucket.planesFor(nbits)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = matrix
    // Null-element guard (cosine_sim contract): one pass up front —
    // every plane reads the same element range, so checking once covers
    // the whole signature loop.
    val ne = math.min(v.numElements(), LshBucket.Dim)
    var c = 0
    while (c < ne) {
      if (v.isNullAt(c)) return null
      c += 1
    }
    var sig = 0
    var i = 0
    while (i < m.length) {
      val p = m(i)
      var d = 0.0
      var j = 0
      val n = math.min(v.numElements(), p.length)
      while (j < n) { d += v.getFloat(j) * p(j); j += 1 }
      if (d >= 0) sig |= (1 << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("lshPlanes", matrix, "double[][]")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val ne = ctx.freshName("ne")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      s"""
         |int $ne = java.lang.Math.min($a.numElements(), ${LshBucket.Dim});
         |for (int $c = 0; $c < $ne; $c++) {
         |  if ($a.isNullAt($c)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  int $sig = 0;
         |  for (int $i = 0; $i < $planesRef.length; $i++) {
         |    double[] $p = $planesRef[$i];
         |    double $d = 0.0;
         |    int $n = java.lang.Math.min($a.numElements(), $p.length);
         |    for (int $j = 0; $j < $n; $j++) {
         |      $d += ((double) $a.getFloat($j)) * $p[$j];
         |    }
         |    if ($d >= 0) $sig |= (1 << $i);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {

  /** Upper bound on signature bits: 2^24 buckets is enough for ~10^10
    * vectors at the ~1k-per-bucket target before the prefix property
    * would need a longer seed stream.
    */
  val MaxBits = 24

  /** Embedding dimensionality (corpus-verified fixed 64). */
  val Dim = 64

  /** The full seeded plane stream; `planesFor(k)` is always its prefix. */
  private lazy val allPlanes: Array[Array[Double]] = {
    val rnd = new java.util.Random(42L)
    Array.fill(MaxBits)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  def planesFor(nbits: Int): Array[Array[Double]] = allPlanes.take(nbits)

  /** The scale rule for the bucket count: keep expected bucket size near
    * `target` rows, i.e. nbits ≈ log₂(n / target), floored at 6 (64
    * buckets — the round-2 constant, so small-sf results are unchanged)
    * and capped at MaxBits. A fixed bucket count is a scale bug: the
    * per-bucket self-join in embedding dedup is quadratic in bucket
    * size, so buckets must stay O(target) as n grows.
    */
  def bitsFor(n: Long, target: Long = 1024L): Int = {
    val needed = math.ceil(math.log(math.max(n, 1L).toDouble / target) /
      math.log(2.0)).toInt
    math.min(math.max(needed, 6), MaxBits)
  }

  /** Register `lsh_bucket(vec, nbits)` — nbits must be an int literal
    * (it selects the hyperplane matrix at plan time). Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bucket", args => {
        if (args.length != 2) throw new IllegalArgumentException(
          s"lsh_bucket requires exactly 2 arguments (vec, nbits), got ${args.length}")
        args(1) match {
          case IntegerLiteral(k) => LshBucket(args(0), k)
          case other => throw new IllegalArgumentException(
            s"lsh_bucket nbits must be an integer literal, got $other")
        }
      }, "built-in")
}
