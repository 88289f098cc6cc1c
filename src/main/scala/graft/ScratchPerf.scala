package graft

import org.apache.spark.sql.SparkSession

/** Scratch micro-bench for per-row expression cost in the fat single-task
  * scan stages (one row group per corpus file ⇒ serial scans). Not part
  * of the driver contract; used to size the decimal-vs-long rewrite.
  */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").createOrReplaceTempView("lineitem")
    val cases = Seq(
      "decode2" -> "select l_orderkey, l_quantity from lineitem",
      "agg_dec" -> "select l_orderkey, sum(cast(l_quantity as decimal(18,2))) q from lineitem group by l_orderkey",
      "agg_dbl" -> "select l_orderkey, sum(l_quantity) q from lineitem group by l_orderkey",
      "agg_cents" -> "select l_orderkey, sum(cast(round(l_quantity * 100) as bigint)) q from lineitem group by l_orderkey",
      "rev_dec" -> "select l_orderkey, sum(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))) r from lineitem group by l_orderkey",
      "rev_cents" -> "select l_orderkey, sum(cast(round(l_extendedprice * 100) as bigint) * (100 - cast(round(l_discount * 100) as bigint))) r from lineitem group by l_orderkey",
      "rev_dbl" -> "select l_orderkey, sum(l_extendedprice * (1 - l_discount)) r from lineitem group by l_orderkey",
      // provably-identical cents path: authoritative rounding still via the
      // decimal cast, but multiply/sum run in long arithmetic
      "rev_safe" -> "select l_orderkey, sum(cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint) * (100 - cast(cast(l_discount as decimal(18,2)) * 100 as bigint))) r from lineitem group by l_orderkey",
      "agg_safe" -> "select l_orderkey, sum(cast(cast(l_quantity as decimal(18,2)) * 100 as bigint)) q from lineitem group by l_orderkey",
      // how much is the bare cast?
      "cast_only" -> "select cast(l_extendedprice as decimal(18,2)) c, cast(l_discount as decimal(18,2)) d from lineitem",
      "q18ish" -> "select l_orderkey, sum(cast(l_quantity as decimal(18,2))) q from lineitem group by l_orderkey having q > 250",
      "rev_floor" -> "select l_orderkey, sum(floor(l_extendedprice * 100 + 0.5) * (100 - floor(l_discount * 100 + 0.5))) r from lineitem group by l_orderkey",
      "agg_floor" -> "select l_orderkey, sum(floor(l_quantity * 100 + 0.5)) q from lineitem group by l_orderkey",
      // hybrid for coarse groups: cheap per-row cents, decimal-range sum
      "rev_centdec" -> "select l_returnflag, sum(cast(floor(l_extendedprice * 100 + 0.5) * (100 - floor(l_discount * 100 + 0.5)) as decimal(38,0))) r from lineitem group by l_returnflag",
      "rev_dec_coarse" -> "select l_returnflag, sum(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))) r from lineitem group by l_returnflag",
      "rev_long_coarse" -> "select l_returnflag, sum(floor(l_extendedprice * 100 + 0.5) * (100 - floor(l_discount * 100 + 0.5))) r from lineitem group by l_returnflag")
    // Exact-equivalence audit: fast cents vs the authoritative decimal cast
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").foreach { c =>
      val bad = spark.sql(
        s"select count(*) n from lineitem where floor($c * 100 + 0.5) <> cast(cast($c as decimal(18,2)) * 100 as bigint)").collect()(0).getLong(0)
      println(s"equiv $c: mismatches=$bad")
    }
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("orders")
    val badO = spark.sql(
      "select count(*) n from orders where floor(o_totalprice * 100 + 0.5) <> cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").collect()(0).getLong(0)
    println(s"equiv o_totalprice: mismatches=$badO")
    (1 to 3).foreach { round =>
      cases.foreach { case (name, sql) =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e6
        if (round > 1) println(f"$name%-10s ${dt}%7.1f ms")
      }
      if (round > 1) println("--")
    }
    spark.stop()
  }
}
