package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{Ann, Ivf, Pca, Pq, Pipeline}

/** Dev tool: recall@10 of every ANN tier against the exact cosine
  * top-10 (probe vec 0) at a given sf dir, plus the regime context
  * (exact top-10 sim range, ladder sizes) needed to interpret it —
  * random-hyperplane LSH recall depends on the probe-to-neighbour
  * ANGLE, so the sim range says what recall is even achievable per
  * nprobe. Usage: tools/run_main.sh graft.RecallProbe <sfDir>
  * Not part of the driver contract; RecallSpec pins the floors.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // Corpus guard (r14 verdict hygiene, same check RecallSpec gained):
    // a relocated/stale blow-up dir should fail HERE with a clear
    // message, not as a FileNotFound mid-probe. Blow-up corpora in /tmp
    // must also be era-consistent with the testdata they scale from.
    require(new java.io.File(sfDir).isDirectory,
      s"$sfDir absent — pass an existing corpus dir " +
        "(testdata sf dir or a tools/scale_probe.sh blow-up dir)")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val exactRows = Pipeline.udfCosineTopk(spark, sfDir).collect()
    val exact = exactRows.map(_.getLong(0)).toSet
    println(f"exact top-10 sims: ${exactRows.map(_.getDouble(1)).min}%.4f .. " +
      f"${exactRows.map(_.getDouble(1)).max}%.4f")

    def recall(name: String, ids: Array[Long]): Unit =
      println(f"$name%-22s rows=${ids.length}%3d recall@10=${ids.count(exact.contains) / 10.0}%.2f")

    recall("knn_ann", Ann.knnAnn(spark, sfDir).collect().map(_.getLong(0)))
    for (np <- Seq(2, 4, 7))
      recall(s"knn_ann_probing($np)",
        Ann.knnAnnProbing(spark, sfDir, np).collect().map(_.getLong(0)))
    recall("knn_quant", Ann.knnQuant(spark, sfDir).collect().map(_.getLong(0)))
    recall("knn_ivf", Ivf.knnIvf(spark, sfDir).collect().map(_.getLong(0)))
    recall("knn_ivfpq", Pq.knnIvfPq(spark, sfDir).collect().map(_.getLong(0)))
    recall("knn_pq", Pq.knnPq(spark, sfDir).collect().map(_.getLong(0)))
    recall("knn_pca", Pca.knnPca(spark, sfDir).collect().map(_.getLong(0)))

    // IVF nprobe-vs-recall curve (r14): quantifies what the √cells
    // default buys and what more probing would cost — the knob a
    // deployment turns when the measured recall (0.40 at 100× in the
    // no-planted-neighbour regime) isn't enough for its use case.
    // nprobe = cells is exact-by-construction (sanity anchor).
    val cells = Ivf.cellCount(Ann.embedCount(spark, sfDir))
    val np0 = Ivf.defaultNprobe(cells)
    for (np <- Seq(np0, np0 * 2, np0 * 4, cells).distinct.filter(_ <= cells))
      recall(f"knn_ivf_np($np%d/$cells%d)",
        Ivf.knnIvfProbing(spark, sfDir, np).collect().map(_.getLong(0)))

    val sel = Ann.selectedBuckets(spark, sfDir)
    val qsel = Ann.knnQuantBuckets(spark, sfDir)
    println(s"selectedBuckets(K)=${sel.mkString(",")}  quantBuckets=${qsel.mkString(",")}")
    import org.apache.spark.sql.functions._
    val mean5 = Ann.knnRecallEval(spark, sfDir)
      .agg(avg(col("recall_at_5"))).collect()(0).getDouble(0)
    println(f"knn_recall_eval mean recall@5 = $mean5%.3f")
    spark.stop()
  }
}
