package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.GraftOps
import graft.sources.Tables

/** Product-quantization ANN — the compressed-domain scan tier of the
  * similarity-search family (exact top-k → LSH bucket → IVF cells →
  * PQ codes): every vector stores as M=8 4-bit-ish codes (8 ints here;
  * 8 bytes packed), 32× under float32, and ranking reads ONLY the
  * codes via two ADC lookup tables computed per query from the probe.
  * At 100 TB this is what makes a full-corpus similarity scan feasible
  * at all: the scan is arithmetic over 8-byte codes, the float vectors
  * are touched only for the final rescore of a 50-row pool (fetched by
  * id — a point lookup against the full-precision store).
  *
  * Train/encode are batch-ingest costs, not per-query costs: the
  * codebook is memoized per corpus fingerprint and the codes table is
  * materialized once per (JVM, corpus), exactly like the minhash
  * signature table. No oracle (codebooks are engine-specific);
  * overlap-vs-exact, determinism, and exact-dup properties pinned in
  * PqSpec.
  */
object Pq {

  /** Centroids per subspace: K=32 at test scale (production 256 —
    * still one byte per subspace). Measured overlap-vs-exact at
    * sf0.001: K=16/pool=50 → 4/10; K=32/pool=100 → 10/10.
    */
  val K = 32

  /** ADC pool depth: PQ's encoding error is larger than SQ8's, so the
    * rescore pool is deeper than Ann.RescorePool (the standard
    * compensation — pool size, not codebook size, is the cheap knob:
    * it only widens the TakeOrderedAndProject, not the stored codes).
    */
  val PqRescorePool = 100

  /** Codebooks per (corpus fingerprint) — training is an action. */
  private val cbMemo = scala.collection.concurrent.TrieMap
    .empty[String, Array[Array[Array[Float]]]]

  /** Codes-table parquet paths already written by this JVM. */
  private val writtenCodes = scala.collection.mutable.Set.empty[String]

  private lazy val codesRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_pq_")
    p.toFile.deleteOnExit()
    p
  }

  /** The (codes table, codebook) for a corpus: trained + encoded once
    * per (JVM, corpus content), then served from parquet — the ingest/
    * query split a production pipeline would have.
    */
  private[graft] def codesTable(spark: SparkSession,
      sfDir: String): (DataFrame, Array[Array[Array[Float]]]) = {
    val fp = graft.sources.DataFingerprint.ofTable(sfDir, "embeddings")
    val e = Tables.embeddings(spark, sfDir)
    val cb = cbMemo.getOrElseUpdate(fp, GraftOps.pqTrain(e, "embedding", k = K))
    val path = codesRoot.resolve(s"pq_codes_$fp").toString
    Pq.synchronized {
      if (!writtenCodes.contains(path)) {
        // ingest path uses the codegen encoder (PqEncodeExpr) — the
        // pure-HOF GraftOps.pqEncode is its portable cross-check,
        // pinned code-identical in PqSpec
        graft.expressions.PqEncodeExpr.register(spark, cb)
        e.select(col("vec_id"), expr("pq_encode(embedding)").as("codes"))
          .coalesce(4).write.mode("overwrite").parquet(path)
        writtenCodes += path
      }
    }
    (spark.read.parquet(path), cb)
  }

  /** `knn_pq` — top-10 cosine neighbours of vec_id=0: ADC scan over the
    * codes table (map-side lookups + TakeOrderedAndProject, pool 50),
    * then rescore the pool on original floats fetched by id.
    */
  def knnPq(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val (codes, cb) = codesTable(spark, sfDir)
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val (ip, n2) = GraftOps.pqAdcTables(probe, cb)
    val probeNorm = math.sqrt(probe.map(x => x.toDouble * x).sum)
    val pool = codes.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        GraftOps.pqCosineAdc(col("codes"), ip, n2, probeNorm).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(PqRescorePool)
    // the 100-row pool broadcasts; originals are fetched by id only for it
    broadcast(pool).join(e, "vec_id")
      .select(col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), typedlit(probe)), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** IVF-PQ codes-table paths already written by this JVM. */
  private val writtenIvfPq = scala.collection.mutable.Set.empty[String]

  /** `knn_ivfpq` — the composed production ANN layout at 100 TB: PQ
    * codes PARTITIONED BY IVF cell. A probe ranks its `nprobe` nearest
    * cells' codes via ADC — the scan is partition-PRUNED at file-listing
    * time (the directory listing skips every other cell; pinned in
    * PqSpec) AND compressed (8-byte codes, no float vectors) — then
    * rescores the pool on originals fetched by id. IVF bounds WHAT is
    * scanned, PQ bounds the BYTES per scanned row; this composition is
    * what an actual 100 TB ANN deployment runs (FAISS IVF-PQ, SCANN).
    * Identical results to knn_ivf's exact in-cell ranking whenever the
    * ADC pool captures the in-cell top-10 (pinned at test scale).
    */
  def knnIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val (model, assigned, _) = Ivf.quantized(spark, sfDir)
    val fp = graft.sources.DataFingerprint.ofTable(sfDir, "embeddings")
    val cb = cbMemo.getOrElseUpdate(fp, GraftOps.pqTrain(e, "embedding", k = K))
    val path = codesRoot.resolve(s"ivfpq_codes_$fp").toString
    Pq.synchronized {
      if (!writtenIvfPq.contains(path)) {
        graft.expressions.PqEncodeExpr.register(spark, cb)
        assigned
          .select(col("vec_id"), col("cell"), expr("pq_encode(embedding)").as("codes"))
          .write.partitionBy("cell").mode("overwrite").parquet(path)
        writtenIvfPq += path
      }
    }
    val codes = spark.read.parquet(path)
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val cells = Ivf.probeCells(spark, model.clusterCenters.map(_.toArray),
      probe, nprobe = 2)
    val (ip, n2) = GraftOps.pqAdcTables(probe, cb)
    val probeNorm = math.sqrt(probe.map(x => x.toDouble * x).sum)
    val pool = codes
      .filter(col("cell").isin(cells.toIndexedSeq.map(Integer.valueOf): _*) &&
        col("vec_id") =!= 0)
      .select(col("vec_id"),
        GraftOps.pqCosineAdc(col("codes"), ip, n2, probeNorm).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(PqRescorePool)
    broadcast(pool).join(e, "vec_id")
      .select(col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), typedlit(probe)), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_pq" -> knnPq _,
    "knn_ivfpq" -> knnIvfPq _
  )

  val oracle: Map[String, String] = Map.empty
}
