package graft

/** The GraftExtensions entry point must make cosine_sim resolvable from
  * plain SQL text in sessions built with spark.sql.extensions.
  */
class ExtensionsSpec extends SparkTestBase {

  test("cosine_sim resolves from SQL text via spark.sql.extensions") {
    val v = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS array<float>),
        |                  CAST(array(1.0, 0.0) AS array<float>)) AS s""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    val orth = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS array<float>),
        |                  CAST(array(0.0, 1.0) AS array<float>)) AS s""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(orth) < 1e-12)
  }

  test("type mismatch is rejected at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1, 2), array(3, 4))").collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }
}
