package graft

import org.apache.spark.sql.functions._
import graft.operators.Scalars

/** Semantics + plan pins for the scalar-function surface queries whose
  * exactness the oracle gates but whose SHAPE claims need pinning.
  */
class ScalarsSpec extends SparkTestBase {

  test("fn_url: components recompute from the URL grammar; canon strips the query") {
    val rows = Scalars.fnUrl(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (url, host, path, item, canon) =
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4),
          r.getString(5))
      // re-derive every component from the raw string
      val m = "https://([^/]+)(/[^?]*)\\?(.*)$".r.findFirstMatchIn(url).get
      assert(host === m.group(1), s"host of $url")
      assert(path === m.group(2), s"path of $url")
      assert(item === r.getLong(0).toString, "item param is the event id")
      assert(canon === host + path, "canonical form = host + path, no query")
      assert(!canon.contains("?") && !canon.contains("utm_"),
        "tracking params must not survive canonicalization")
    }
    // canonicalization collapses: far fewer canon values than URLs
    val canons = rows.map(_.getString(5)).distinct
    assert(canons.length < rows.length / 10,
      s"${canons.length} canonical URLs for ${rows.length} raw — no collapse?")
  }

  test("fn_try: null exactly where the error would be, value elsewhere") {
    val rows = Scalars.fnTry(spark, sf).collect()
    rows.foreach { r =>
      val k = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(r.isNullAt(2) === k.forall(_ == 50L),
        s"safe_ratio null iff denominator k-50 = 0 (k=$k)")
      if (k.exists(_ < 50)) assert(r.getLong(3) === k.get,
        "numeric strings round-trip through try_cast")
      else assert(r.isNullAt(3), "non-numeric strings cast to null, not error")
    }
    assert(rows.exists(_.isNullAt(2)) && rows.exists(!_.isNullAt(2)),
      "both try_divide outcomes exercised")
    assert(rows.exists(_.isNullAt(3)) && rows.exists(!_.isNullAt(3)),
      "both try_cast outcomes exercised")
  }

  test("fn_url plan: map-side expression chain, zero shuffles before the sort") {
    val plan = planOf(Scalars.fnUrl(spark, sf)).split("== Initial Plan ==").head
    val hash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hash === 0, s"parse_url is row-local; got $hash hash exchanges:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"one events scan, got $scans")
  }

  test("fn_date_arith: java.time brute force on every row") {
    val rows = Scalars.fnDateArith(spark, sf).collect()
    val src = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), to_date(col("o_orderdate"))).collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    rows.foreach { r =>
      val d = src(r.getLong(0))
      assert(r.getLong(1) === (d.getMonthValue - 1) / 3 + 1, "quarter")
      val monthEnd = d.withDayOfMonth(d.lengthOfMonth)
      assert(r.getTimestamp(2).toLocalDateTime.toLocalDate === monthEnd)
      assert(r.getTimestamp(3).toLocalDateTime.toLocalDate ===
        d.plusMonths(3), "add_months clamps like java.time plusMonths")
      assert(r.getTimestamp(4).toLocalDateTime.toLocalDate ===
        d.minusDays(30))
      assert(r.getLong(5) === d.lengthOfMonth.toLong, "days in month")
      assert(r.getLong(6) === java.lang.Math.floorMod(d.toEpochDay, 7L),
        "portable epoch dow")
    }
  }
}
