package graft

import org.apache.spark.sql.SparkSession

/** Shared session-conf plumbing for the probe/bench mains. */
object SessionConfs {

  /** Apply the `SPARK_GRAFT_EXTRA_CONFS` A/B hook ("k=v;k=v") to a
    * builder. Blank segments (trailing/double semicolons) are ignored;
    * a segment without '=' is a hard, NAMED error instead of the bare
    * MatchError the old per-main copies threw (ADVICE r12) — a typo'd
    * experiment conf should fail loudly, not half-apply. Unset env =
    * the shipped defaults; driver runs never set it.
    */
  def applyExtra(builder: SparkSession.Builder): SparkSession.Builder = {
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(";").foreach { kv =>
      val s = kv.trim
      if (s.nonEmpty) s.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => builder.config(k.trim, v.trim)
        case _ => throw new IllegalArgumentException(
          s"SPARK_GRAFT_EXTRA_CONFS segment '$s' is not of the form key=value")
      }
    })
    builder
  }
}
