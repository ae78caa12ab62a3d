package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query wall-clock.
  * A warmup action first so JVM/classloader/codegen startup is not billed
  * to whichever query happens to run first.
  *
  * Regression tracking: the line also carries `vs_prev` — this run's
  * per-query time divided by the same query's time in the latest
  * `BENCH_r{N}.json` the driver wrote (only when that file ran at the
  * same SF dir) — and `regressed`, the queries that got >1.5× slower.
  */
object Bench {

  /** Per-query seconds from the newest BENCH_r{N}.json at the same SF. */
  private[graft] def prevBench(repoDir: String, sfDir: String): Map[String, Double] = {
    val re = "BENCH_r(\\d+)\\.json".r
    val newest = Option(new java.io.File(repoDir).listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case re(n) => Some(n.toInt -> f)
        case _ => None
      }).sortBy(_._1).lastOption.map(_._2)
    newest.map { f =>
      val txt = {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        // the driver embeds our JSON line escaped inside its "tail" field;
        // unescaping makes both the raw and the wrapped format parseable
        try src.mkString.replace("\\\"", "\"") finally src.close()
      }
      val sameSf = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt)
        .exists(_.group(1) == sfDir)
      val qIdx = txt.indexOf("\"queries\":{")
      if (!sameSf || qIdx < 0) Map.empty[String, Double]
      else {
        val body = txt.substring(qIdx + "\"queries\":{".length, txt.indexOf('}', qIdx))
        "\"([^\"]+)\":([-+0-9.eE]+)".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }.getOrElse(Map.empty)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // bench measures dataflow: one big trigger per live streaming query
    // (multi-batch semantics are Verify's and StreamingSpec's job)
    if (!sys.props.contains("graft.stream.filesPerTrigger"))
      sys.props("graft.stream.filesPerTrigger") = "8"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table once (schema read + codegen paths).
    try {
      Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    } catch { case _: Throwable => () }

    // two timed runs per query, report the min: steady-state cost without
    // first-touch page-cache/codegen noise
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val prev = prevBench("/root/repo", sfDir)
    val vsPrev = results.flatMap { case (k, v) =>
      prev.get(k).filter(_ > 0).map(p => k -> v / p)
    }
    val vsStr = vsPrev.map { case (k, r) =>
      "\"" + k + "\":" + (math.round(r * 1000) / 1000.0)
    }.mkString("{", ",", "}")
    // flag only ratio AND absolute regressions: sub-second queries jitter
    // past 1.5× from JVM noise alone
    val resMap = results.toMap
    val regressed = vsPrev
      .filter { case (k, r) => r > 1.5 && resMap(k) - prev(k) > 0.25 }
      .map(_._1).sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","vs_prev":$vsStr,"regressed":$regressed}""")
    spark.stop()
  }
}
