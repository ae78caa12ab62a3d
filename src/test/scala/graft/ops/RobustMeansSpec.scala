package graft.ops

import graft.SparkSpec

class RobustMeansSpec extends SparkSpec {
  import spark.implicits._

  private def rm(rows: Seq[(String, Long)], alpha: Double)
      : Map[String, (Long, Long, Double, Option[Double], Option[Long],
        Option[Long], Option[Double])] =
    Aggregates.robustMeans(rows.toDF("g", "v"), "g", "v", alpha)
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long]),
          Option(r.get(7)).map(_.asInstanceOf[Double])))
      }.toMap

  test("hand example: one whale bends the mean, not the trimmed/winsorized") {
    val (n, k, mean, trim, lo, hi, win) =
      rm(Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 100L)), 0.2)("g")
    assert(n === 5L && k === 1L && mean === 22.0)
    assert(trim === Some(3.0))
    assert(lo === Some(2L) && hi === Some(4L))
    // winsorized: [2,2,3,4,4] -> 15/5
    assert(win === Some(3.0))
  }

  test("ties spanning the cut get partial multiplicity") {
    // sorted [1,1,1,2,3], k=1: trim -> (1,1,2); winsor -> [1,1,1,2,2]
    val (_, k, _, trim, lo, hi, win) =
      rm(Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 2L), ("g", 3L)), 0.2)("g")
    assert(k === 1L)
    assert(trim === Some(4.0 / 3))
    assert(lo === Some(1L) && hi === Some(2L))
    assert(win === Some(7.0 / 5))
  }

  test("alpha = 0 degenerates to the plain mean") {
    val (_, k, mean, trim, _, _, win) =
      rm(Seq(("g", 5L), ("g", 7L), ("g", 9L)), 0.0)("g")
    assert(k === 0L && mean === 7.0 && trim === Some(7.0) && win === Some(7.0))
  }

  test("matches brute-force trimming on a pseudo-random workload") {
    val rng = new scala.util.Random(21)
    val rows = (1 to 500).map(_ => ("g", rng.nextInt(1000).toLong))
    val (n, k, mean, trim, _, _, win) = rm(rows, 0.1)("g")
    val sorted = rows.map(_._2).sorted
    val kk = math.floor(500 * 0.1).toLong.toInt
    val trimmed = sorted.slice(kk, 500 - kk)
    val winsored = Seq.fill(kk)(trimmed.head) ++ trimmed ++ Seq.fill(kk)(trimmed.last)
    assert(n === 500L && k === kk.toLong)
    assert(mean === sorted.sum.toDouble / 500)
    assert(trim === Some(trimmed.sum.toDouble / trimmed.size))
    assert(win === Some(winsored.sum.toDouble / 500))
  }

  test("groups isolated; bit determinism under repartitioning") {
    val rng = new scala.util.Random(31)
    val rows = (1 to 300).map(i => (s"g${i % 3}", rng.nextInt(50).toLong))
    val df = rows.toDF("g", "v")
    def bits(p: Int) = Aggregates.robustMeans(df.repartition(p), "g", "v", 0.15)
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).sortBy(_.mkString("|")).toSeq
    assert(bits(1) === bits(7))
  }
}
