package graft

import graft.aram.{Preprocess, Ranking}
import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY.md §5): the operator laws that must
  * hold for arbitrary inputs, not just curated fixtures.
  */
class PropertiesSpec extends SparkSpec {

  /** Draw n samples from a generator (raw ScalaCheck, no scalatest bridge
    * in the offline cache). Properties are exact laws, so any sample must
    * satisfy them.
    */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  import spark.implicits._

  private val scoresGen: Gen[List[(String, Double)]] = for {
    n <- Gen.choose(1, 12)
    scores <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
  } yield scores.zipWithIndex.map { case (s, i) => (f"p$i%02d", s) }

  test("property: ordinal ranks are a permutation of 1..n") {
    samples(scoresGen, 15).filter(_.nonEmpty).foreach { rows =>
      {
        val df = rows.toDF("puuid", "score").withColumn("g", lit("m"))
        val ranked = Ranking.predictedRanks(df, "score", Seq("g"), "puuid")
        val got = ranked.select("predicted_rank").collect().map(_.getDouble(0)).sorted
        assert(got.toSeq === (1 to rows.size).map(_.toDouble))
      }
    }
  }

  test("property: ranking invariant under positive affine transform of scores") {
    val triple = for { r <- scoresGen; a <- Gen.choose(0.1, 10.0); b <- Gen.choose(-50.0, 50.0) } yield (r, a, b)
    samples(triple, 8).filter(_._1.nonEmpty).foreach { case (rows, a, b) =>
        {
          val df = rows.toDF("puuid", "score").withColumn("g", lit("m"))
          val r1 = Ranking.predictedRanks(df, "score", Seq("g"), "puuid")
            .select("puuid", "predicted_rank").collect()
            .map(r => r.getString(0) -> r.getDouble(1)).toMap
          val df2 = df.withColumn("score", col("score") * a + b)
          val r2 = Ranking.predictedRanks(df2, "score", Seq("g"), "puuid")
            .select("puuid", "predicted_rank").collect()
            .map(r => r.getString(0) -> r.getDouble(1)).toMap
          assert(r1 === r2)
        }
    }
  }

  test("property: clip is idempotent and bounded") {
    samples(Gen.listOfN(40, Gen.choose(-1000.0, 1000.0)), 8).filter(_.nonEmpty).foreach { vals =>
      {
        val df = vals.toDF("x")
        val model = Preprocess.fitClip(df, Seq("x"), 0.1, 0.9)
        val once = model(df)
        val twice = model(once)
        assert(once.exceptAll(twice).count() === 0)
        val (lo, hi) = model.bounds("x")
        val Array(mn, mx) = once.agg(min("x"), max("x")).head().toSeq
          .map(_.asInstanceOf[Double]).toArray
        assert(mn >= lo - 1e-9 && mx <= hi + 1e-9)
      }
    }
  }

  test("property: dedup output has unique keys and survivors are minimal ids") {
    val docGen = Gen.listOfN(30, for {
      id <- Gen.choose(1L, 1000L)
      text <- Gen.oneOf("aaa", "bbb", "ccc", "ddd")
    } yield (id, text))
    samples(docGen, 8).filter(_.nonEmpty).foreach { docs =>
      {
        val df = docs.distinct.toDF("doc_id", "text")
        val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
        val fps = groups.map(_.getString(0))
        assert(fps.distinct.length === fps.length)
        val expectMin = docs.distinct.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).min }
        groups.foreach { g =>
          val survivors = expectMin.values.toSet
          assert(survivors.contains(g.getAs[Long]("keep_id")))
        }
      }
    }
  }

  test("property: partition shares sum to ~1 per group (nonzero groups)") {
    val gen = Gen.listOfN(30, for {
      g <- Gen.choose(0, 4); v <- Gen.choose(1.0, 50.0)
    } yield (s"g$g", v))
    samples(gen, 8).filter(_.nonEmpty).foreach { rows =>
      {
        val df = rows.toDF("g", "v")
        val shares = graft.ops.Windows.partitionShare(df, Seq("g"), "v", "share")
        val sums = shares.groupBy("g").agg(sum("share").as("s")).collect()
        sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-6))
      }
    }
  }

  test("property: sortedPercentilesMulti ≡ built-in exact percentile (ties, tiny n, skew)") {
    // exercises the range-partitioned two-pass offset scheme: columns of
    // very different sizes in one call, heavy ties straddling partition
    // boundaries, and n=1 / n=2 edge cases
    val gen = for {
      n1 <- Gen.choose(1, 400)
      n2 <- Gen.choose(1, 40)
      v1 <- Gen.listOfN(n1, Gen.choose(-5, 5))    // heavy ties
      v2 <- Gen.listOfN(n2, Gen.choose(-1e6, 1e6))
    } yield (v1.map(_.toDouble), v2)
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    samples(gen, 6).foreach { case (v1, v2) =>
      val df = v1.map(x => (Some(x), None: Option[Double]))
        .zipAll(v2.map(x => (None: Option[Double], Some(x))), (None, None), (None, None))
        .map { case ((a, _), (_, b)) => (a, b) }
        .toDF("c1", "c2").repartition(7) // force values to straddle partitions
      val got = graft.ops.Aggregates.sortedPercentilesMulti(df, Seq("c1", "c2"), ps)
      val want = Seq("c1", "c2").map { c =>
        c -> ps.map(p => df.selectExpr(s"percentile($c, $p)").head().getDouble(0))
      }.toMap
      Seq("c1", "c2").foreach { c =>
        got(c).zip(want(c)).foreach { case (g, w) =>
          assert(math.abs(g - w) < 1e-9, s"col $c: got ${got(c)} want ${want(c)}")
        }
      }
    }
  }

  test("property: snapshot changelog partitions keys and replays old into new") {
    val snapGen: Gen[Map[Long, Long]] = for {
      n <- Gen.choose(0, 25)
      ks <- Gen.listOfN(n, Gen.choose(0L, 30L))
      vs <- Gen.listOfN(n, Gen.choose(0L, 5L))
    } yield ks.zip(vs).toMap
    samples(Gen.zip(snapGen, snapGen), 12).foreach { case (a, b) =>
      val oldDf = a.toSeq.toDF("id", "v")
      val newDf = b.toSeq.toDF("id", "v")
      val log = graft.ops.SnapshotDiff.changelog(oldDf, newDf, Seq("id"), Seq("v"))
        .select("id", "op", "new_v").collect()
        .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      val byOp = log.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap.withDefaultValue(Set.empty[Long])
      assert(byOp("insert") === b.keySet -- a.keySet)
      assert(byOp("delete") === a.keySet -- b.keySet)
      assert(byOp("update") ++ byOp("unchanged") === a.keySet.intersect(b.keySet))
      assert(byOp("update").forall(k => a(k) != b(k)))
      assert(byOp("unchanged").forall(k => a(k) == b(k)))
      // applying the changelog to the old snapshot reconstructs the new one
      val applied = a -- byOp("delete") ++
        log.collect { case (k, op, Some(v)) if op != "delete" => k -> v }
      assert(applied === b)
    }
  }

  test("property: incremental agg replay is split-invariant") {
    val rowsGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 60)
      ks <- Gen.listOfN(n, Gen.choose(0L, 8L))
      vs <- Gen.listOfN(n, Gen.choose(-100L, 100L))
    } yield ks.zip(vs)
    val partials = Seq(count(lit(1)).as("n"), sum(col("v")).as("s"), max(col("v")).as("mx"))
    val merges = Seq(sum(col("n")).as("n"), sum(col("s")).as("s"), max(col("mx")).as("mx"))
    samples(Gen.zip(rowsGen, Gen.choose(1, 5)), 8).foreach { case (rows, parts) =>
      val df = rows.toDF("k", "v")
      val batches = (0 until parts).map(i => df.filter(pmod(col("v") + 100, lit(parts.toLong)) === i))
      val folded = graft.ops.IncrementalAgg.replay(batches, Seq("k"), partials, merges)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val direct = df.groupBy("k").agg(partials.head, partials.tail: _*)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(folded === direct)
    }
  }

  test("property: zValue is a bijection on the quantized grid") {
    val bits = 5
    val grid = for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)
    val zs = grid.toDF("x", "y")
      .select(graft.ops.Layout.zValue(Seq(col("x"), col("y")), bits).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length === 1024)
    assert(zs.min === 0L && zs.max === 1023L)
  }

  test("property: pointer-jumped components equal driver-side union-find") {
    val graphGen: Gen[List[(Long, Long)]] = for {
      nV <- Gen.choose(2, 60)
      nE <- Gen.choose(1, 90)
      edges <- Gen.listOfN(nE,
        Gen.zip(Gen.choose(1L, nV.toLong), Gen.choose(1L, nV.toLong)))
    } yield edges.filter { case (a, b) => a != b }
    samples(graphGen, 8).filter(_.nonEmpty).foreach { edges =>
      val got = graft.llm.DupClusters.clusters(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: classic union-find with path compression, min-id label
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(v => v -> find(v)).toMap
      assert(got === want, s"edges=$edges")
    }
  }
}
