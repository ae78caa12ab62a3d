package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 2000L).map(i => (i, if (i % 3 == 0) "fr" else "en"))
    .toDF("doc_id", "lang").cache()

  test("hash sampling is deterministic and partitioning-independent") {
    val a = Sampling.sampleByKey(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByKey(docs.repartition(13), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // fraction lands near the target (hash uniformity)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
  }

  test("nested fractions are subsets: sample(0.1) ⊆ sample(0.4)") {
    val small = Sampling.sampleByKey(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.sampleByKey(docs, "doc_id", 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("acceptBy: per-row probability — p=1 keeps all, p=0 keeps none, " +
      "sharper temperature is a subset, deterministic under repartitioning") {
    import org.apache.spark.sql.functions.{col, lit}
    val withP = docs.withColumn("p", (col("doc_id") % 100).cast("double") / 100.0)
    assert(Sampling.acceptBy(docs, "doc_id", lit(1.0)).count() === 2000L)
    assert(Sampling.acceptBy(docs, "doc_id", lit(0.0)).count() === 0L)
    val soft = Sampling.acceptBy(withP, "doc_id", col("p"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sharp = Sampling.acceptBy(withP, "doc_id", col("p") * col("p"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sharp.subsetOf(soft), "p² acceptance must be a subset of p (p ≤ 1)")
    assert(sharp.nonEmpty && sharp.size < soft.size)
    val repart = Sampling.acceptBy(withP.repartition(17), "doc_id", col("p"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart === soft)
  }

  test("token budget: sequential per-stratum semantics, partitioning-independent") {
    val toks = docs.withColumn("toks", (col("doc_id") % 40 + 1).cast("long"))
    val got = Sampling.tokenBudget(toks, "lang", "doc_id", "toks", budget = 500L)
      .select("lang", "doc_id", "toks", "cum_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sequential reference: sort each stratum by (hash, id), take while <= budget
    val expect = docs.withColumn("toks", (col("doc_id") % 40 + 1).cast("long"))
      .withColumn("u", Sampling.hashUniform(col("doc_id")))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).flatMap { case (lang, rows) =>
        var cum = 0L
        rows.sortBy(r => (r._4, r._2)).iterator.map { r =>
          cum += r._3; (lang, r._2, r._3, cum)
        }.filter(_._4 <= 500L)
      }.toSet
    assert(got.toSet === expect)
    // per-stratum totals never exceed the budget; both strata represented
    val totals = got.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._3).sum }
    assert(totals.values.forall(_ <= 500L), s"budget exceeded: $totals")
    assert(totals.keySet === Set("en", "fr"))
    // partitioning-independent
    val re = Sampling.tokenBudget(toks.repartition(17), "lang", "doc_id", "toks", 500L)
      .select("lang", "doc_id", "toks", "cum_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(re.toSet === got.toSet)
  }

  test("deterministic shards: dense per-shard positions, reproducible, a permutation") {
    val out = Sampling.deterministicShards(docs, "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 2000 && out.map(_._1).distinct.length === 2000)
    assert(out.forall(t => t._2 >= 0 && t._2 < 8))
    // positions within each shard are exactly 1..n (a permutation, no holes)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // pure function of the key: identical under a different partitioning
    val re = Sampling.deterministicShards(docs.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.toSet === out.toSet)
    // it is a shuffle: consecutive keys do not map to consecutive positions
    val byId = out.map(t => t._1 -> (t._2, t._3)).toMap
    val adjacentSameShardInOrder = (1L until 2000L).count { i =>
      byId(i)._1 == byId(i + 1)._1 && byId(i + 1)._2 == byId(i)._2 + 1
    }
    assert(adjacentSameShardInOrder < 50, s"order preserved too often: $adjacentSameShardInOrder")
  }

  test("exact-k per stratum: k from big strata, everything from small ones, deterministic") {
    val tiny = Seq((9999L, "ko"), (9998L, "ko")).toDF("doc_id", "lang")
    val all = docs.unionByName(tiny)
    val out = Sampling.exactKPerStratum(all, "lang", "doc_id", k = 25)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1)))
    val byLang = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLang("en") === 25 && byLang("fr") === 25)
    assert(byLang("ko") === 2) // smaller than k -> keep all
    // pre-shuffle group pruning: the rank filter lowers to WindowGroupLimit
    val plan = Sampling.exactKPerStratum(all, "lang", "doc_id", 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(500))
    // deterministic under repartitioning
    val re = Sampling.exactKPerStratum(all.repartition(11), "lang", "doc_id", 25)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(re.toSet === out.toSet)
  }

  test("alpha mixture: alpha=1 is proportional, alpha=0 equalizes, deterministic") {
    // docs: en 1334, fr 666 (i % 3)
    val nEn = 1334.0; val nFr = 666.0
    def byLang(alpha: Double, target: Long) =
      Sampling.alphaMixture(docs, "lang", "doc_id", alpha, target)
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha = 1: shares proportional to stratum sizes
    val prop = byLang(1.0, 300)
    assert(prop("en") === math.floor(300 * nEn / 2000 + 0.5).toLong)
    assert(prop("fr") === math.floor(300 * nFr / 2000 + 0.5).toLong)
    // alpha = 0: every stratum weighted 1 -> equal shares
    val eq = byLang(0.0, 300)
    assert(eq("en") === 150L && eq("fr") === 150L)
    // alpha = 0.5 flattens: fr's share rises vs proportional
    val mid = byLang(0.5, 300)
    assert(mid("fr") > prop("fr") && mid("en") < prop("en"))
    // k caps at the stratum size
    val all = byLang(0.5, 100000)
    assert(all("en") === 1334L && all("fr") === 666L)
    // deterministic under repartitioning, and a hash-order prefix
    val a = Sampling.alphaMixture(docs, "lang", "doc_id", 0.5, 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.alphaMixture(docs.repartition(17), "lang", "doc_id", 0.5, 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("weighted k-per-stratum: equals a brute-force A-ES replay of the same clocks") {
    // weights = doc_id % 50 + 1; brute force recomputes u from md5 exactly
    // as hashUniform does, applies the identical clock rounding, and takes
    // the k earliest per stratum — the operator must agree row-for-row
    val weighted = docs.withColumn("w", (col("doc_id") % 50 + 1).cast("long"))
    val got = Sampling.weightedKPerStratum(weighted, "lang", "doc_id", "w", k = 30)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
    }
    val brute = (1L to 2000L).map(i => (if (i % 3 == 0) "fr" else "en", i, i % 50 + 1))
      .groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
        rows.map { case (_, id, w) =>
          (id, math.floor(-math.log(u(id)) / w * 1e9 + 0.5) / 1e9)
        }.sortBy { case (id, t) => (t, id) }.take(30).map(p => (lang, p._1))
      }.toSet
    assert(got === brute)
    // and partitioning-independent
    val again = Sampling.weightedKPerStratum(
        weighted.repartition(17), "lang", "doc_id", "w", k = 30)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again === got)
  }

  test("weighted k-per-stratum: weight mass dominates selection; bad weights excluded") {
    // 10 rows with weight 10000 vs 1990 rows with weight 1: the heavy rows
    // have ~1e4× shorter expected clocks — all of them must be selected
    val heavyIds = (1L to 10L).toSet
    val weighted = docs.withColumn("w",
      when(col("doc_id") <= 10, 10000L).otherwise(1L))
    val got = Sampling.weightedKPerStratum(weighted, "lang", "doc_id", "w", k = 15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(heavyIds.subsetOf(got), s"heavy rows missing: ${heavyIds -- got}")
    // zero/negative/null weights never win a slot
    val guarded = docs.withColumn("w",
      when(col("doc_id") <= 5, lit(null).cast("long"))
        .when(col("doc_id") <= 10, -1L)
        .when(col("doc_id") <= 15, 0L).otherwise(1L))
    val sel = Sampling.weightedKPerStratum(guarded, "lang", "doc_id", "w", k = 2000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel.forall(_ > 15L) && sel.size === 2000 - 15)
  }

  test("stratified mixing applies per-stratum fractions") {
    val sampled = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.5, "fr" -> 0.05), defaultFraction = 0.0)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val en = byLang.getOrElse("en", 0L) / (2000.0 * 2 / 3)
    val fr = byLang.getOrElse("fr", 0L) / (2000.0 / 3)
    assert(math.abs(en - 0.5) < 0.08, s"en rate $en")
    assert(math.abs(fr - 0.05) < 0.05, s"fr rate $fr")
    assert(en > fr * 3, "mixing ratio not applied")
  }

  test("group split: no group straddles splits, fractions hold, order-free") {
    import org.apache.spark.sql.functions.{col, count_distinct}
    // 500 groups × 4 rows each
    val rows = (0 until 2000).map(i => ((i % 500).toLong, i)).toDF("g", "x")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.groupSplit(rows, "g", splits)
    // leakage: every group maps to exactly one split
    val straddlers = a.groupBy("g").agg(count_distinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddlers === 0L)
    // fractions approximately honored at the GROUP level
    val bydSplit = a.select("g", "split").distinct().groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bydSplit("train") / 500.0 - 0.8) < 0.06, bydSplit.toString)
    assert(bydSplit.values.sum === 500L) // nobody dropped at boundaries
    // partitioning-independent
    val b = Sampling.groupSplit(rows.repartition(13), "g", splits)
      .select("g", "split").distinct().orderBy("g").collect().toSeq
    val aRows = a.select("g", "split").distinct().orderBy("g").collect().toSeq
    assert(aRows === b)
    // malformed fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.groupSplit(rows, "g", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("purged time split: embargo band labeled, boundaries microsecond-exact") {
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2024-01-0${h / 24 + 1} ${h % 24}%02d:00:00")
    val rows = Seq(0, 10, 23, 24, 30, 47, 48, 50)
      .map(h => (h.toLong, ts(h))).toDF("id", "ts")
    // boundary = Jan 3 00:00 (h=48), embargo 1 day → train < h24, test ≥ h48
    val got = Sampling.purgedTimeSplit(rows, "ts",
        java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 86400000000L)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got(0L) === "train" && got(23L) === "train")
    assert(got(24L) === "embargo" && got(47L) === "embargo") // boundary-exact
    assert(got(48L) === "test" && got(50L) === "test")
  }

  test("rolling-origin folds: train/test membership per cut, embargo band emits nothing") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val rows = (1 to 20).map(d => (d.toLong, ts(d))).toDF("id", "ts")
    val cuts = Seq("2024-01-08", "2024-01-15")
      .map(c => java.sql.Timestamp.valueOf(s"$c 00:00:00"))
    val got = Sampling.rollingOriginFolds(rows, "ts", cuts,
        horizonMicros = 3L * 86400000000L, embargoMicros = 86400000000L)
      .select("id", "fold", "role").as[(Long, Long, String)].collect()
      .groupBy(_._2).map { case (f, xs) =>
        f -> xs.map(x => x._1 -> x._3).toMap }
    // fold 0 (cut Jan 8): train days 1-6 (day 7 noon is inside the 1-day
    // embargo), test days 8-10 (noon rows, horizon 3d)
    assert(got(0L) === ((1 to 6).map(_.toLong -> "train") ++
      (8 to 10).map(_.toLong -> "test")).toMap)
    // fold 1 (cut Jan 15): train 1-13, test 15-17
    assert(got(1L) === ((1 to 13).map(_.toLong -> "train") ++
      (15 to 17).map(_.toLong -> "test")).toMap)
  }

  test("curriculumInterleave: equal-width bands, round-robin global order, deterministic") {
    val docs2 = (1L to 800L).map(i => (i, i % 400L)).toDF("doc_id", "len")
    val got = Sampling.curriculumInterleave(docs2, "doc_id", "len", nBuckets = 8)
      .select("doc_id", "bucket", "global_ord").as[(Long, Long, Long)].collect()
    // bucket = floor(len*8 / (max+1)) with max = 399 → len / 50
    got.foreach { case (id, b, _) => assert(b === (id % 400L) / 50L, s"doc $id") }
    // within a bucket the orders are exactly {pos*8 + bucket : pos = 1..n}
    got.groupBy(_._2).foreach { case (b, xs) =>
      assert(xs.map(_._3).sorted.toSeq === (1 to xs.length).map(_ * 8L + b))
    }
    // global_ord is a total order and every 8-run of the merged sequence
    // cycles through distinct buckets (the round-robin property) while
    // all buckets still have rows at that depth
    assert(got.map(_._3).distinct.length === got.length)
    val first16 = got.sortBy(_._3).take(16).map(_._2)
    assert(first16.take(8).distinct.length === 8)
    val again = Sampling.curriculumInterleave(docs2.repartition(11), "doc_id", "len", 8)
      .select("doc_id", "bucket", "global_ord").as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
  }

  test("stratifiedKFold: per-stratum balance within 1, disjoint cover, deterministic") {
    // 47 en + 13 fr: no k divides either, so balance ±1 is the real test
    val rows = ((1L to 47L).map((_, "en")) ++ (48L to 60L).map((_, "fr")))
      .toDF("doc_id", "lang")
    val got = Sampling.stratifiedKFold(rows, "lang", "doc_id", k = 5)
      .select("doc_id", "lang", "fold").as[(Long, String, Long)].collect()
    assert(got.length === 60 && got.map(_._1).distinct.length === 60)
    got.groupBy(_._2).foreach { case (lang, xs) =>
      val sizes = xs.groupBy(_._3).view.mapValues(_.size).values
      assert(xs.map(_._3).toSet.subsetOf((0L until 5L).toSet))
      assert(sizes.max - sizes.min <= 1, s"$lang folds unbalanced: $sizes")
    }
    val again = Sampling.stratifiedKFold(rows.repartition(9), "lang", "doc_id", 5)
      .select("doc_id", "fold").as[(Long, Long)].collect().toMap
    assert(got.map(x => x._1 -> x._3).toMap === again)
  }

  test("importanceWeights: exact ratio weights, uniform case is all-1 with ESS = n") {
    // src: 60 en / 20 fr; tgt: 10 en / 10 fr → w_en = (0.5)/(0.75) = 2/3, w_fr = 2
    val src = (Seq.fill(60)("en") ++ Seq.fill(20)("fr")).zipWithIndex
      .map { case (l, i) => (i.toLong, l) }.toDF("id", "lang")
    val tgt = (Seq.fill(10)("en") ++ Seq.fill(10)("fr")).zipWithIndex
      .map { case (l, i) => (i.toLong, l) }.toDF("id", "lang")
    val got = Sampling.importanceWeights(src, tgt, "lang")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("en")._1 === 60L && got("en")._2 === 10L)
    assert(math.abs(got("en")._3 - 2.0 / 3.0) < 1e-12)
    assert(math.abs(got("fr")._3 - 2.0) < 1e-12)
    // ESS = (60·2/3 + 20·2)² / (60·4/9 + 20·4) = 6400/320 = 60
    assert(math.abs(got("en")._4 - 60.0) < 1e-9)
    // identical distributions → every w = 1, ESS = n
    val self = Sampling.importanceWeights(src, src, "lang")
      .collect().map(r => (r.getDouble(3), r.getDouble(4)))
    self.foreach { case (w, ess) =>
      assert(math.abs(w - 1.0) < 1e-12 && math.abs(ess - 80.0) < 1e-9)
    }
  }

  test("paddingWaste: exact batch accounting; sorted batching never wastes more than hash") {
    // 64 docs, lengths 1..64, batch 32: sorted batches are [1..32] and
    // [33..64] → waste = Σ(32·max − sum) computed by hand
    val docs3 = (1L to 64L).map(i => (i, i)).toDF("doc_id", "toks")
    val got = Sampling.paddingWaste(docs3, "doc_id", "toks", batchSize = 32)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val (nb, tot, pad, frac) = got("sorted")
    assert(nb === 2L && tot === (1L to 64L).sum)
    // batch 1: 32·32 − Σ1..32 = 1024 − 528 = 496; batch 2: 32·64 − Σ33..64 = 2048 − 1552 = 496
    assert(pad === 992L)
    assert(math.abs(frac - 992.0 / (992.0 + 2080.0)) < 1e-12)
    assert(got("hash")._2 === tot)
    assert(got("sorted")._3 <= got("hash")._3,
      s"sorted ${got("sorted")._3} should not exceed hash ${got("hash")._3}")
    // partial last batch pads to ITS OWN size, not the full 32
    val tiny = (1L to 3L).map(i => (i, 10L * i)).toDF("doc_id", "toks")
    val t = Sampling.paddingWaste(tiny, "doc_id", "toks", 32)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // one batch of 3, max 30: padded = 3·30 − 60 = 30
    assert(t("sorted") === 30L && t("hash") === 30L)
  }

  test("neymanAllocation: hand weights, zero-variance stratum gets zero") {
    // A: 4 rows {0,0,10,10} → sd 5, weight 4·5 = 20
    // B: 8 rows alternating {0,8} → sd 4, weight 8·4 = 32
    // C: constant → sd 0 → allocation 0
    val rows = Seq.fill(2)(("A", 0L)) ++ Seq.fill(2)(("A", 10L)) ++
      (1 to 8).map(i => ("B", if (i % 2 == 0) 8L else 0L)) ++
      Seq.fill(5)(("C", 7L))
    val got = Sampling.neymanAllocation(rows.toDF("s", "v"), "s", "v", budget = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got("A")._1 === 4L && got("A")._2 === 5.0)
    assert(got("B")._2 === 4.0)
    assert(got("C")._2 === 0.0 && got("C")._4 === 0L)
    // n_alloc = round(100·20/52) = 38, round(100·32/52) = 62
    assert(got("A")._4 === 38L && got("B")._4 === 62L)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-12) // shares total 1
  }

  test("neymanAllocation: bit determinism under repartitioning") {
    val rng = new scala.util.Random(7)
    val df = (1 to 500).map(_ => (s"s${rng.nextInt(5)}", rng.nextInt(1000).toLong))
      .toDF("s", "v")
    def bits(p: Int) = Sampling.neymanAllocation(df.repartition(p), "s", "v", 1000L)
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case v => v
      }).sortBy(_.mkString("|")).toSeq
    assert(bits(1) === bits(9))
  }
}
