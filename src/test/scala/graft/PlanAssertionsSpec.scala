package graft

import org.apache.spark.sql.functions.broadcast

/** Plan-shape regression guards: the properties PLANS.md documents, held by
  * assertion so a refactor can't silently regress them (extra shuffles,
  * lost pushdown, broadcast falling back to sort-merge).
  */
class PlanAssertionsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_s1: predicates and projection reach the parquet scan") {
    val p = plan("q_s1_scan_filter_project")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("EqualTo(l_returnflag,R)"))
    assert(p.contains("GreaterThanOrEqual(l_qu")) // toString truncates the list tail
    // projection pruned to the 5 needed columns — the wide ones are absent
    assert(!p.contains("l_shipdate") && !p.contains("l_tax"))
  }

  test("flagship: exactly one hash-partitioning exchange, orders broadcast") {
    val p = plan("q_flagship_rank")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("dim lookups stay broadcast, never sort-merge") {
    Seq("q_j3_dim_lookup_default", "q_p8_encode_dim").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast join")
      assert(!p.contains("SortMergeJoin"), s"$q fell back to sort-merge")
    }
  }

  test("top-k lowers to TakeOrderedAndProject (no global sort)") {
    assert(plan("q_o3_topk").contains("TakeOrderedAndProject"))
  }

  test("group-bys keep map-side partial aggregation") {
    val p = plan("q_dedup_exact")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final pair missing")
  }

  test("whole-stage codegen covers the scan->project pipelines") {
    // codegen stages render as "*(n)" prefixes in the plan string
    assert(plan("q_p5_scalar_guards").contains("*(1)"))
  }

  test("bucketed pair pipelines keep the pre-expansion repartition (PLANS.md pattern)") {
    // the C(bucket,2) expansion must stay parallel: the explicit-count
    // round-robin exchange before it must survive optimization — if AQE
    // or a refactor folds it away, the quadratic step runs on one core
    Seq("q_winnowing_pairs", "q_simhash_neardup").foreach { q =>
      val p = plan(q)
      assert(p.contains("RoundRobinPartitioning"),
        s"$q lost the pre-expansion repartition:\n${p.take(800)}")
    }
  }

  test("narrow per-document queries plan with no exchange at all") {
    // PII scan/redaction is a pure per-row map — any shuffle is a regression
    val p = plan("q_text_pii")
    assert(!p.contains("Exchange"), s"q_text_pii grew a shuffle:\n${p.take(800)}")
  }

  test("vocab top-grams lowers to TakeOrderedAndProject over a partial/final aggregate") {
    val p = plan("q_vocab_topgrams")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side combine missing")
  }

  test("decontamination never plans a nested-loop/cartesian join") {
    val p = plan("q_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"gram join degenerated:\n${p.take(800)}")
    // and no forced hint: the benchmark side is AQE's choice. ResolvedHint
    // nodes are folded into the Join's JoinHint before optimization ends,
    // so the detectable trace of a forced broadcast is "strategy=broadcast"
    // in the join hint — proven non-vacuous by the canary below.
    val canary = spark.range(10).toDF("k")
      .join(broadcast(spark.range(5).toDF("k")), Seq("k"))
      .queryExecution.optimizedPlan.toString
    assert(canary.contains("strategy=broadcast"), s"hint-detection canary broke:\n$canary")
    val lp = SparkEntry.queries("q_decontaminate")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!lp.contains("strategy=broadcast"))
  }

  test("substring dedup / LM scoring: gram-keyed joins, never nested-loop/cartesian") {
    // both pipelines join corpus-mass streams to (hash|gram)-keyed tables:
    // any cartesian/BNLJ means a join key was lost in a refactor — except
    // lmScore's single broadcast of the 1-row vocabulary-size aggregate,
    // the repo's sanctioned cross-join shape
    Seq("q_substring_dedup", "q_substring_scrub", "q_lm_score").foreach { q =>
      val p = plan(q)
      val bnljAllowed = if (q == "q_lm_score") 1 else 0
      assert(!p.contains("CartesianProduct") &&
        "BroadcastNestedLoopJoin".r.findAllIn(p).size <= bnljAllowed,
        s"$q degenerated:\n${p.take(800)}")
      assert("HashAggregate".r.findAllIn(p).size >= 2, s"$q lost map-side combine")
    }
  }

  test("funnel: chained stage windows share one user-keyed exchange, no self-joins") {
    val p = plan("q_event_funnel")
    // one user-keyed shuffle feeds all three stage windows; the second
    // hash exchange is the multi-count-distinct expand dedup — inherent to
    // three DISTINCT aggregates, not a per-stage cost
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"stage windows stopped sharing the user shuffle:\n${p.take(1200)}")
    assert(!p.contains("Join"), "funnel regressed to self-joins")
  }

  test("per-group top-k lowers to WindowGroupLimit (pre-shuffle group pruning)") {
    val p = plan("q_o5_topk_per_group")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter no longer pushes the per-group limit below the window:\n${p.take(800)}")
  }

  test("range joins plan as bucket equi-joins, never nested-loop/cartesian") {
    Seq("q_range_join", "q_interval_join").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a cross product:\n${p.take(800)}")
    }
  }

  test("semi/anti key joins carry no forced broadcast; degrade to shuffle past the threshold") {
    val df = spark.range(10000).toDF("k")
    val keys = spark.range(5000).toDF("k")
    val semi = graft.ops.Joins.semiJoinByKeys(df, keys, Seq("k"))
    val anti = graft.ops.Joins.antiJoinByKeys(df, keys, Seq("k"))
    // no forced hint in the logical plan — the strategy choice is left to
    // cost (AQE upgrades to broadcast only when the side is actually
    // small). Hints fold into the Join's JoinHint ("strategy=broadcast"),
    // never surviving as ResolvedHint nodes — the decontamination test
    // holds the canary proving this pattern detects forced hints.
    assert(!semi.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"))
    assert(!anti.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"))
    // simulate "key side past the broadcast threshold": with auto-broadcast
    // off, the join must plan as a shuffled join, not insist on broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = graft.ops.Joins.semiJoinByKeys(df, keys, Seq("k"))
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"), s"forced broadcast survived:\n${p.take(800)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("star join: dimension chain broadcasts, at most one fact-side exchange") {
    val p = plan("q_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"dimension chain not broadcast:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin"), "a dimension join fell back to sort-merge")
    // the only shuffle is the final groupBy (at this SF orders broadcasts
    // too); the fact table is never exchanged for the joins themselves
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1)
  }

  test("bloom semi join: might_contain filters the probe BEFORE the join exchange") {
    val p = plan("q_bloom_semi_join")
    // the probe-side scan stage carries the bloom predicate (narrow,
    // codegen'd) — pruning happens upstream of the semi join, so the
    // exchange ships only probable matches
    val filterIdx = p.indexOf("might_contain")
    val joinIdx = math.max(p.indexOf("SortMergeJoin"), p.indexOf("ShuffledHashJoin")) max p.indexOf("BroadcastHashJoin")
    assert(filterIdx >= 0, s"bloom predicate missing:\n${p.take(800)}")
    assert(joinIdx >= 0, "confirming semi join missing")
    // executed plans print top-down: the join node appears before (above)
    // the probe-side filter that feeds it
    assert(p.substring(joinIdx).contains("might_contain"),
      "bloom filter is not on the join's input side")
    assert(p.contains("LeftSemi"), "confirming join is not a semi join")
  }

  test("intersect/except plan as aggregate + semi/anti join, never a cross product") {
    val pi = plan("q_set_intersect")
    val pe = plan("q_set_except")
    assert(pi.contains("LeftSemi"), s"intersect not a semi join:\n${pi.take(600)}")
    assert(pe.contains("LeftAnti"), s"except not an anti join:\n${pe.take(600)}")
    Seq(pi, pe).foreach { p =>
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
      assert(p.contains("HashAggregate"), "distinct-semantics aggregate missing")
    }
  }

  test("exact-percentile queries never plan the Percentile value-map aggregate") {
    // Percentile builds a value→count hash map merged driver-side — the
    // known memory cliff on wide-cardinality columns. The sanctioned exact
    // path is the range-partitioned sort (Aggregates.sortedPercentilesMulti)
    Seq("q_quantile_bins", "q_a4_quantiles", "q_mad_outliers", "q_corpus_stats").foreach { q =>
      val p = plan(q)
      assert(!p.contains("percentile("),
        s"$q ships the Percentile aggregate:\n${p.take(800)}")
    }
  }

  test("triangle counting: no cartesian/nested-loop join, intersection stage computed once") {
    val p = plan("q_graph_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle join degenerated:\n${p.take(800)}")
    // the adjacency intersection runs before an eager checkpoint, so the
    // final plan reads it back (Scan ExistingRDD) for all three corner
    // projections instead of recomputing the join 3×; the third corner is
    // the exploded intersection array — no wedge self-join anywhere
    assert(p.contains("Scan ExistingRDD"), s"checkpoint reuse missing:\n${p.take(800)}")
    assert(p.contains("Generate explode"), s"corner attribution missing:\n${p.take(800)}")
  }

  test("resample: grid expansion is narrow (explode, no extra exchange) and the fill is one window") {
    val p = plan("q_resample_ffill")
    assert(p.contains("Generate explode"), s"sequence/explode grid missing:\n${p.take(800)}")
    // per-key join + per-key window: hash exchanges only, no global sort
    assert(!p.contains("rangepartitioning"), "resample grew a global sort")
  }

  test("grouped quantiles / gini: ONE sort pass, both windows share a single exchange") {
    Seq("q_group_quantiles", "q_gini_concentration").foreach { q =>
      val p = plan(q)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges <= 2, s"$q: expected collapse+window exchanges only:\n${p.take(900)}")
      assert("Sort ".r.findAllIn(p).size <= 1, s"$q re-sorts between windows:\n${p.take(900)}")
      assert(!p.contains("percentile("), s"$q ships the Percentile aggregate")
    }
  }

  test("psi drift: decile boundaries are literals — no quantile machinery in the plan") {
    val p = plan("q_psi_drift")
    assert(!p.contains("percentile("), s"Percentile aggregate leaked into PSI:\n${p.take(800)}")
    // binning is a pure projection: the corpus-mass aggregate keys on (seg, bin)
    assert(p.contains("HashAggregate"), "psi lost its count aggregate")
  }

  test("target encode: category-stats join carries no forced broadcast hint") {
    val lp = SparkEntry.queries("q_target_encode")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!lp.contains("ResolvedHint"), s"forced broadcast on a growing stats table:\n${lp.take(800)}")
  }

  test("sketch cube: partial HLL sketches merge map-side before the exchange") {
    val p = plan("q_sketch_cube")
    assert(p.contains("partial_hll_sketch_agg"),
      s"fine-grain sketch aggregate lost its map-side partial:\n${p.take(900)}")
  }

  test("attribution: entity-key equi-join with post-join range filter, never a theta join") {
    Seq("q_attribution_ushape", "q_attribution_channels").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q planned the lookback range as a theta join:\n${p.take(800)}")
    }
  }

  test("hard negatives: band filter prunes below the ranking window (WindowGroupLimit both sides)") {
    val p = plan("q_hard_negatives")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"per-query k-limit no longer prunes before the exchange:\n${p.take(900)}")
  }

  test("kappa: one corpus-mass aggregate; marginals assemble via broadcast") {
    val p = plan("q_lang_agreement_kappa")
    assert(!p.contains("SortMergeJoin"),
      s"label-bounded marginal join regressed to sort-merge:\n${p.take(900)}")
  }

  test("containment pairs: gram-keyed joins only, never nested-loop/cartesian") {
    val p = plan("q_containment_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"containment candidates degenerated to a cross product:\n${p.take(800)}")
  }

  test("seasonal decompose: the dow-seasonal join back is broadcast, not sort-merge") {
    val p = plan("q_seasonal_decompose")
    assert(!p.contains("SortMergeJoin"),
      s"taxonomy-bounded seasonal table regressed to sort-merge:\n${p.take(900)}")
  }

  test("quality mix: one narrow filter + one aggregate — no join, no window, " +
      "single shuffle") {
    val p = plan("q_quality_mix")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"acceptance sampling grew a join/window:\n${p.take(800)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"expected exactly the aggregate's shuffle:\n${p.take(800)}")
  }

  test("cluster split: the assignment adds no shuffle beyond the dedup " +
      "pipeline's own (one left join back, no cartesian)") {
    val p = plan("q_cluster_split")
    assert(!p.contains("CartesianProduct"),
      s"cluster attach degenerated to a cross product:\n${p.take(800)}")
    // the split label itself must be a projection, not a window/sort
    assert(!p.contains("Window"),
      s"split assignment planned as a window:\n${p.take(800)}")
  }

  test("corpus pipeline: ledger counts assemble via 1-row broadcast crosses; " +
      "no data-sized cartesian anywhere") {
    val p = plan("q_corpus_pipeline")
    assert(!p.contains("CartesianProduct"),
      s"a pipeline stage planned a cartesian product:\n${p.take(900)}")
  }

  test("compaction plan: offset joins broadcast, no per-group global window") {
    // the PrefixScan range exchange itself sits behind the scan's
    // localCheckpoint (PrefixScanSpec pins that shape); what must hold
    // HERE is that everything downstream is broadcast joins + one
    // map-side-combined aggregate — no window, no sort-merge, no cross
    val p = plan("q_compaction_plan")
    assert(p.contains("BroadcastHashJoin"),
      s"offset join fell back from broadcast:\n${p.take(900)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"compaction grew a data-sized join:\n${p.take(900)}")
    // exactly THREE windows: PrefixScan's per-__pid local cumsum (parallel
    // by construction) + its numPartitions-row offset scan + the
    // |groups|-row group-offset scan. The per-row bin itself must stay a
    // narrow projection — a 4th window means someone rewrote it as a
    // per-group running total again.
    val windows = "Window ".r.findAllIn(p).size
    assert(windows === 3,
      s"expected the 3 PrefixScan/offset windows, got $windows:\n${p.take(900)}")
    assert(p.contains("Window [sum(n_chars"),
      s"local cumsum window missing:\n${p.take(900)}")
  }

  test("privacy audits: single aggregate shape — no join, no window") {
    Seq("q_k_anonymity", "q_dp_noise").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join:\n${p.take(600)}")
      assert(!p.contains("Window"), s"$q grew a window:\n${p.take(600)}")
    }
  }

  test("silhouette: zero shuffles before the |k|-row cluster aggregate") {
    // the O(n·k) centroid scan is a narrow fold; the ONLY exchange is the
    // final per-cell aggregate (+ its partial/final HashAggregate pair)
    val p = plan("q_silhouette")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles === 1, s"silhouette grew shuffles ($shuffles):\n${p.take(900)}")
    assert(!p.contains("Join"), s"silhouette grew a join:\n${p.take(600)}")
  }

  test("acf: banded self-join is a hash join, never nested-loop/cartesian") {
    val p = plan("q_acf")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"acf pair generation degenerated:\n${p.take(900)}")
  }

  test("woe/iv and brier: bounded-table windows, no data-sized join") {
    Seq("q_woe_iv", "q_brier_decomp").foreach { q =>
      val p = plan(q)
      // the only join allowed is the 1-row extent broadcast (woe);
      // a sort-merge join on data would be a regression
      assert(!p.contains("SortMergeJoin"), s"$q grew a sort-merge join:\n${p.take(700)}")
    }
  }

  test("logreg step: weights ride a broadcast, never a shuffled join") {
    val p = plan("q_logreg_step")
    assert(!p.contains("SortMergeJoin"), s"weights join regressed:\n${p.take(700)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side partials missing")
  }

  test("frame plan: pure generator — no shuffle at all") {
    val p = plan("q_frame_plan")
    assert(!p.contains("Exchange"), s"q_frame_plan grew a shuffle:\n${p.take(700)}")
    assert(p.contains("Generate"), "explode generator missing")
  }

  test("isotonic: ONE fact-table scan; everything after the collapse is metadata-sized") {
    val p = plan("q_isotonic_fit")
    // the corpus is read exactly once, INSIDE the checkpointed collapse;
    // the minimax block algebra downstream must source only the
    // materialized ≤m-row cell table, never the parquet scan again
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 0, s"isotonic re-scanned the corpus ($scans scans):\n${p.take(900)}")
    assert(p.contains("ExistingRDD"), s"checkpointed cell table missing:\n${p.take(900)}")
    assert(!p.contains("CartesianProduct"), s"block join degenerated:\n${p.take(900)}")
  }

  test("jaro-winkler verify: native expression inside codegen, no cartesian") {
    val df = SparkEntry.queries("q_jaro_winkler")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the expression prints as jarowinklerexpr(...) INSIDE a codegen'd
    // projection -- a UDF would show up as BatchEvalPython/ScalaUDF
    assert(p.toLowerCase.contains("jarowinkler"), s"native expr missing:\n${p.take(900)}")
    assert(!p.contains("ScalaUDF"), "fuzzy compare regressed to a UDF")
    assert(!p.contains("CartesianProduct"), s"SNM blocking broke:\n${p.take(900)}")
  }

  test("cuped: one fact pass -- per-arm moments + window, no second scan") {
    val p = plan("q_cuped")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"cuped re-scanned events ($scans):\n${p.take(900)}")
    assert(!p.contains("SortMergeJoin"), s"pooled moments grew a join:\n${p.take(700)}")
  }

  test("bh-fdr: windows run over the |tests| table, fact scanned once") {
    val p = plan("q_bh_fdr")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"bh sweep re-scanned events ($scans):\n${p.take(900)}")
    assert(!p.contains("Join"), s"bh grew a join:\n${p.take(700)}")
  }

  test("temperature scan and robust means: one fact scan each") {
    Seq("q_temp_scaling", "q_robust_mean").foreach { q =>
      val p = plan(q)
      val scans = "Scan parquet".r.findAllIn(p).size
      assert(scans === 1, s"$q re-scanned the fact table ($scans):\n${p.take(900)}")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q grew a data-sized join:\n${p.take(700)}")
    }
  }

  test("covariate balance: single 1-row aggregate, no join, no window") {
    val p = plan("q_covariate_balance")
    assert(!p.contains("Join"), s"balance grew a join:\n${p.take(700)}")
    assert(!p.contains("Window "), s"balance grew a window:\n${p.take(700)}")
  }

  test("heaps law: doc-bounded windows + PrefixScan, no cartesian") {
    val p = plan("q_heaps_law")
    assert(!p.contains("CartesianProduct"), s"heaps degenerated:\n${p.take(800)}")
    // every BNLJ here is a ≤10-row broadcast (N total, checkpoint table,
    // fit row, PrefixScan offsets) — the count pins that no DATA-sized
    // side ever rides one
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 5,
      s"checkpoint joins regressed:\n${p.take(800)}")
  }

  test("negative sampling: bucketized interval join, never nested-loop") {
    val p = plan("q_negative_samples")
    assert(!p.contains("CartesianProduct"), s"interval join degenerated:\n${p.take(800)}")
    // crossJoin(broadcast(total)) is the single sanctioned 1-row BNLJ
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"draw resolution regressed:\n${p.take(800)}")
  }

  test("rank tests: one fact scan, windows over the distinct-value collapse") {
    val pm = plan("q_mann_whitney")
    assert("Scan parquet".r.findAllIn(pm).size === 1,
      s"mann-whitney re-scanned events:\n${pm.take(900)}")
    assert(!pm.contains("Join"), s"mann-whitney grew a join:\n${pm.take(700)}")
    // brown-forsythe checkpoints the (g, v) collapse (its parquet scan is
    // behind the RDD scan), so pin the join discipline instead: the
    // median joins back broadcast, never sort-merge
    val pb = plan("q_brown_forsythe")
    assert(!pb.contains("SortMergeJoin") && !pb.contains("CartesianProduct"),
      s"brown-forsythe's median join degenerated:\n${pb.take(700)}")
  }

  test("gini stump + zone-map audit: stacked explode, bounded scans") {
    val ps = plan("q_gini_stump")
    assert("Scan parquet".r.findAllIn(ps).size === 1,
      s"stump re-scanned the fact table:\n${ps.take(900)}")
    assert(ps.contains("Generate explode"), s"stump lost the stacking:\n${ps.take(700)}")
    // zonemap is collect-stats-then-broadcast: exactly TWO scans (the
    // 1-row min/max pass + the data pass), never more
    val pz = plan("q_zonemap_prune")
    assert("Scan parquet".r.findAllIn(pz).size === 2,
      s"zonemap scan count moved:\n${pz.take(900)}")
    assert(pz.contains("Generate explode"), s"zonemap lost the stacking:\n${pz.take(700)}")
    Seq(ps, pz).foreach(p =>
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"data-sized join appeared:\n${p.take(700)}"))
  }

  test("naive bayes: labels broadcast, model joined on the term key") {
    val p = plan("q_nb_classify")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"label table lost its broadcast:\n${p.take(900)}")
    assert(!p.contains("CartesianProduct"),
      s"apply went cartesian:\n${p.take(700)}")
  }

  test("mase + weibull: one fact pass, no data-sized join") {
    val pm = plan("q_mase")
    assert("Scan parquet".r.findAllIn(pm).size === 1,
      s"mase re-scanned events:\n${pm.take(900)}")
    assert(!pm.contains("Join"), s"mase grew a join:\n${pm.take(700)}")
    // weibull joins only metadata-sized tables (KM cells, moment rows)
    val pw = plan("q_weibull_fit")
    assert(!pw.contains("SortMergeJoin") && !pw.contains("CartesianProduct"),
      s"weibull grew a data-sized join:\n${pw.take(700)}")
  }

  test("journey surprise: model joins back broadcast, never sort-merge") {
    val p = plan("q_journey_surprise")
    assert(p.contains("BroadcastHashJoin"),
      s"the |types|² model lost its broadcast:\n${p.take(900)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"scoring join degenerated:\n${p.take(700)}")
  }

  test("anderson-darling: ksDrift grid shape — no sort-merge, no cartesian") {
    val p = plan("q_anderson_darling")
    assert(!p.contains("SortMergeJoin"),
      s"the sample×value grid stopped broadcasting:\n${p.take(900)}")
    assert(!p.contains("CartesianProduct"), s"grid degenerated:\n${p.take(700)}")
  }

  test("label noise: no cartesian; top-20 lowers to TakeOrderedAndProject") {
    // the winner-vs-actual stage is a doc-grain × doc-grain equi-join —
    // co-partitioned sort-merge is the CORRECT shape there (both sides
    // already hash on doc_id from the window/group upstream); the pins
    // here are the degenerate shapes
    val p = plan("q_label_noise")
    assert(!p.contains("CartesianProduct"),
      s"scoring went cartesian:\n${p.take(900)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"the rounded-rank cut lost its top-k lowering:\n${p.take(900)}")
  }

  test("damerau verify: native expression inside codegen, no cartesian") {
    val df = SparkEntry.queries("q_damerau_verify")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dameraulevenshtein"),
      s"native expr missing:\n${p.take(900)}")
    assert(!p.contains("ScalaUDF"), "edit distance regressed to a UDF")
    assert(!p.contains("CartesianProduct"),
      s"candidate blocking broke:\n${p.take(900)}")
  }

  test("markov attribution: one fact scan; sweeps never go data-sized") {
    val p = plan("q_markov_attribution")
    // the journey window + |states|² count ran BEFORE the checkpoints,
    // so the readout plan holds only ExistingRDD metadata — zero parquet
    // re-scans is exactly the "sweeps never touch the corpus" property
    assert("Scan parquet".r.findAllIn(p).isEmpty,
      s"a sweep re-scanned events:\n${p.take(900)}")
    assert(!p.contains("CartesianProduct"),
      s"a sweep went cartesian:\n${p.take(700)}")
    assert(!p.contains("SortMergeJoin"),
      s"metadata readout fell to sort-merge:\n${p.take(700)}")
  }

  test("bleu pairs: counts join on the shared (id, n, gram) key, no cartesian") {
    val p = plan("q_bleu_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"bleu grew an unbounded join:\n${p.take(900)}")
    assert(p.contains("Generate explode"),
      s"the n-gram generator disappeared:\n${p.take(700)}")
  }

  test("logrank + pettitt: windows over bounded grids, no data-sized join") {
    val pl = plan("q_logrank")
    assert(!pl.contains("CartesianProduct"),
      s"logrank grew a cartesian:\n${pl.take(900)}")
    // the arms×times grid builds from broadcastable sides
    assert(pl.contains("BroadcastHashJoin") ||
      pl.contains("BroadcastNestedLoopJoin"),
      s"the pooled-time grid lost its broadcast:\n${pl.take(900)}")
    val pp = plan("q_pettitt")
    assert("Scan parquet".r.findAllIn(pp).size === 1,
      s"pettitt re-scanned events:\n${pp.take(900)}")
    assert(!pp.contains("CartesianProduct"))
  }

  test("retrieval pipeline: candidate-bounded composition, corpus scanned before the checkpoints") {
    val p = plan("q_retrieval_pipeline")
    // every stage past the tokenize+collapse reads checkpointed
    // candidate tables (≤100 rows/query) — the readout plan holds ONE
    // parquet scan (the 00_n_docs corpus count; tokenization ran before
    // the checkpoints) and its only cross joins are the 1-row ledger
    // broadcasts
    assert("Scan parquet".r.findAllIn(p).size <= 1,
      s"a retrieval stage re-scanned the corpus:\n${p.take(900)}")
    assert(!p.contains("CartesianProduct"),
      s"fusion or the F1 gate went cartesian:\n${p.take(900)}")
    // the ONLY sort-merge is retrievalMetrics' |queries|-row full-outer
    // (3 rows per side; Spark cannot broadcast-hash a full outer) —
    // anything more means a candidate-sized join fell out of broadcast
    val smj = "SortMergeJoin".r.findAllIn(p).size
    assert(smj <= 1, s"$smj sort-merge joins (expected ≤1, the metrics " +
      s"full-outer):\n${p.take(900)}")
  }

  test("HITS iteration step reuses the pre-partitioned cached edge copy") {
    // hitsScores persists the edge list twice (by src / by dst) so the
    // alternating per-sweep joins never re-exchange edge mass; this pins
    // the step shape: scores derived from the src-partitioned copy join
    // it exchange-free, leaving only the dst-side aggregate shuffle.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = (1L to 200L).map(i => (i % 20, (i * 7) % 23)).toDF("src", "dst")
    val eBySrc = e.distinct().repartition(col("src")).cache()
    try {
      eBySrc.count()
      val hubs = eBySrc.select(col("src")).distinct().withColumn("h", lit(1L))
      val step = eBySrc.join(hubs, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("h")).as("a"))
      val ep = step.queryExecution.executedPlan
      val tree = ep match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      assert(tree.toString.contains("InMemoryTableScan"), tree.toString.take(800))
      // count REAL exchange nodes in the step (the cached relation's
      // build-time shuffles print in toString but are not re-executed):
      // ≤2 = (at most) one score-side exchange + the dst aggregate; a
      // third would mean the cached src-partitioned copy re-shuffled
      val shuffles = tree.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      assert(shuffles <= 2,
        s"HITS step re-exchanges the edge copy ($shuffles shuffles):\n${tree.toString.take(1200)}")
    } finally eBySrc.unpersist()
  }
}
