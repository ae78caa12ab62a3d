package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clipped n-gram precision (BLEU, Papineni et al. 2002) over aligned
  * (candidate, reference) text pairs — the reference-overlap score a
  * training-data pipeline runs wherever two text columns are supposed to
  * say the same thing: distillation outputs vs teacher text, round-trip
  * translations, OCR re-reads, paraphrase mining over near-dup clusters.
  * Complements the dedup family's set similarity (Jaccard/containment
  * ignore order and multiplicity; BLEU's clipped multiset precision with
  * a brevity penalty is the asymmetric "does the candidate RECONSTRUCT
  * the reference" reading).
  *
  *   p_n  = Σ_g min(c_cand(g), c_ref(g)) / Σ_g c_cand(g)   (per n ≤ N)
  *   BP   = 1 if len_c ≥ len_r else exp(1 − len_r/len_c)
  *   BLEU = BP · exp(Σ_n ln p_n / N), 0 when any p_n = 0 or undefined
  *
  * Exactness: whitespace tokens (the corpus-wide `split(_, " ")` ≡
  * `string_split` contract, empty tokens included); all gram counts and
  * lengths are exact longs from per-(pair, n) aggregates; each p_n is
  * one division of exact operands and BP/BLEU are fixed per-row IEEE
  * expressions (ln/exp once per pair — callers qround).
  *
  * Scale shape: the n-gram generators are narrow per-row transforms
  * (×|text| rows, the chunker scale class); each side collapses in ONE
  * map-side-combined (pair, n, gram) count; the clip is a LEFT join on
  * that shared key (co-partitioned by construction) plus a per-(pair, n)
  * aggregate; a ≤maxN-wide conditional pivot ends it. Nothing is
  * collected, nothing all-pairs — pairing is the CALLER's join.
  */
object Bleu {

  /** `pairs`: one row per (idCol, candCol text, refCol text). Returns
    * (idCol, len_c, len_r, p1..pN, bp, bleu).
    */
  def bleuPairs(pairs0: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 4, s"maxN in [1, 4], got $maxN")
    val pairs = pairs0
      .filter(col(idCol).isNotNull && col(candCol).isNotNull &&
        col(refCol).isNotNull)
      .select(col(idCol).as("id"), split(col(candCol), " ").as("cw"),
        split(col(refCol), " ").as("rw"))
      .localCheckpoint(false) // lens + both gram explodes share it
    def grams(arr: Column, n: Int): Column =
      when(size(arr) >= n,
        transform(sequence(lit(1), size(arr) - n + 1),
          i => array_join(slice(arr, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    def gramCounts(arrCol: String, cntName: String): DataFrame =
      (1 to maxN).map { n =>
        pairs.select(col("id"), lit(n).as("n"),
            explode(grams(col(arrCol), n)).as("gram"))
          .groupBy("id", "n", "gram").agg(count(lit(1)).as(cntName))
      }.reduce(_ unionByName _)
    val clipped = gramCounts("cw", "cnt_c")
      .join(gramCounts("rw", "cnt_r"), Seq("id", "n", "gram"), "left")
      .groupBy("id", "n")
      .agg(sum(least(col("cnt_c"), coalesce(col("cnt_r"), lit(0L))))
          .as("clip"),
        sum(col("cnt_c")).as("tot"))
    val pivotAggs = (1 to maxN).flatMap(n => Seq(
      max(when(col("n") === n, col("clip"))).as(s"clip$n"),
      max(when(col("n") === n, col("tot"))).as(s"tot$n")))
    val wide = clipped.groupBy("id").agg(pivotAggs.head, pivotAggs.tail: _*)
    val lens = pairs.select(col("id"),
      size(col("cw")).cast("long").as("len_c"),
      size(col("rw")).cast("long").as("len_r"))
    val ps = (1 to maxN).map(n =>
      when(coalesce(col(s"tot$n"), lit(0L)) > 0,
        coalesce(col(s"clip$n"), lit(0L)).cast("double") / col(s"tot$n")))
    val allPos = ps.map(p => p.isNotNull && p > 0).reduce(_ && _)
    val logMean = ps.map(log(_)).reduce(_ + _) / maxN
    val bp = when(col("len_c") >= col("len_r"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("len_r").cast("double") / col("len_c")))
    val pCols = ps.zipWithIndex.map { case (p, i) => p.as(s"p${i + 1}") }
    lens.join(wide, Seq("id"), "left")
      .select(Seq(col("id").as(idCol), col("len_c"), col("len_r")) ++
        pCols ++ Seq(bp.as("bp"),
          when(allPos, bp * exp(logMean)).otherwise(lit(0.0)).as("bleu")): _*)
  }
}
