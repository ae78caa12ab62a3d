package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection:
  * shingle → minhash signature → band → bucket-join → verify.
  *
  * Scale design (the whole point of MinHash at 100 TB):
  *  - signatures are computed per-document with array expressions — narrow,
  *    no shuffle, codegen'd;
  *  - candidate generation shuffles only (band_idx, band_key, id) triples —
  *    bytes per doc ≈ B·(8+16+8), independent of document length;
  *  - the quadratic step (pairing) happens only inside a MinHash bucket,
  *    whose expected size is corpus_dups, not corpus_size; `bucketCap`
  *    guards the adversarial giant-bucket case (drop or sample buckets
  *    larger than the cap — at 100 TB a 10k-doc bucket is a degenerate
  *    near-constant document cluster, not useful signal);
  *  - verification re-joins the two shingle sets only for surviving
  *    candidate pairs (a tiny fraction of the corpus).
  *
  * Two hash families: `xxhash64(seed, shingle)` (native, fast — production
  * path) and `md5(seed || ':' || shingle)` with lexicographic min (the
  * DuckDB-parity path used by the oracle queries; same algebra).
  */
object MinHashDedup {

  /** Word k-shingles as an array column (empty array when doc shorter than k). */
  def shingles(text: Column, k: Int): Column = {
    val ws = split(text, " ")
    when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => array_join(slice(ws, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** H-element MinHash signature over xxhash64 (production path). */
  def signatureXx(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingleArr, s => xxhash64(h, s))))

  /** Mersenne-prime modulus for the affine hash family. */
  val Mod: Long = 2147483647L

  /** Deterministic affine coefficients (aᵢ, bᵢ) for hash i — plain LCG
    * constants, reproducible in any engine.
    */
  def affineCoeffs(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      val a = (1664525L * (i + 1) + 1013904223L) % Mod
      val b = (22695477L * (i + 1) + 1L) % Mod
      (if (a == 0) 1L else a, b)
    }

  /** One base hash per shingle: first 15 hex digits of md5 as an integer,
    * reduced mod [[Mod]] — computable identically in DuckDB
    * (`('0x' || substr(md5(s),1,15))::BIGINT % Mod`).
    */
  def baseHashes(shingleArr: Column): Column =
    transform(shingleArr, s => conv(substring(md5(s), 1, 15), 16, 10).cast("long") % Mod)

  /** H-element MinHash signature via the affine family over ONE md5 base
    * hash per shingle (oracle-parity path): hᵢ(x) = (aᵢ·base(x) + bᵢ) mod M.
    * H× cheaper than hashing every shingle H times — the md5 is paid once,
    * the re-hashes are two integer ops (products stay < 2⁶² — no overflow,
    * so Java wraparound vs SQL overflow semantics never diverge).
    */
  def signatureAffine(shingleArr: Column, numHashes: Int): Column = {
    val bases = baseHashes(shingleArr)
    array(affineCoeffs(numHashes).map { case (a, b) =>
      array_min(transform(bases, x => (x * a + b) % Mod))
    }: _*)
  }

  /** Explode a signature into (band_idx, band_key) rows: B bands of R rows
    * each; band_key hashes the band's slice of the signature.
    */
  def bands(df: DataFrame, idCol: String, sigCol: String, b: Int, r: Int): DataFrame =
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(b - 1)),
          i => md5(concat_ws(",", slice(col(sigCol), i * r + lit(1), lit(r)))))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")

  /** Candidate pairs: ids sharing any (band_idx, band_key) bucket, id_a <
    * id_b, de-duplicated across bands. `bucketCap` drops degenerate giant
    * buckets (skew guard).
    *
    * Implemented as groupBy + in-array pair expansion rather than a
    * self-join: a self-join evaluates the (expensive) signature lineage
    * once per side, while one aggregation evaluates it once total, and the
    * bucket-size guard becomes a plain filter on the collected array
    * instead of an extra window pass. Collecting a bucket into an array is
    * safe exactly because of the cap.
    */
  def candidatePairs(bandRows: DataFrame, idCol: String, bucketCap: Int = 1000): DataFrame =
    bandRows.groupBy("band_idx", "band_key")
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= bucketCap)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
          struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()

  /** Exact Jaccard over distinct shingle sets for given pairs. */
  def verifyJaccard(pairs: DataFrame, docsWithShingles: DataFrame, idCol: String,
      shingleCol: String): DataFrame = {
    val setsA = docsWithShingles.select(col(idCol).as("id_a"),
      array_distinct(col(shingleCol)).as("sh_a"))
    val setsB = docsWithShingles.select(col(idCol).as("id_b"),
      array_distinct(col(shingleCol)).as("sh_b"))
    pairs.join(setsA, "id_a").join(setsB, "id_b")
      .withColumn("jaccard",
        when(size(array_union(col("sh_a"), col("sh_b"))) > 0,
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
          .otherwise(0.0))
      .select("id_a", "id_b", "jaccard")
  }

  /** Full pipeline: near-duplicate pairs with verified Jaccard ≥ threshold.
    *
    * The signed shingle table is consumed three times (band generation and
    * both sides of the verification join), and Catalyst's project
    * collapsing would otherwise inline the signature computation into each
    * consumer (evaluating it once per band). `materialize = true` (default)
    * cuts the lineage with a local checkpoint so shingling + hashing runs
    * exactly once; pass `false` to keep the plan fully lazy (recompute over
    * re-store — the right call when the shingle table is larger than the
    * cluster's scratch space).
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 12, numBands: Int = 4,
      threshold: Double = 0.5, oracleParity: Boolean = false,
      materialize: Boolean = true): DataFrame = {
    val r = numHashes / numBands
    // verification runs on the distinct hashed shingle set (longs), not the
    // string shingles: ~10× smaller shuffle rows and integer set intersects.
    // Hash collisions could in principle perturb a Jaccard, but they are
    // deterministic — the oracle computes the identical hashed-set Jaccard.
    val sigOf = if (oracleParity) signatureAffine(col("sh"), numHashes)
                else signatureXx(col("sh"), numHashes)
    val baseOf = if (oracleParity) baseHashes(col("sh"))
                 else transform(col("sh"), s => xxhash64(s))
    val signedLazy = docs.select(col(idCol), shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", sigOf)
      .withColumn("hs", array_distinct(baseOf))
      .drop("sh")
    val signed = if (materialize) signedLazy.localCheckpoint(false) else signedLazy
    val pairs = candidatePairs(bands(signed, idCol, "sig", numBands, r), idCol)
    verifyJaccard(pairs, signed, idCol, "hs").filter(col("jaccard") >= threshold)
  }
}
