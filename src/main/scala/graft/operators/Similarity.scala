package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  * (Distributed top-k similarity literature: PAPERS.md — e.g.
  * "Incremental … Top-K Similarity Search", EDBT 2020; REPOSE,
  * ICDE 2021 — the IVF cell/probe trade below is the standard
  * partition-then-prune shape those systems build on.)
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact top-k cosine — broadcast the (small)
  *     query set against the full corpus; per-partition scoring, then
  *     a per-query top-k window. The corpus is never shuffled; work
  *     is |queries| × |corpus| dots, embarrassingly parallel. This is
  *     the correctness baseline and the right choice whenever the
  *     query set fits in a broadcast (≲ tens of MB).
  *   - [[ivfTopK]]: IVF-style ANN — partition the corpus into
  *     Voronoi cells around deterministic centroids, search only the
  *     `nProbe` nearest cells per query. At 100 TB the cell
  *     assignment is a one-off map stage (re-usable, writable as a
  *     bucketed table) and each query touches nProbe/nCells of the
  *     data — the standard recall/throughput trade.
  *
  * Scoring uses double precision throughout (cast from float) and
  * results are ranked on `round(cos, 6)` with vec_id tiebreaks so
  * output is deterministic and engine-independent.
  */
object Similarity {

  /** Cosine similarity of two already-materialized double-array
    * columns. Higher-order built-ins (codegen-adjacent, no UDF); for
    * the absolute hot path a custom codegen Expression is the
    * documented promotion (SURVEY §7.2) — measure first.
    */
  private[graft] def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(a, lit(0.0), (acc, x) => acc + x * x)
    val nb = aggregate(b, lit(0.0), (acc, x) => acc + x * x)
    dot / (sqrt(na) * sqrt(nb))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k cosine neighbors for every query vector (default:
    * vec_id < nQueries), excluding self. Queries are broadcast; the
    * corpus side streams. Ranking on rounded cosine + vec_id for
    * determinism.
    */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 5, nQueries: Int = 10): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val corpus = embeddings.select(col("vec_id").as("cid"), asDouble(col("embedding")).as("cv"))
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(VectorFunctions.cosineSim(col("qv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos_sim")
      .orderBy("qid", "rnk")
  }

  /** Deterministic IVF centroids: the embeddings of the `nCells`
    * lowest vec_ids (a fixed, reproducible "training sample" — at
    * scale you'd k-means these; centroid choice only affects recall,
    * not the operator shape).
    */
  private def centroids(embeddings: DataFrame, nCells: Int): DataFrame =
    embeddings.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), asDouble(col("embedding")).as("centroid"))

  /** Cell assignment: nearest centroid per vector (broadcast
    * centroids, map-only). Persist/bucket this at scale — it is the
    * "index build".
    */
  def ivfAssign(embeddings: DataFrame, nCells: Int = 16): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val cents = centroids(embeddings, nCells)
    val scored = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cell_id"), VectorFunctions.cosineSim(col("v"), col("centroid")).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cell_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cell_id"), col("v"))
  }

  /** ANN top-k: per query, search only the nProbe cells whose
    * centroids are most similar to the query. Join on cell_id bounds
    * the candidate set; everything else mirrors the brute-force path.
    */
  def ivfTopK(embeddings: DataFrame, k: Int = 5, nQueries: Int = 10,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val assigned = ivfAssign(embeddings, nCells)
    val cents = centroids(embeddings, nCells)
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val wProbe = Window.partitionBy("qid").orderBy(col("csim").desc, col("cell_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("cell_id"), VectorFunctions.cosineSim(col("qv"), col("centroid")).as("csim"))
      .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nProbe)
      .select("qid", "qv", "cell_id")
    val scored = probes.join(assigned, "cell_id")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(VectorFunctions.cosineSim(col("qv"), col("v")), 6).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "cid", "cos_sim")
      .orderBy("qid", "rnk")
  }

  /** Per-label centroids in long form (label, dimension, mean):
    * posexplode + groupBy — the elementwise-mean aggregate Spark
    * lacks natively, in partial-agg shape (shuffle = labels × dims
    * doubles). Long form keeps the oracle trivial and feeds straight
    * back into IVF as trained centroids.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(asDouble(col("embedding"))).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg("v"), 6).as("mean_v"), count(lit(1)).as("n"))
      .orderBy("label", "pos")

  /** Embedding-cosine near-duplicate pairs above a similarity
    * threshold, bucketed by random-hyperplane LSH (SimHash for
    * vectors): vectors agreeing on all `nBits` hyperplane signs land
    * in one bucket; pairs are scored only within buckets. Recall
    * grows with fewer bits / multiple tables; this single-table
    * variant is the scale skeleton.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
                         nBits: Int = 8): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val dim = 64
    // Deterministic pseudo-random hyperplanes: component j of plane b
    // = splitmix-ish hash mapped to [-1, 1).
    def comp(b: Int, j: Int): Double = {
      var z = (b.toLong << 32 | j.toLong) + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val v = asDouble(col("embedding"))
    val sig = (0 until nBits).map { b =>
      val dot = (0 until dim).map(j => element_at(v, j + 1) * comp(b, j)).reduce(_ + _)
      when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bucketed = embeddings.select(col("vec_id"), v.as("v"), sig.as("bucket"))
    val a = bucketed.select(col("bucket"), col("vec_id").as("vec_a"), col("v").as("va"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, "bucket")
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VectorFunctions.cosineSim(col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
