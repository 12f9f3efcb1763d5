package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (the UDAF surface of the engine).
  *
  * These compose with groupBy().agg() via `functions.udaf(...)` and
  * run as proper partial aggregates: `reduce` map-side, `merge`
  * across partitions — the same two-phase shape Catalyst gives
  * built-ins, so they scale like `sum` does (no collect, no
  * per-group materialization beyond the buffer).
  */
object Aggregators {

  /** Weighted mean: Σ(x·w) / Σ(w). Buffer is two doubles — constant
    * size per group regardless of input rows.
    */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k: keeps the k largest values per group in the
    * buffer (size ≤ k), so per-group shuffle volume is O(k) instead
    * of the O(group) a sort-based window top-k pays. The alternative
    * to `row_number().over(window) <= k` when k ≪ group size at
    * 100 TB.
    */
  class TopK(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(b: Seq[Double], x: Double): Seq[Double] = insert(b, x)
    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      b.foldLeft(a)(insert)
    override def finish(b: Seq[Double]): Seq[Double] = b
    // Buffer invariant: sorted descending (= ascending under the
    // reversed ordering); see Aggregators.boundedInsert.
    private def insert(b: Seq[Double], x: Double): Seq[Double] =
      Aggregators.boundedInsert(b, x, k, Ordering[Double].reverse)
    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] = bufferEncoder
  }

  /** Bounded top-k over (score, id) pairs, ordered score desc then id
    * asc — the partial-aggregate replacement for
    * `row_number().over(Window.partitionBy(q))` top-k finishers.
    *
    * Why it exists: a window top-k shuffles EVERY scored row onto the
    * partition keys — with few queries (the similarity-search shape:
    * ~10 qids vs |corpus| scored rows) parallelism collapses to
    * n_queries tasks and shuffle volume is n_queries × corpus. This
    * aggregator keeps an O(k) buffer, combines map-side, and ships
    * only n_partitions × k pairs per query through the exchange.
    * Ordering is total (ids unique within a group) so results are
    * deterministic and identical to the window form — pinned by a
    * differential spec.
    */
  class TopKPairs(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private val ord: Ordering[(Double, Long)] = Ordering.by(p => (-p._1, p._2))
    override def zero: Seq[(Double, Long)] = Vector.empty
    override def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
      insert(b, x)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.foldLeft(a)(insert)
    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    private def insert(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
      Aggregators.boundedInsert(b, x, k, ord)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  // NOTE (adjudicated round 11): a TopKStrings sibling of TopKPairs was
  // prototyped as the text_tfidf finisher and measured SLOWER than the
  // row_number window it was meant to replace (min 19 s vs 6.8 s at
  // sf10, fresh plans per rep): with ~23 scored rows per document
  // scattered across partitions, partial aggregation ships ~1 buffer
  // per input row — zero shuffle shrink — while paying the
  // ScalaAggregator object/encoder path per row. TopKPairs survives
  // because its groups (queries) are FEW and its per-group inputs are
  // the whole corpus — the shape where a bounded heap actually shrinks
  // the exchange. Per-doc top-k over wide corpora belongs on the
  // window; see TextAnalysis.tfidfTopTerms and SCALING.md.

  /** Shared bounded-buffer insert (TopKPairs and the streaming top-k
    * state op): `b` is sorted by `ord` (best first) as an invariant;
    * insert by binary-searched position — O(log k) compares + one
    * O(k) vector patch per accepted row, no re-sort.
    */
  private[graft] def boundedInsert[T](b: Seq[T], x: T, k: Int,
                                      ord: Ordering[T]): Seq[T] = {
    if (b.size >= k && ord.gteq(x, b.last)) b
    else {
      val v = b.toVector
      var lo = 0; var hi = v.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lteq(v(mid), x)) lo = mid + 1 else hi = mid
      }
      val patched = (v.take(lo) :+ x) ++ v.drop(lo)
      if (patched.length > k) patched.take(k) else patched
    }
  }

  /** Misra–Gries frequent-items summary over Long keys: a bounded
    * map of ≤ `capacity` counters that answers "which keys occur
    * more than N/capacity times" with ONE pass and O(capacity)
    * memory — the heavy-hitter primitive for corpus-scale key
    * profiling (hot users, hot domains, hot shingles) where an exact
    * groupBy would shuffle billions of distinct keys.
    *
    * Guarantees (classic MG, plus the Agarwal et al. 2012 mergeable-
    * summaries merge): every key with true count > N/capacity
    * survives, and each reported estimate undercounts the true count
    * by at most N/capacity. When capacity ≥ |distinct keys| no
    * counter is ever evicted and the estimates are EXACT — which is
    * how the oracle pins this aggregator end-to-end (the testdata
    * key space fits; a 100 TB run sets capacity ≪ distinct and takes
    * the approximation on purpose).
    *
    * Runs as a true partial aggregate: `reduce` map-side per
    * partition, `merge` combines the per-partition summaries (sum
    * counters, then subtract the (capacity+1)-th largest count and
    * drop ≤0 — the rank-based offset keeps the error bound additive
    * across merges).
    *
    * The buffer is `(offset, minRaw, rawCounters)` with effective
    * count = raw − offset: the classic decrement-all step is a
    * single `offset += 1` (O(1)) instead of rebuilding the whole
    * counter map per untracked arrival. Entries die when
    * raw ≤ offset; `minRaw` (a stale-low lower bound, refreshed at
    * each compaction) makes the "did anything die" test O(1), and
    * the O(capacity) compaction runs only when it does — so no dead
    * entry ever occupies a slot and the summary state is bit-for-bit
    * the classic MG state at every step.
    */
  class MisraGriesOf[K](capacity: Int)(implicit
      ord: Ordering[K],
      bufEnc: Encoder[(Long, Long, Map[K, Long])],
      outEnc: Encoder[Seq[(K, Long)]])
      extends Aggregator[K, (Long, Long, Map[K, Long]), Seq[(K, Long)]] {
    type Buf = (Long, Long, Map[K, Long]) // (offset, minRaw, raw counters)
    override def zero: Buf = (0L, Long.MaxValue, Map.empty)
    override def reduce(b: Buf, key: K): Buf = {
      val (off, mn, m) = b
      m.get(key) match {
        case Some(raw) => (off, mn, m.updated(key, raw + 1))
        case None if m.size < capacity =>
          (off, math.min(mn, off + 1), m.updated(key, off + 1))
        case None =>
          // decrement-all via the offset; compact only if the raised
          // offset can have killed the (lower-bounded) minimum entry.
          val off2 = off + 1
          if (mn > off2) (off2, mn, m)
          else {
            val survivors = m.filter { case (_, raw) => raw > off2 }
            val mn2 = if (survivors.isEmpty) Long.MaxValue else survivors.values.min
            (off2, mn2, survivors)
          }
      }
    }
    override def merge(a: Buf, b: Buf): Buf = {
      def effective(x: Buf): Map[K, Long] =
        x._3.map { case (k, raw) => k -> (raw - x._1) }
      val combined = effective(b).foldLeft(effective(a)) { case (acc, (k, n)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + n)
      }
      val kept =
        if (combined.size <= capacity) combined
        else {
          val cut = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
          combined.flatMap { case (k, n) =>
            if (n > cut) Some(k -> (n - cut)) else None
          }
        }
      val mn = if (kept.isEmpty) Long.MaxValue else kept.values.min
      (0L, mn, kept)
    }
    override def finish(b: Buf): Seq[(K, Long)] = {
      val (off, _, m) = b
      m.toSeq.map { case (k, raw) => (k, raw - off) }
        .sortBy { case (k, n) => (-n, k) }
    }
    override def bufferEncoder: Encoder[Buf] = bufEnc
    override def outputEncoder: Encoder[Seq[(K, Long)]] = outEnc
  }

  /** The Long-keyed instantiation every existing call site uses (hot
    * users); [[MisraGriesOf]] carries the algorithm for any key type
    * with an Encoder + Ordering — e.g. String for hot domains/sources.
    */
  class MisraGries(capacity: Int) extends MisraGriesOf[Long](capacity)(
    Ordering[Long],
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Map[Long, Long])](),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]())
}
