package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — every point row matched to every interval of
  * the same key that contains it (`start <= pt <= end`, inclusive): the
  * other temporal join Spark lacks a native operator for (sibling of
  * [[AsOfJoin]]). A naive `l.start <= r.pt AND r.pt <= l.end` join plans
  * as a per-key cross product filtered after the fact — O(points ×
  * intervals) pairs per key, the classic 100 TB range-join blowup.
  *
  * This is the standard BUCKETIZED formulation instead: time is split
  * into fixed `bucketLen` bins, each interval is exploded to the bins it
  * overlaps, each point lands in exactly ONE bin, and the join becomes a
  * plain equi-join on `(keys, bin)` + a residual containment filter.
  * Every true match shares the point's bin with the interval, so the
  * result is exact, and because a point has a single bin no match can be
  * emitted twice — no dedup pass needed.
  *
  * Cost: one hash-partition of points and of exploded intervals on an
  * equi key (AQE-eligible, skew-splittable), with interval fan-out
  * `(len div bucketLen) + 1`. Pick `bucketLen` near the TYPICAL interval
  * length: fan-out stays O(1) while bin selectivity does the pruning a
  * range predicate cannot get from a hash join. A loud guard rejects
  * pathological fan-out (an interval spanning > `maxFanout` bins) rather
  * than silently exploding the intermediate.
  *
  * Domain: bin math uses integer `div`, which truncates toward zero —
  * exact binning therefore assumes NON-NEGATIVE point/bound values
  * (epoch micros qualify). Non-key column names must be disjoint across
  * the two inputs (rename before joining, as with any self-join).
  */
object RangeJoin {

  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptCol: String, startCol: String, endCol: String,
      bucketLen: Long, maxFanout: Long = 1024L): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    require(bucketLen > 0, s"bucketLen must be positive, got $bucketLen")
    // Bounded scalar guard (one aggregate row): a single huge interval
    // would explode to (len div bucketLen)+1 rows — fail loudly with the
    // measured worst case instead.
    val worst = intervals
      .agg(max(expr(s"($endCol - $startCol) div $bucketLen")).as("w"))
      .collect()(0)
    if (!worst.isNullAt(0) && worst.getLong(0) + 1 > maxFanout)
      throw new IllegalArgumentException(
        s"range join fan-out ${worst.getLong(0) + 1} bins exceeds " +
          s"maxFanout=$maxFanout — raise bucketLen (or maxFanout if the " +
          "fan-out is intended)")
    val pb = points.withColumn("__bin", expr(s"$ptCol div $bucketLen"))
    val ib = intervals.withColumn("__bin",
      explode(expr(s"sequence($startCol div $bucketLen, $endCol div $bucketLen)")))
    pb.join(ib, keys :+ "__bin")
      .filter(col(startCol) <= col(ptCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
