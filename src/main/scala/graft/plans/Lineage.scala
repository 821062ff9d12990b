package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.graftshim.Shim

/** Lineage truncation for ITERATIVE pipelines.
  *
  * `Dataset.localCheckpoint()` materializes the data and cuts the logical
  * plan, but (Spark 3.4+, SPARK-41914) it copies the origin plan's
  * STATISTICS onto the new `LogicalRDD` leaf. In an iterative algorithm
  * that is a time bomb: each iteration's joins multiply the leaf
  * `sizeInBytes` estimates, the product is checkpointed into the next
  * leaf, and the estimate compounds DOUBLE-EXPONENTIALLY — by iteration
  * ~8 of the HGN loop on Hamsterster the driver spent minutes per step
  * multiplying million-digit `BigInt`s inside
  * `SizeInBytesOnlyStatsPlanVisitor` (single-core, planning-time, no
  * cluster work at all). Measured with StatsProbe: the digit count of
  * `sizeInBytes` doubles every checkpointed join iteration.
  *
  * [[cut]] therefore re-wraps the checkpointed RDD in a fresh
  * `LogicalRDD` WITHOUT origin stats: planning sees an unknown-size leaf
  * (`spark.sql.defaultSizeInBytes`), exactly like a plain RDD scan —
  * constant-cost planning at every iteration. Joins against a cut table
  * won't auto-broadcast (unknown size reads as huge), which is the safe
  * default for loop state; broadcast the other side explicitly where
  * wanted.
  */
object Lineage {

  /** Unpersist the materialized RDD behind a [[cut]] result — for LONG
    * driver loops (hundreds+ of iterations, e.g. BPE training rounds)
    * where keeping every round's checkpoint blocks alive would pin
    * rounds × state-size of storage for the whole run. Call it on
    * round r's state only AFTER round r+1's cut has materialized
    * (cut is eager, so by the time it returns the old blocks are no
    * longer an input of anything). No-op for non-cut DataFrames.
    */
  def release(df: DataFrame): Unit =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** `localCheckpoint` + drop origin statistics/constraints. */
  def cut(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint().asInstanceOf[ClassicDataset[Row]]
    val spark = ck.sparkSession
    val plan = ck.queryExecution.analyzed match {
      // The checkpoint's plan IS a LogicalRDD; rebuild it minus the
      // origin stats/constraints, reusing the same materialized RDD and
      // physical partitioning.
      case lr: LogicalRDD =>
        LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, None)(spark, None, None)
      case other => // defensive: wrap whatever the checkpoint produced
        LogicalRDD(other.output, ck.queryExecution.toRdd)(spark, None, None)
    }
    org.apache.spark.sql.graftshim.Shim.ofRows(spark, plan)
  }
}
