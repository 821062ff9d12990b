package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities for multi-dimensional data layout —
  * the 100 TB data-SKIPPING primitive (Morton 1966; the technique behind
  * Delta Lake's `OPTIMIZE ZORDER BY` and Databricks' liquid clustering).
  *
  * Sorting a table by ONE column gives parquet row-group min/max stats
  * that prune scans on that column only; predicates on a second column
  * still read everything. Interleaving the bits of two (bucketized)
  * columns into one sort key makes every contiguous key range cover a
  * bounded rectangle in BOTH dimensions — a z-range of length L spans
  * only O(√L) distinct values per dimension — so row-group stats stay
  * tight on both columns at once and either predicate prunes.
  *
  * Everything here is closed-form integer bit math (`&`, `|`, `<<` on
  * longs) inside whole-stage codegen — no UDF — and replays verbatim in
  * DuckDB, so the bucket-statistics query (p41) is hash-gateable.
  */
object ZOrder {

  /** Bits kept per dimension; the z-value uses 2×[[DimBits]] bits. */
  val DimBits = 16

  /** Spread the low 16 bits of `c` so bit i lands at position 2i —
    * the classic mask-shift "bit interleave" ladder (public-domain
    * bit-twiddling; same constants in Delta's ZOrder implementation
    * lineage). Pure long arithmetic, codegen-friendly.
    */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value interleaving the low 16 bits of `a` (even bit
    * positions) and `b` (odd positions). Monotone in the Morton order.
    */
  def zValue16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The DuckDB replay of [[spread16]] (same mask-shift ladder). */
  def sqlSpread16(e: String): String = {
    val x0 = s"(($e) & 65535)"
    val x1 = s"(($x0 | ($x0 << 8)) & 16711935)"
    val x2 = s"(($x1 | ($x1 << 4)) & 252645135)"
    val x3 = s"(($x2 | ($x2 << 2)) & 858993459)"
    s"(($x3 | ($x3 << 1)) & 1431655765)"
  }

  /** The DuckDB replay of [[zValue16]]. */
  def sqlZValue16(a: String, b: String): String =
    s"(${sqlSpread16(a)} | (${sqlSpread16(b)} << 1))"

  /** Write `df` parquet z-ordered on two long-able columns: range-sorted
    * by the interleaved key so each output file's row groups cover a
    * bounded rectangle in (`colA`, `colB`) — min/max footer stats then
    * prune scans filtering on EITHER column (vs a single-column sort,
    * which prunes only its own). `numFiles` controls output granularity
    * (on a cluster: target file size instead). The helper column is
    * dropped before writing; the layout, not the schema, carries the
    * structure.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zValue16(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }
}
