package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Parquet table loading for the driver-generated TPC-H-ish test data
  * (see TESTDATA.md). Tables: region nation customer supplier part
  * orders lineitem events documents embeddings.
  *
  * Every load is CONTRACT-CHECKED (VERDICT round 9 #3): round 8 lost
  * four queries for a full round because one generator drift
  * (`events.ts` TIMESTAMP(NANOS) → timestamp[us]/NTZ) surfaced as a
  * downstream `DATATYPE_MISMATCH` in the bench instead of a named
  * loader error. [[contracts]] pins the NORMALIZED logical schema of
  * all ten tables; [[load]] normalizes the physical shape (see
  * [[normalizeTs]]) and then fails fast with a per-column diff if the
  * result still deviates — so the NEXT generator drift names the table
  * and column in the first job of the round, not the fourth query of
  * the bench.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The normalized logical schema every consumer of [[load]] may rely
    * on — column names, order, and types AFTER [[normalizeTs]]. Types
    * compare with `DataType.sameType` (nullability-insensitive: parquet
    * always marks columns optional).
    */
  val contracts: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  /** Earliest plausible epoch-NANOS value for driver data (= 1973-03 in
    * nanos, 17× below the ~1.7e18 the post-2024 tables actually carry
    * and 17× ABOVE the same instants in micros): a BIGINT ts below this
    * is epoch MICROS that would silently normalize to ~1970 stamps
    * (ADVICE round 9), so the nanos branch raises per-value instead of
    * guessing. Also excludes negative (pre-1970) nanos, whose `div`
    * truncation-vs-floor µs rounding would diverge from DuckDB.
    */
  val MinPlausibleNanos: Long = 100000000000000000L

  /** Normalize a timestamp-contract column to session-timezone
    * TIMESTAMP, whatever physical shape the generator emitted:
    *
    *  - parquet TIMESTAMP(NANOS) read with `nanosAsLong` → epoch-nano
    *    BIGINT: integer-divide to micros (double division of ~1.7e18
    *    nanos loses sub-µs exactness past 2^53, ADVICE round 1), with a
    *    per-value [[MinPlausibleNanos]] magnitude guard so a plain
    *    INT64-micros column fails loudly instead of landing in 1970;
    *  - parquet timestamp[us] without UTC adjustment → TIMESTAMP_NTZ:
    *    cast to TIMESTAMP (every entrypoint pins
    *    spark.sql.session.timeZone=UTC, so the cast is value-preserving
    *    and matches DuckDB's naive read of the same file);
    *  - already TIMESTAMP: pass through.
    *
    * Works on batch and streaming frames alike (schema-only dispatch).
    */
  def normalizeTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType => df.withColumn(tsCol, timestamp_micros(expr(
        s"""if($tsCol < ${MinPlausibleNanos}L, raise_error(concat(
           |'$tsCol BIGINT contract violated: expected epoch NANOS >= ',
           |'$MinPlausibleNanos, got ', cast($tsCol as string),
           |' (plain INT64 epoch-micros generator drift?)')),
           |$tsCol div 1000)""".stripMargin.replaceAll("\n", " "))))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }

  /** The events-stream specialization of [[normalizeTs]] (kept for the
    * streaming consumers that assemble their own readStream).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = normalizeTs(df, "ts")

  /** Nullability-insensitive type equality (parquet marks everything
    * optional; the contract cares about the logical type only).
    */
  private def typesMatch(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ea, _), ArrayType(eb, _)) => typesMatch(ea, eb)
    case (MapType(ka, va, _), MapType(kb, vb, _)) =>
      typesMatch(ka, kb) && typesMatch(va, vb)
    case (StructType(fa), StructType(fb)) =>
      fa.length == fb.length && fa.zip(fb).forall { case (x, y) =>
        x.name == y.name && typesMatch(x.dataType, y.dataType)
      }
    case _ => a == b
  }

  /** Throw with a NAMED-COLUMN diff when a normalized frame deviates
    * from [[contracts]] — missing / unexpected / re-typed columns each
    * listed, so generator drift is diagnosable from the message alone.
    */
  def assertContract(name: String, schema: StructType): Unit =
    contracts.get(name).foreach { want =>
      val got = schema.fields.map(f => f.name -> f.dataType).toSeq
      val gotM = got.toMap
      val wantM = want.toMap
      val missing = want.collect { case (c, _) if !gotM.contains(c) => c }
      val extra = got.collect { case (c, _) if !wantM.contains(c) => c }
      val retyped = want.collect {
        case (c, t) if gotM.get(c).exists(g => !typesMatch(g, t)) =>
          s"$c: expected ${t.simpleString}, got ${gotM(c).simpleString}"
      }
      if (missing.nonEmpty || extra.nonEmpty || retyped.nonEmpty) {
        val diff = Seq(
          if (missing.nonEmpty) Some(s"missing ${missing.mkString(", ")}")
          else None,
          if (extra.nonEmpty) Some(s"unexpected ${extra.mkString(", ")}")
          else None,
          if (retyped.nonEmpty) Some(retyped.mkString("; ")) else None
        ).flatten.mkString(" | ")
        throw new IllegalStateException(
          s"table '$name' violates its schema contract after " +
            s"normalization (generator drift? see Tables.contracts): $diff")
      }
    }

  /** Load one table from an sf directory: read, normalize every
    * timestamp-contract column, then contract-check (schema-only — no
    * job is triggered).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    // Tolerate a nanos-generation of any ts column; harmless for micros
    // data. Set once per session in practice; idempotent so ad-hoc
    // loads still work.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    val tsCols = contracts.getOrElse(name, Seq.empty)
      .collect { case (c, TimestampType) => c }
    val df = tsCols.foldLeft(raw)(normalizeTs)
    assertContract(name, df.schema)
    df
  }

  /** Register every table as a temp view so `spark.sql` queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
