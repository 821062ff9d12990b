package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session; specs
  * must not stop it).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // ANSI mode is the Spark 4 default; pin it so a future conf drift
      // can't mask ANSI-only failures (round-4 regression: sum() long
      // overflow in the CC convergence signature threw only under ANSI).
      .config("spark.sql.ansi.enabled", "true")
      // Pinned session-wide (not per-spec, which leaked ordering
      // dependence — ADVICE round 9): tolerate a TIMESTAMP(NANOS)
      // generation of any driver ts column, matching every main's
      // session config; Tables.normalizeTs handles the resulting BIGINT.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-test-ckpt").toString)
    s
  }
}
