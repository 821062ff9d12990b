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
  /** Test-session core count: the full suite's wall time is dominated
    * by task throughput of a handful of heavy differential suites, and
    * the round-19 driver VERIFY recorded a red `sbt test` whose tail is
    * a kill-mid-run signature (no ScalaTest summary) — i.e. the suite
    * outlasting its window on a contended box is a round-gating hazard.
    * Use the machine's cores (capped; `SPARK_GRAFT_TEST_CPUS`
    * overrides). `spark.sql.shuffle.partitions` stays pinned at 4 —
    * results are partition-count independent by engine policy, and
    * every partition-sensitive assertion pins its own layout.
    */
  private def testCpus: Int =
    sys.env.get("SPARK_GRAFT_TEST_CPUS").map(_.trim.toInt).getOrElse(
      math.min(Runtime.getRuntime.availableProcessors(), 16))

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-test")
      .master(s"local[$testCpus]")
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
