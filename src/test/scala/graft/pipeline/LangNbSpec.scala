package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangNbSpec extends SparkSpec {

  // Two synthetic "languages" with disjoint character distributions:
  // lang A words draw from a..g, lang B words from p..z — what a real
  // char-n-gram model keys on. Deterministic word generators.
  private def wordA(i: Int) = "abcdefg".map(c => c).grouped(1)
    .toSeq.map(_.head).slice(i % 5, i % 5 + 3).mkString
  private def docA(i: Int) = (0 until 12).map(w => wordA(i + w)).mkString(" ")
  private def wordB(i: Int) = "pqrstuvwxyz".slice(i % 8, i % 8 + 3)
  private def docB(i: Int) = (0 until 12).map(w => wordB(i + w)).mkString(" ")

  test("NB recovers planted languages on held-out docs") {
    import spark.implicits._
    val trainDocs = ((0 until 20).map(i => (i.toLong, docA(i), "A")) ++
      (0 until 20).map(i => (100L + i, docB(i), "B")))
      .toDF("doc_id", "text", "label")
    val model = LangNb.train(trainDocs, trainDocs.select("doc_id", "label"))
    // Held-out docs shifted to unseen offsets; every one must classify
    // to its plant (full separation between the char sets).
    val heldOut = ((0 until 10).map(i => (200L + i, docA(i + 50))) ++
      (0 until 10).map(i => (300L + i, docB(i + 50))))
      .toDF("doc_id", "text")
    val got = LangNb.classify(heldOut, model).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 20)
    (0 until 10).foreach { i =>
      assert(got(200L + i) == "A", s"doc ${200 + i}: ${got(200L + i)}")
      assert(got(300L + i) == "B", s"doc ${300 + i}: ${got(300L + i)}")
    }
  }

  test("classifier handles short and out-of-vocabulary docs via priors") {
    import spark.implicits._
    // Imbalanced priors: 3 A-docs, 1 B-doc => prior argmax is A.
    val trainDocs = ((0 until 3).map(i => (i.toLong, docA(i), "A")) :+
      ((10L, docB(0), "B"))).toDF("doc_id", "text", "label")
    val model = LangNb.train(trainDocs, trainDocs.select("doc_id", "label"))
    // "hm": shorter than the gram width (no grams at all) and "00000"
    // entirely outside the training vocabulary — both must fall back to
    // the prior argmax instead of erroring or dropping out.
    val odd = Seq((500L, "hm"), (501L, "00000")).toDF("doc_id", "text")
    val got = LangNb.classify(odd, model).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(500L -> "A", 501L -> "A"))
  }

  test("self-trained run is deterministic and one-row-per-doc") {
    import spark.implicits._
    val docs = ((0 until 15).map(i => (i.toLong,
      s"the data of the run $i is in the table and it has the rows")) ++
      (100 until 110).map(i => (i.toLong, s"zzz qqq xxx vvv kkk $i")))
      .toDF("doc_id", "text")
    val a = LangNb.classifySelfTrained(docs).collect().map(_.toSeq).toSet
    val b = LangNb.classifySelfTrained(docs).collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 25)
    // the stopword-heavy docs classify en, the consonant soup und
    val byId = a.map(s => s.head.asInstanceOf[Long] ->
      s(1).asInstanceOf[String]).toMap
    assert(byId(0L) == "en" && byId(100L) == "und")
  }

  test("vocabulary drift: an OOV-heavy corpus still classifies by its " +
      "surviving in-vocabulary grams") {
    // The scenario that motivated the round-17 classify rewrite (OOV
    // broadcast semi-join before the (doc, gram) shuffle): a corpus
    // whose text is MOSTLY outside the training vocabulary — e.g. a
    // word-bijected scale-up copy scored by a base-trained model. The
    // drifted docs here are ~80% digit-soup (every 3-gram touching a
    // digit is OOV for the a..g / p..z model) with a 20% tail of
    // genuine lang-A or lang-B words; classification must key on the
    // survivors, not the noise, and still emit exactly one row per doc.
    import spark.implicits._
    val trainDocs = ((0 until 20).map(i => (i.toLong, docA(i), "A")) ++
      (0 until 20).map(i => (100L + i, docB(i), "B")))
      .toDF("doc_id", "text", "label")
    val model = LangNb.train(trainDocs, trainDocs.select("doc_id", "label"))
    def noise(i: Int) = (0 until 10).map(k => s"${i}0${k}9").mkString(" ")
    val drifted = ((0 until 8).map(i =>
        (400L + i, s"${noise(i)} ${wordA(i)} ${wordA(i + 1)}")) ++
      (0 until 8).map(i =>
        (500L + i, s"${noise(i)} ${wordB(i)} ${wordB(i + 1)}")))
      .toDF("doc_id", "text")
    val rows = LangNb.classify(drifted, model).collect()
    assert(rows.length == 16, "must stay one row per doc under OOV pruning")
    val got = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until 8).foreach { i =>
      assert(got(400L + i) == "A", s"doc ${400 + i}: ${got(400L + i)}")
      assert(got(500L + i) == "B", s"doc ${500 + i}: ${got(500L + i)}")
    }
  }

  test("params charset: save refuses a round-trip-corrupting label; load " +
      "accepts a legacy out-of-charset label with a warning") {
    import spark.implicits._
    // A comma inside a label would serialize to params.json that
    // parse() silently mis-splits — the SAVE path must refuse.
    intercept[IllegalArgumentException] {
      LangNb.ModelParams(3, Seq("a,b")).json
    }
    // But a model persisted BEFORE the charset rule must still LOAD
    // (round-17 ADVICE: the require used to run at construction and
    // broke old models at load). Persist a valid model, then rewrite
    // its params.json with a pre-rule label shape.
    val docs = (0 until 10).map(i => (i.toLong, docA(i)))
      .toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"), lit("en").as("label"))
    val dir = java.nio.file.Files.createTempDirectory("graft_nblegacy").toString
    LangNb.saveModel(LangNb.train(docs, labels), 3, dir)
    // drop the ChecksumFileSystem sidecar before the raw rewrite, or
    // the stale .crc fails the read
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/.params.json.crc"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/params.json"),
      """{"n":3,"labels":["en!legacy"]}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (_, params) = LangNb.loadModel(spark, dir)
    assert(params.n == 3 && params.labels == Seq("en!legacy"))
  }

  test("persisted model: save -> load -> classify equals the in-memory model, " +
      "gram-size mismatch fails loudly") {
    import spark.implicits._
    val docs = ((0 until 15).map(i => (i.toLong,
      s"the data of the run $i is in the table and it has the rows")) ++
      (100 until 110).map(i => (i.toLong, s"zzz qqq xxx vvv kkk $i")))
      .toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"),
      TextAnalysis.languageId(col("text")).as("label"))
    val model = LangNb.train(docs, labels)
    val inMem = LangNb.classify(docs, model).collect().map(_.toSeq).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_nbmodel").toString
    LangNb.saveModel(model, 3, dir)
    val (loaded, params) = LangNb.loadModel(spark, dir)
    assert(params == LangNb.ModelParams(3, Seq("en", "und")))
    val viaDisk = LangNb.classify(docs, loaded, params.n)
      .collect().map(_.toSeq).toSet
    assert(viaDisk == inMem)
    assert(LangNb.classifyPersisted(docs, dir).collect().map(_.toSeq).toSet
      == inMem)
    // classifying a persisted n=3 grid with n=4 grams would join nothing
    // and silently prior-argmax every doc — the params must refuse
    val e = intercept[IllegalArgumentException] {
      params.requireMatches(4, "spec gate")
    }
    assert(e.getMessage.contains("n=3"))
    // a directory without params.json is not a model
    val empty = java.nio.file.Files.createTempDirectory("graft_nbnone").toString
    intercept[IllegalArgumentException] { LangNb.loadModel(spark, empty) }
  }
}
