package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** One-hot "dummy vector" encoding of categorical node features (SURVEY
  * §2.8 M1-M4), matching the reference's `create_dummy_vectors`
  * (`spark_manager/spark_manager.py:151-176`):
  *
  *   StringIndexer (per feature, handleInvalid="keep")
  *     → OneHotEncoder (the Spark-2 `OneHotEncoderEstimator` was renamed
  *        OneHotEncoder in Spark 3+)
  *     → VectorAssembler into a single sparse `features` vector,
  *   then project to `(id, features)`.
  *
  * The fit stage scans the data once per StringIndexer (frequency-ordered
  * vocabularies); transform is a narrow map — no shuffles. The output
  * vectors are sparse one-hots, so downstream cosine similarity reduces to
  * set overlap of active indices ([[Cosine]]).
  */
object DummyVectors {

  /** Encode `featuresToCheck` columns of `nodes` into one `features`
    * vector per node. `nodes` must carry an `id` column.
    */
  def create(nodes: DataFrame, featuresToCheck: Seq[String]): DataFrame = {
    require(featuresToCheck.nonEmpty, "need at least one feature column")
    val indexers = featuresToCheck.map { f =>
      new StringIndexer()
        .setInputCol(f)
        .setOutputCol(s"${f}_idx")
        .setHandleInvalid("keep") // reference: spark_manager.py:164
    }
    // dropLast=false, deviating from the reference's default-dropLast
    // encoder: every category keeps an explicit bit, so each feature
    // contributes exactly one active component and cosine(u, v) equals
    // (#equal features)/F. dropLast exists to break affine redundancy for
    // linear models; for similarity it only distorts the last category.
    val encoder = new OneHotEncoder()
      .setInputCols(featuresToCheck.map(f => s"${f}_idx").toArray)
      .setOutputCols(featuresToCheck.map(f => s"${f}_vec").toArray)
      .setDropLast(false)
    val assembler = new VectorAssembler()
      .setInputCols(featuresToCheck.map(f => s"${f}_vec").toArray)
      .setOutputCol("features")
    val pipeline = new Pipeline()
      .setStages((indexers :+ encoder :+ assembler).toArray)
    pipeline.fit(nodes).transform(nodes).select("id", "features")
  }
}
