package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, and run decode/feature-extract as
  * a batched per-partition pass.
  *
  * This is the Scala analog of the Python-side `mapInPandas` pattern: a
  * `Dataset.mapPartitions` over a case-class row, so the expensive decoder
  * is invoked once per JVM partition with an iterator of rows (amortizing
  * model/codec setup), the output schema is fixed by an `Encoder`, and the
  * partitioning of the input carries through untouched — no shuffle is
  * introduced by decode.
  *
  * ENVIRONMENT STUB: this container has no image/audio codecs, so
  * [[FakeDecoder.decode]] derives deterministic pseudo-metadata from the
  * payload hash. The Spark-side plumbing — binary column, schema, batch
  * iteration, partition preservation — is real and oracle-tested (the
  * fake is reproducible in DuckDB SQL precisely so the plumbing can be
  * hash-verified end to end). Swapping in a real codec changes only the
  * body of `decode`.
  */
object Multimodal {

  /** A multimodal asset row: opaque payload + source metadata. */
  final case class Asset(asset_id: Long, payload: Array[Byte], media_type: String)

  /** Decoded feature row (what a real image decode would yield: geometry +
    * a compact feature value).
    */
  final case class DecodedAsset(
      asset_id: Long, n_bytes: Long, width: Long, height: Long, feature: Long)

  /** Deterministic stand-in for the codec. Must agree with
    * [[sqlDecodeFragment]] so the oracle can verify the pipeline.
    */
  object FakeDecoder {
    def decode(a: Asset): DecodedAsset = {
      val h = Hashing.h60(a.asset_id.toString)
      DecodedAsset(
        asset_id = a.asset_id,
        n_bytes = a.payload.length.toLong,
        width = 32L + h % 224L,
        height = 32L + (h / 224L) % 224L,
        feature = h % 1000003L)
    }
  }

  /** Build an asset table from a documents-like table: the text payload
    * re-encoded as binary stands in for the media payload.
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("media_type"))
      .as[Asset]
  }

  /** The decode pass: one decoder instantiation per partition, streaming
    * batches through it (mapInPandas batch shape; here the "batch" is the
    * partition iterator, which Spark feeds incrementally — constant
    * memory).
    */
  def decodeAssets(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { rows =>
      // Per-partition setup would construct the real codec here, once.
      rows.map(FakeDecoder.decode)
    }
  }

  /** Resized geometry: source dims preserved, output dims fit `maxDim`
    * with aspect ratio kept (floor integer scaling — deterministic).
    */
  final case class ResizedAsset(
      asset_id: Long, src_w: Long, src_h: Long, out_w: Long, out_h: Long)

  /** The resize pass — same per-partition shape as [[decodeAssets]] (a
    * real implementation transforms the pixel buffer here; the geometry
    * arithmetic below is the part both real and fake versions share, and
    * what the oracle verifies).
    */
  def resizeAssets(decoded: Dataset[DecodedAsset], maxDim: Long): Dataset[ResizedAsset] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.mapPartitions { rows =>
      rows.map { d =>
        val m = math.max(d.width, d.height)
        if (m <= maxDim) ResizedAsset(d.asset_id, d.width, d.height, d.width, d.height)
        else ResizedAsset(d.asset_id, d.width, d.height,
          d.width * maxDim / m, d.height * maxDim / m)
      }
    }
  }

  /** One sampled frame of a (fake-)video asset. */
  final case class SampledFrame(asset_id: Long, frame_idx: Long)

  /** Frame sampling: every `stride`-th frame of each asset. The fake
    * frame count is `n_bytes / 100 + 1` (a real container demuxer opens
    * once per partition and seeks — the flatMap-over-partition-iterator
    * shape is exactly what that needs; output fan-out is frames, not a
    * shuffle).
    */
  def sampleFrames(assets: Dataset[Asset], stride: Int): Dataset[SampledFrame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { rows =>
      rows.flatMap { a =>
        val nFrames = a.payload.length / 100 + 1
        (0 until nFrames by stride).iterator
          .map(i => SampledFrame(a.asset_id, i.toLong))
      }
    }
  }

  /** A feature-extracted (embedded) asset: the `array<float>` column the
    * ANN/near-dup family consumes downstream.
    */
  final case class EmbeddedAsset(asset_id: Long, embedding: Array[Float])

  /** Feature extraction: asset → `dim`-component embedding, the fourth
    * multimodal pass (decode / feature-extract / resize / frame-sample).
    * Same batched per-partition shape as [[decodeAssets]] — a real
    * vision/audio encoder loads once per partition and consumes the row
    * iterator in batches; no shuffle is introduced, and the output
    * column type (`array<float>`) plugs straight into
    * [[graft.pipeline.Ann]] (composition is tested in PipelineSpec).
    *
    * The ENVIRONMENT-STUB encoder emits deterministic components in
    * [-1, 1]: `(h60(id:i) % 2001 - 1000) / 1000` — integer-exact under
    * a ×1000 round-trip, which is how the oracle hash-verifies the
    * plumbing without cross-engine float formatting.
    */
  def embedAssets(assets: Dataset[Asset], dim: Int): Dataset[EmbeddedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { rows =>
      // Per-partition setup would load the real encoder here, once.
      rows.map { a =>
        EmbeddedAsset(a.asset_id,
          Array.tabulate(dim) { i =>
            ((Hashing.h60(s"${a.asset_id}:$i") % 2001L) - 1000L) / 1000.0f
          })
      }
    }
  }

  // ----------------------------------------------------- real BMP decode

  /** A generated BMP asset: id + the actual encoded BMP byte payload. */
  final case class BmpAsset(asset_id: Long, payload: Array[Byte])

  /** Stats decoded from a real BMP payload (see [[Bmp.Stats]]). */
  final case class DecodedBmp(asset_id: Long, width: Long, height: Long,
      n_bytes: Long, px_sum: Long, px_wsum: Long)

  /** Deterministic per-asset geometry for the planted BMP corpus:
    * `(2 + h mod 8, 2 + (h div 8) mod 8)` — 2..9 pixels a side, so the
    * oracle's unnest stays tiny while padding widths (w mod 4) all occur.
    */
  def bmpDims(h: Long): (Int, Int) =
    ((2 + h % 8).toInt, (2 + (h / 8) % 8).toInt)

  /** Deterministic pixel formula in IMAGE coordinates; the formula is
    * what the ORACLE recomputes in SQL, while the Spark side must
    * round-trip it through genuine BMP bytes ([[Bmp.encode]] →
    * [[Bmp.decode]]) — so a hash match proves the codec handles
    * little-endian headers, bottom-up rows, BGR order, and row padding
    * bit-exactly, not merely that both sides share a formula.
    */
  def bmpPixel(h: Long)(x: Int, y: Int, c: Int): Int =
    ((h + 7L * x + 13L * y + 31L * c) % 256L).toInt

  /** Build a REAL BMP corpus from a documents-like table: one 24-bit
    * BI_RGB image per doc, dims and pixels derived from the doc id.
    * Same batched mapPartitions shape as [[decodeAssets]]; encoding is
    * a narrow map (no shuffle).
    */
  def bmpAssetsFromDocuments(docs: DataFrame, idCol: String = "doc_id")
      : Dataset[BmpAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val h = Hashing.h60(id.toString)
        val (w, hgt) = bmpDims(h)
        BmpAsset(id, Bmp.encode(w, hgt, bmpPixel(h)))
      }
    }
  }

  /** The real decode pass: parse each BMP payload ([[Bmp.decode]] —
    * loud on malformed bytes) into geometry + pixel checksums. One
    * decoder pass per partition iterator, no shuffle, constant memory.
    */
  def decodeBmpAssets(assets: Dataset[BmpAsset]): Dataset[DecodedBmp] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { rows =>
      rows.map { a =>
        val s = Bmp.decode(a.payload)
        DecodedBmp(a.asset_id, s.width, s.height, s.n_bytes,
          s.px_sum, s.px_wsum)
      }
    }
  }

  /** DuckDB SQL computing [[FakeDecoder.decode]]'s output from the same
    * source table (for the oracle): `idExpr`/`textExpr` are column exprs.
    */
  def sqlDecodeFragment(idExpr: String, textExpr: String): String = {
    val h = Hashing.sqlH60(s"CAST($idExpr AS VARCHAR)")
    s"""SELECT $idExpr AS asset_id,
       |  CAST(octet_length(encode($textExpr)) AS BIGINT) AS n_bytes,
       |  32 + $h % 224 AS width,
       |  32 + ($h // 224) % 224 AS height,
       |  $h % 1000003 AS feature""".stripMargin
  }
}
