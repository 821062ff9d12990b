package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for the vector-similarity family
  * (VERDICT round 2 plan audit: p11/p08/p09/p05 were dominated by
  * interpreted `zip_with`/`aggregate` lambda chains — higher-order
  * functions never enter codegen, and each of the k planes / hash
  * functions re-walked its array. Same cure as [[HashedShingles]]: the
  * whole loop nest as ONE codegen-participating static call, computing
  * bit-identical values to the composites they replace (differential
  * specs in VectorOpsSpec).
  *
  * All arithmetic is the catalog's deterministic fixed-point scheme:
  * components quantized `floor(x*1000)` to exact longs, integer
  * dots/norms, one final IEEE double division — reproducible in DuckDB.
  *
  * Input-type contracts (VERDICT round 4 #4): every expression declares
  * `ImplicitCastInputTypes`, so analysis inserts casts where legal and
  * errors otherwise — previously a SQL caller passing `array<double>`
  * (the default SQL literal type) had the 8-byte slots silently misread
  * as floats. The vector kernels accept float AND double element widths
  * natively (a `TypeCollection`), because under ANSI mode — the Spark 4
  * default — the double→float narrowing implicit cast is rejected, and
  * an error on the most natural SQL spelling would be hostile.
  */
object VectorOps {

  private def quantize(x: Double): Long = math.floor(x * 1000).toLong

  private def comp(a: ArrayData, i: Int, dbl: Boolean): Double =
    if (dbl) a.getDouble(i) else a.getFloat(i).toDouble

  /** Exact fixed-point micro-cosine: floor(cos(a,b) * 1e6) as long. */
  def microCosine(a: ArrayData, b: ArrayData, aDbl: Boolean, bDbl: Boolean): Long = {
    val n = a.numElements()
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = quantize(comp(a, i, aDbl))
      val y = quantize(comp(b, i, bDbl))
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val c = dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
    math.floor(c * 1000000).toLong
  }

  def microCosine(a: ArrayData, b: ArrayData): Long =
    microCosine(a, b, aDbl = false, bDbl = false)

  /** All `tables` LSH sign-buckets of a quantized vector in one pass:
    * bucket(t) = Σ_p [proj(t,p) ≥ 0] << p, with the same LCG plane
    * coefficients as the SQL oracle fragment ([[graft.pipeline.Ann]]).
    */
  def lshBuckets(v: ArrayData, dim: Int, planes: Int, tables: Int,
      dbl: Boolean): ArrayData = {
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = quantize(comp(v, i, dbl)); i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p).toLong * dim
        var proj = 0L
        var j = 0
        while (j < dim) {
          proj += q(j) * ((1103515245L * (base + j) + 12345L) % 2001L - 1000L)
          j += 1
        }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def lshBuckets(v: ArrayData, dim: Int, planes: Int, tables: Int): ArrayData =
    lshBuckets(v, dim, planes, tables, dbl = false)

  /** MinHash signature over pre-reduced (mod M) shingle hashes: k mins of
    * the universal family h_i(x) = (a_i·x + b_i) mod P
    * ([[graft.pipeline.Hashing]]'s coefficients). Mirrors the
    * `array_min(transform(...))` composite exactly, including its null
    * per empty input array.
    */
  def minHashSig(hs: ArrayData, numHashes: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) {
      return new GenericArrayData(Array.fill[Any](numHashes)(null))
    }
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      // Must mirror graft.pipeline.Hashing.hashA/hashB exactly.
      val a = (506952114L * (i + 1)) % 2147483647L
      val b = 10007L * i + 17L
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = (a * hs.getLong(j) + b) % 2147483647L
        if (h < min) min = h
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** float-or-double vector input contract shared by the expressions. */
  private[functions] val FloatVec: Shim.AbstractType =
    Shim.typeCollection(ArrayType(FloatType), ArrayType(DoubleType))

  private[functions] def isDoubleVec(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType
}

/** floor(cosine(a, b) * 1e6) over two `array<float|double>` columns. */
case class MicroCosine(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[Shim.AbstractType] =
    Seq(VectorOps.FloatVec, VectorOps.FloatVec)
  override def dataType: DataType = LongType
  override def prettyName: String = "micro_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.microCosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      VectorOps.isDoubleVec(left), VectorOps.isDoubleVec(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.microCosine($a, $b, " +
        s"${VectorOps.isDoubleVec(left)}, ${VectorOps.isDoubleVec(right)})")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MicroCosine =
    copy(left = newLeft, right = newRight)
}

object MicroCosine {
  def apply(a: Column, b: Column): Column =
    Shim.column(MicroCosine(Shim.expression(a), Shim.expression(b)))
}

/** The `tables` LSH bucket ids of an `array<float|double>` vector. */
case class LshBuckets(child: Expression, dim: Int, planes: Int, tables: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(planes <= 60)
  override def inputTypes: Seq[Shim.AbstractType] = Seq(VectorOps.FloatVec)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.lshBuckets(v.asInstanceOf[ArrayData], dim, planes, tables,
      VectorOps.isDoubleVec(child))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorOps.lshBuckets($v, $dim, $planes, $tables, " +
        s"${VectorOps.isDoubleVec(child)})")
  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  def apply(v: Column, dim: Int, planes: Int, tables: Int): Column =
    Shim.column(LshBuckets(Shim.expression(v), dim, planes, tables))
}

/** MinHash signature (`numHashes` longs) of an `array<long>` column. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[Shim.AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(hs: Any): Any =
    VectorOps.minHashSig(hs.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, hs =>
      s"graft.functions.VectorOps.minHashSig($hs, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(hs: Column, numHashes: Int): Column =
    Shim.column(MinHashSig(Shim.expression(hs), numHashes))
}
