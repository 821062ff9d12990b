package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the character `n`-grams of a
  * text column in one linear pass — the corpus-sized kernel of
  * [[graft.pipeline.LangNb]] classification and training
  * (`lowered = true`, the default) and of
  * [[graft.pipeline.Dedup.editDistanceJoin]]'s positional q-gram
  * postings (`lowered = false`, paired with `posexplode` for 1-based
  * gram positions).
  *
  * Value-identical on non-null input (differential-tested in
  * CharGramsSpec) to the composite it replaces —
  * `transform(sequence(1, length(tx) - (n-1)), i ⇒ substr(tx, i, n))`
  * over `tx = lower(text)` (or `tx = text` when `lowered = false`).
  * ONE intentional delta: NULL input. The composite's when/otherwise
  * guard returned an empty array for NULL text; this expression uses
  * standard `UnaryExpression` null propagation and returns NULL. Both
  * yield zero rows under the `explode`/`posexplode` call sites this
  * kernel exists for (explode drops null arrays), and the divergence
  * is pinned by a spec row. Otherwise strictly better on both axes
  * that made the composite the measured dominator of the 30x data
  * card's lang_mix stage:
  *
  *   - `substr(tx, i, n)` re-seeks the UTF8 char boundary from byte 0
  *     every call — O(i) per gram, O(len²) per document. This kernel
  *     walks the byte array ONCE, records every char boundary, and
  *     emits each gram as a direct byte-range slice — O(len) per doc.
  *   - higher-order-function lambdas are evaluated INTERPRETED
  *     (they never enter whole-stage codegen); this expression
  *     participates via a single static call
  *     ([[CharGrams.compute]]), the [[HashedShingles]] pattern.
  *
  * Lowering happens INSIDE the kernel, so char positions are positions
  * of the lowered string — exact parity with the DuckDB oracle's
  * `substr(lower(text), i, n)` replay even for texts whose char count
  * changes under lowercasing. Non-null documents shorter than `n`
  * chars yield an empty array (never null) — the `sequence`
  * descending-range guard of the composite form, preserved.
  */
case class CharGrams(child: Expression, n: Int, lowered: Boolean = true)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"n must be >= 1, got $n")

  override def inputTypes: Seq[Shim.AbstractType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override protected def nullSafeEval(input: Any): Any =
    CharGrams.compute(input.asInstanceOf[UTF8String], n, lowered)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharGrams.compute($c, $n, $lowered)")

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Runtime kernel — static so generated code can call it directly.
    * One pass to find char boundaries, one byte-range slice per gram.
    */
  def compute(text: UTF8String, n: Int, lowered: Boolean): ArrayData = {
    val prepared = if (lowered) text.toLowerCase else text
    val numChars = prepared.numChars()
    if (numChars < n) return Empty
    val bytes = prepared.getBytes
    val offsets = new Array[Int](numChars + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      offsets(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offsets(numChars) = bytes.length
    val out = new Array[Any](numChars - n + 1)
    var k = 0
    while (k <= numChars - n) {
      out(k) = UTF8String.fromBytes(bytes, offsets(k),
        offsets(k + n) - offsets(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: character `n`-grams of `lower(text)`. */
  def apply(text: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column =
    Shim.column(CharGrams(Shim.expression(text), n))

  /** Column API, case-preserving: character `n`-grams of `text` as-is
    * — `posexplode(raw(str, q))` is the positional q-gram postings
    * path of [[graft.pipeline.Dedup.editDistanceJoin]] (gram = the
    * struct's value, 1-based position = posexplode's index + 1).
    */
  def raw(text: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column =
    Shim.column(CharGrams(Shim.expression(text), n, lowered = false))
}
