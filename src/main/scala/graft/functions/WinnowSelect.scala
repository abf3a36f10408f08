package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** In-row winnowing window selection (Schleimer/Wilkerson/Aiken) over a
  * NORMALIZED text column — bit-identical to the former Column-algebra
  * chain in [[graft.ops.Dedup.winnowFingerprints]] (codepoint transform →
  * k−1 chained `zip_with` rolling hashes → w−1 chained `zip_with`
  * rightmost-min folds → `array_distinct`), which paid interpreted
  * higher-order-function lambda calls per character per chain step —
  * measured as most of the winnow gate. One compiled pass per row:
  *
  *  - gram hash i = fold over codepoints i..i+k−1 of
  *    `acc = (acc·131 + cp) mod 2³¹−1` (cp = the codepoint, exactly
  *    Spark's `ascii` of the split character);
  *  - window i (of w grams) selects its MINIMUM hash, rightmost on ties
  *    (scan ascending, `<=` updates — the winnowing tie rule);
  *  - selections dedup by position, first-occurrence order (the
  *    `array_distinct` over (fp, pos) structs: position determines the
  *    hash, so (fp, pos)-distinct ≡ pos-distinct).
  *
  * Returns `array<struct<pos:int, gram:string>>` — pos is the 1-based
  * codepoint position, gram the k-codepoint substring (the md5 identity
  * fingerprint is applied by the caller as a plain Column, unchanged).
  * Fewer grams than a window → empty array; null text → null.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("gram", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected string, got $t")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowSelectKernel.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WinnowSelectKernel.compute($c, $k, $w);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowSelect = copy(child = newChild)
}

object WinnowSelectKernel {
  private val Mod = 2147483647L // graft.ops.Dedup.KgramMod

  def compute(nm: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = nm.toString
    val cps = s.codePoints().toArray
    val nGrams = cps.length - (k - 1)
    val nWin = nGrams - (w - 1)
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    // all gram hashes: acc = (acc*131 + cp) mod 2^31-1 over k codepoints
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var acc = cps(i).toLong % Mod
      var j = 1
      while (j < k) {
        acc = (acc * 131L + cps(i + j).toLong) % Mod
        j += 1
      }
      hs(i) = acc
      i += 1
    }
    // codepoint offsets so gram extraction is O(k) per selection
    val offs = new Array[Int](cps.length + 1)
    i = 0
    while (i < cps.length) {
      offs(i + 1) = offs(i) + Character.charCount(cps(i))
      i += 1
    }
    val picked = new java.util.LinkedHashSet[Integer]()
    i = 0
    while (i < nWin) {
      var best = i
      var j = i + 1
      while (j < i + w) {
        if (hs(j) <= hs(best)) best = j // rightmost-min tie rule
        j += 1
      }
      picked.add(best)
      i += 1
    }
    val out = new Array[Any](picked.size())
    val it = picked.iterator()
    var n = 0
    while (it.hasNext) {
      val p = it.next().intValue()
      val gram = s.substring(offs(p), offs(p + k))
      out(n) = InternalRow(p + 1, UTF8String.fromString(gram))
      n += 1
    }
    new GenericArrayData(out)
  }
}
